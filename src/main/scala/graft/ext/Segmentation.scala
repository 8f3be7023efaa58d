package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer-base segmentation over a transaction table — the marketing
  * RFM (recency / frequency / monetary) scoring that turns a fact table
  * into per-entity quintile codes.
  */
object Segmentation {

  /** RFM quintiles: per `custCol`, recency = days between the entity's
    * last transaction and the GLOBAL last transaction date, frequency =
    * transaction count, monetary = exact decimal amount sum (cast to
    * double only at the boundary). Each dimension is ranked into
    * quintiles with `ntile(5)` — recency ascending (recent buyers score
    * 1), frequency and monetary descending (heavy buyers score 1) — with
    * the entity key as the deterministic tie-break. `rfm_code` packs the
    * three digits (111 = best, 555 = most lapsed).
    *
    * Scale shape: the heavy input collapses to ONE map-side-combined
    * aggregate keyed by entity before anything else; the three `ntile`
    * windows then rank the per-entity frame, which is 3–4 orders of
    * magnitude smaller than the fact table (1.5 M customers for a 1.5 B
    * orders TPC-H). A global `ntile` still funnels that frame through one
    * task; beyond ~100 M entities swap the exact quintile for bucketing
    * against `percentile_approx` cut points — same output contract, fully
    * parallel — which is why the quintile assignment is isolated here
    * rather than fused into the aggregate.
    */
  def rfm(
      tx: DataFrame,
      custCol: String,
      dateCol: String,
      amountCol: String): DataFrame = {
    val maxDate = tx.agg(max(col(dateCol)).as("__max_date"))
    val perCust = tx
      .groupBy(col(custCol))
      .agg(
        max(col(dateCol)).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col(amountCol).cast("decimal(18,2)")).cast("double").as("monetary"))
      .crossJoin(broadcast(maxDate))
      .select(
        col(custCol),
        datediff(col("__max_date"), col("__last")).cast("long").as("r_days"),
        col("frequency"), col("monetary"))
    val k = col(custCol)
    perCust
      .withColumn("r_score",
        ntile(5).over(Window.orderBy(col("r_days"), k)).cast("int"))
      .withColumn("f_score",
        ntile(5).over(Window.orderBy(col("frequency").desc, k)).cast("int"))
      .withColumn("m_score",
        ntile(5).over(Window.orderBy(col("monetary").desc, k)).cast("int"))
      .withColumn("rfm_code",
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).cast("int"))
  }

  /** The 100 TB swap-in for [[rfm]]'s exact quintiles: bucket each
    * dimension against its `percentile_approx` 20/40/60/80 cut points
    * instead of ranking the whole entity frame through one `ntile` task.
    * The plan is TWO fully-parallel aggregates (per-entity rollup, then
    * one tiny all-combined quantile row broadcast back) — no global sort,
    * no single-partition window, entity cardinality unbounded.
    *
    * Contract difference vs [[rfm]], stated rather than hidden: ties and
    * quantile interpolation can move entities sitting exactly on a cut
    * into the adjacent quintile, so scores agree with the exact ranking
    * for all but the boundary entities (the spec pins agreement ≥95 % on
    * smooth data); recency still scores ascending (recent = 1), frequency
    * and monetary descending (heavy = 1).
    */
  def rfmApprox(
      tx: DataFrame,
      custCol: String,
      dateCol: String,
      amountCol: String,
      accuracy: Int = 10000): DataFrame = {
    val maxDate = tx.agg(max(col(dateCol)).as("__max_date"))
    val perCust = tx
      .groupBy(col(custCol))
      .agg(
        max(col(dateCol)).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col(amountCol).cast("decimal(18,2)")).cast("double").as("monetary"))
      .crossJoin(broadcast(maxDate))
      .select(
        col(custCol),
        datediff(col("__max_date"), col("__last")).cast("long").as("r_days"),
        col("frequency"), col("monetary"))
    val qs = typedLit(Seq(0.2, 0.4, 0.6, 0.8))
    val cuts = perCust.agg(
      percentile_approx(col("r_days"), qs, lit(accuracy)).as("__rc"),
      percentile_approx(col("frequency"), qs, lit(accuracy)).as("__fc"),
      percentile_approx(col("monetary"), qs, lit(accuracy)).as("__mc"))
    // ascending score: #cuts strictly below the value, +1
    def asc(v: Column, c: Column): Column =
      (size(filter(c, x => x < v)) + 1).cast("int")
    // descending: count of cuts the value does NOT exceed, inverted
    def desc5(v: Column, c: Column): Column =
      (lit(5) - size(filter(c, x => x < v))).cast("int")
    perCust
      .crossJoin(broadcast(cuts))
      .select(
        col(custCol), col("r_days"), col("frequency"), col("monetary"),
        asc(col("r_days"), col("__rc")).as("r_score"),
        desc5(col("frequency"), col("__fc")).as("f_score"),
        desc5(col("monetary"), col("__mc")).as("m_score"))
      .withColumn("rfm_code",
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).cast("int"))
  }
}

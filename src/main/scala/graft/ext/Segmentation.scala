package graft.ext

import org.apache.spark.sql.DataFrame
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
}

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
    * aggregate keyed by entity before anything else; the per-entity
    * frame is 3–4 orders of magnitude smaller than the fact table
    * (1.5 M customers for a 1.5 B orders TPC-H). The quintile engine is
    * then picked by the (checkpointed, so cheaply countable) entity
    * count: under `distributedFrom` entities the three classic global
    * `ntile(5)` windows run — one small task each, the cheapest plan at
    * that size; at or above it each dimension is ranked by
    * [[distributedNtile5]] — range-partition on the dimension,
    * per-partition row_number, driver-composed partition offsets — which
    * reproduces `ntile(5)` BIT-EXACTLY (same bucket-size formula over
    * the same strict total order, spec-pinned), so the threshold is pure
    * performance tuning: the exact-quintile output contract holds at
    * every cardinality and no single-task window survives where the
    * frame is big enough to matter. [[rfmApprox]] remains the cheaper
    * cut-point variant for callers that accept boundary drift.
    *
    * NOTE: building the returned DataFrame RUNS Spark jobs eagerly (the
    * per-entity frame is checkpointed and counted; the distributed path
    * additionally collects per-partition sizes — bounded by the
    * partition count, never by entities).
    */
  def rfm(
      tx: DataFrame,
      custCol: String,
      dateCol: String,
      amountCol: String,
      distributedFrom: Long = 500000L): DataFrame = {
    val maxDate = tx.agg(max(col(dateCol)).as("__max_date"))
    // consumed four times (three rank passes + the output spine):
    // localCheckpoint runs the fact-table aggregate once; O(entities)
    // storage, released with the plan.
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
      .repartition(tx.sparkSession.sparkContext.defaultParallelism)
      .localCheckpoint(true)
    val k = col(custCol)
    if (perCust.count() < distributedFrom) {
      // small frame: the classic single-task windows win on fixed cost
      perCust
        .withColumn("r_score",
          ntile(5).over(Window.orderBy(col("r_days"), k)).cast("int"))
        .withColumn("f_score",
          ntile(5).over(Window.orderBy(col("frequency").desc, k)).cast("int"))
        .withColumn("m_score",
          ntile(5).over(Window.orderBy(col("monetary").desc, k)).cast("int"))
        .withColumn("rfm_code",
          (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).cast("int"))
    } else {
      // explicit null orderings = the Window.orderBy defaults the global
      // formulation uses (asc → nulls first, desc → nulls last), so the
      // total order — and with it every score — is identical across paths
      val rs = distributedNtile5(perCust, custCol,
        Seq(col("r_days").asc_nulls_first, k.asc_nulls_first), "r_score")
      val fs = distributedNtile5(perCust, custCol,
        Seq(col("frequency").desc_nulls_last, k.asc_nulls_first), "f_score")
      val ms = distributedNtile5(perCust, custCol,
        Seq(col("monetary").desc_nulls_last, k.asc_nulls_first), "m_score")
      perCust
        .join(rs, Seq(custCol))
        .join(fs, Seq(custCol))
        .join(ms, Seq(custCol))
        .withColumn("rfm_code",
          (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).cast("int"))
    }
  }

  /** Exact `ntile(5)` over the strict total order `ord`, computed
    * WITHOUT a global window: range-repartition on the order (so
    * partition i's tuples all precede partition i+1's), per-partition
    * `row_number` (parallel — each window partition is one task's
    * data), then global rank = partition offset + local row number with
    * the offsets composed driver-side from the per-partition counts (a
    * bounded collect: ≤ one row per partition, never per entity). The
    * bucket assignment applies ntile's own size formula — the first
    * `n mod 5` buckets get `ceil(n/5)` rows, the rest `floor(n/5)` — so
    * the result is bit-identical to `ntile(5).over(Window.orderBy(ord))`
    * while every stage scales with the cluster, not with one task.
    *
    * `ord` must be a STRICT total order (include a unique tie-break
    * key): ties across a range-partition boundary would otherwise make
    * ranks partitioning-dependent.
    *
    * Returns (keyCol, scoreName) — one row per input row.
    */
  private def distributedNtile5(
      df: DataFrame,
      keyCol: String,
      ord: Seq[Column],
      scoreName: String): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(1, spark.sparkContext.defaultParallelism)
    // checkpoint so the two consumers (size collect, ranked output) see
    // ONE materialized partitioning — the range boundaries are sampled,
    // and re-deriving them per consumer would recompute the sampling job
    val rp = df.repartitionByRange(parts, ord: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // bounded collect: one (pid, count) row per partition (≤ `parts`)
    val sizes = rp.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = sizes.map { case (pid, c) => val o = acc; acc += c; (pid, o) }
    val n = acc
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(ord: _*)
    val ranked = rp
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn("__rank", col("__off") + col("__rn"))
    // ntile bucket of rank r over n rows, 5 buckets: base = n/5 rows per
    // bucket, the first rem = n%5 buckets hold one extra. Integer ceil
    // via floor((x + d - 1)/d); double division is exact for n < 2^52.
    val base = n / 5
    val rem = n % 5
    val cut = rem * (base + 1)
    val score =
      if (base == 0) col("__rank") // n < 5: every row is its own bucket
      else when(col("__rank") <= lit(cut),
        floor((col("__rank") + lit(base)) / lit(base + 1)))
        .otherwise(lit(rem) +
          floor((col("__rank") - lit(cut) + lit(base) - 1) / lit(base)))
    ranked.select(col(keyCol), score.cast("int").as(scoreName))
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

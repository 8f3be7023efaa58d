package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass table profiling — the data-quality audit a pipeline runs
  * before trusting a new drop of data: per column, row/null/distinct
  * counts, numeric range, and string length stats.
  *
  * One wide aggregate computes every statistic in ONE scan of the table
  * (Catalyst expands the multi-distinct into grouping sets internally —
  * map-side partial aggregation throughout); the driver-side pivot to
  * one-row-per-column operates on a single collected row of ~6×stats
  * scalars. Exact `count_distinct` is the honest default at test scale;
  * at 100 TB swap the distinct estimator for [[Sketches.kmvDistinct]] —
  * the output contract is the same.
  *
  * Numeric ranges surface as DOUBLES (timestamps as epoch micros):
  * min/max of the same value set are bit-identical across engines,
  * whereas double→string formatting is not, so strings are profiled by
  * LENGTH only. All averages are rounded to 6 dp before comparison.
  */
object Profiler {

  /** Column kinds: `num` (castable to double), `ts` (timestamp), `str`. */
  sealed trait Kind
  case object Num extends Kind
  case object Ts extends Kind
  case object Str extends Kind

  def profile(df: DataFrame, cols: Seq[(String, Kind)]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs = cols.flatMap { case (c, kind) =>
      val numView = kind match {
        case Num => col(c).cast("double")
        // parquet TIMESTAMP may load as TIMESTAMP_NTZ, which unix_micros
        // rejects; the cast is value-preserving under the UTC session TZ
        case Ts  => unix_micros(col(c).cast("timestamp")).cast("double")
        case Str => lit(null).cast("double")
      }
      Seq(
        count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(numView).as(s"__min_$c"),
        max(numView).as(s"__max_$c"),
        (kind match {
          case Str => round(avg(length(col(c))), 6)
          case _   => lit(null).cast("double")
        }).as(s"__al_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { case (c, _) =>
      struct(
        lit(c).as("col_name"),
        col(s"__n_$c").as("n"),
        col(s"__nn_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_num"),
        col(s"__max_$c").as("max_num"),
        col(s"__al_$c").as("avg_len"))
    }
    one.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }

  /** DuckDB twin: one SELECT per column UNION ALL'd (the oracle does not
    * need the single-pass property, only identical values).
    */
  def profileSql(table: String, cols: Seq[(String, Kind)]): String =
    cols.map { case (c, kind) =>
      val numView = kind match {
        case Num => s"CAST($c AS DOUBLE)"
        case Ts  => s"CAST(epoch_us($c) AS DOUBLE)"
        case Str => "CAST(NULL AS DOUBLE)"
      }
      val avgLen = kind match {
        case Str => s"round(avg(length($c)), 6)"
        case _   => "CAST(NULL AS DOUBLE)"
      }
      s"""SELECT '$c' AS col_name,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  MIN($numView) AS min_num,
         |  MAX($numView) AS max_num,
         |  $avgLen AS avg_len
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  /** Equi-width histogram of a numeric column: `nBins` equal-width bins
    * over the column's observed [min, max], reporting each non-empty
    * bin's bounds, count, and fraction of rows. Two passes: one tiny
    * aggregate for (min, max, total) — broadcast to the second scan,
    * which bins and hash-aggregates with map-side combine, so shuffle
    * volume is O(nBins). The max value is clamped into the last bin
    * (`least(bin, nBins-1)`); bounds are rounded to 6 dp at the output
    * boundary only — binning itself uses the raw doubles in BOTH engines.
    */
  /** Join-key skew diagnostic — "will a shuffle on this key hot-spot at
    * 100 TB?": distribution statistics of per-key row counts (the
    * quantity AQE's skew handling and salting decisions key off),
    * plus the top-`topK` heaviest keys by name.
    *
    * Scale shape: the per-key count aggregate is map-side combined; the
    * quantile extraction then runs on the COUNT HISTOGRAM (distinct
    * count value → number of keys with that count) — a frame bounded by
    * the number of DISTINCT multiplicities (ln-ish in practice, never
    * |keys|) — via a cumulative window over that tiny frame, so there is
    * no global sort of the key frame anywhere. Discrete quantiles
    * (smallest count with cumulative keys ≥ ⌈q·n_keys⌉) are exact and
    * engine-identical, with none of quantile_cont's interpolation-
    * formula risk. Top-k is `TakeOrderedAndProject` on the count frame.
    *
    * Output rows (stat STRING, key STRING, value DOUBLE):
    * `n_rows`/`n_keys`/`mean`/`p50`/`p90`/`p99`/`max`/`skew` with NULL
    * key (skew = max/mean), then one `top` row per heaviest key.
    */
  def keySkew(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__c"))
    val hist = counts.groupBy(col("__c")).agg(count(lit(1)).as("__nk"))
    // cumulative keys by ascending count over the multiplicity histogram;
    // single partition DECLARED (non-foldable constant) — the frame is
    // |distinct multiplicities|, not |keys|
    val w = Window.partitionBy(pmod(coalesce(col("__c"), lit(0L)), lit(1)))
      .orderBy(col("__c"))
    val cum = hist.withColumn("__cum", sum(col("__nk")).over(w))
      .crossJoin(broadcast(
        counts.agg(count(lit(1)).as("__n_keys"), sum(col("__c")).as("__n_rows"))))
      .localCheckpoint(true) // consumed by 3 quantile probes + scalars
    def quant(q: Double): DataFrame = cum
      .filter(col("__cum") >= ceil(lit(q) * col("__n_keys")))
      .agg(min(col("__c")).as("v"))
    val scalars = cum.limit(1).select(col("__n_rows"), col("__n_keys"))
      .crossJoin(broadcast(quant(0.5).select(col("v").as("__p50"))))
      .crossJoin(broadcast(quant(0.9).select(col("v").as("__p90"))))
      .crossJoin(broadcast(quant(0.99).select(col("v").as("__p99"))))
      .crossJoin(broadcast(cum.agg(max(col("__c")).as("__max"))))
    val mean = col("__n_rows").cast("double") / col("__n_keys")
    val statRows = scalars.select(explode(array(
      struct(lit("n_rows").as("stat"), lit(null).cast("string").as("key"),
        col("__n_rows").cast("double").as("value")),
      struct(lit("n_keys").as("stat"), lit(null).cast("string").as("key"),
        col("__n_keys").cast("double").as("value")),
      struct(lit("mean").as("stat"), lit(null).cast("string").as("key"),
        round(mean, 6).as("value")),
      struct(lit("p50").as("stat"), lit(null).cast("string").as("key"),
        col("__p50").cast("double").as("value")),
      struct(lit("p90").as("stat"), lit(null).cast("string").as("key"),
        col("__p90").cast("double").as("value")),
      struct(lit("p99").as("stat"), lit(null).cast("string").as("key"),
        col("__p99").cast("double").as("value")),
      struct(lit("max").as("stat"), lit(null).cast("string").as("key"),
        col("__max").cast("double").as("value")),
      struct(lit("skew").as("stat"), lit(null).cast("string").as("key"),
        round(col("__max") / mean, 6).as("value")))).as("__r"))
      .select(col("__r.*"))
    val topRows = counts
      .orderBy(col("__c").desc, col("__k"))
      .limit(topK)
      .select(lit("top").as("stat"), col("__k").as("key"),
        col("__c").cast("double").as("value"))
    statRows.unionByName(topRows)
  }

  def histogram(df: DataFrame, colName: String, nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val v = col(colName).cast("double")
    val mm = df.agg(
      min(v).as("__lo"), max(v).as("__hi"), count(v).as("__total"))
    val width = (col("__hi") - col("__lo")) / nBins
    df.select(v.as("__v"))
      .filter(col("__v").isNotNull)
      .crossJoin(broadcast(mm))
      .select(
        least(floor((col("__v") - col("__lo")) / width), lit(nBins - 1))
          .cast("int").as("bin"),
        col("__lo"), col("__hi"), col("__total"))
      .groupBy(col("bin"), col("__lo"), col("__hi"), col("__total"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("bin"),
        round(col("__lo") + col("bin") * width, 6).as("bin_lo"),
        round(col("__lo") + (col("bin") + 1) * width, 6).as("bin_hi"),
        col("n"),
        round(col("n").cast("double") / col("__total"), 6).as("frac"))
  }
}

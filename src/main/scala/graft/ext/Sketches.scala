package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded bottom-k DISTINCT aggregator: the k smallest distinct hash
  * values seen per group, in one pass with partial aggregation.
  *
  * This is the state of a KMV (k-minimum-values) distinct-count sketch
  * (Bar-Yossef et al., "Counting distinct elements in a data stream",
  * RANDOM 2002; the same estimator family as DataSketches' theta sketch).
  * Each map task reduces its partition to <= k values per group BEFORE the
  * shuffle — the exact property that makes a sketch preferable to
  * `countDistinct` at 100 TB: `countDistinct` expands to a two-phase
  * shuffle whose first exchange carries EVERY distinct key, while the KMV
  * shuffle carries k longs per (group x map task), a constant.
  *
  * The buffer is a sorted ascending list, deduplicated on merge, truncated
  * at k — fully deterministic for any partitioning / merge order, which is
  * what lets the sketch be oracle-checked value-for-value, not just within
  * error bars.
  */
final class BottomKDistinctAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  /** Per-row update. The common case at 100 TB — buffer already full and
    * the incoming hash above the current k-th minimum — is an O(log k)
    * reject (one binary-search bound check short-circuited by comparing
    * against the last element first), with NO allocation. Only genuinely
    * new bottom-k values pay the O(k) sorted insert, and those become
    * geometrically rarer as the sketch saturates.
    */
  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    val n = buf.length
    if (n == k && x >= buf(n - 1)) return buf // full and not a new minimum
    val i = java.util.Arrays.binarySearch(buf, x)
    if (i >= 0) return buf // duplicate
    val ins = -(i + 1)
    val outLen = math.min(n + 1, k)
    val out = new Array[Long](outLen)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = x
    System.arraycopy(buf, ins, out, ins + 1, outLen - ins - 1)
    out
  }

  /** Merge two sorted-ascending distinct arrays, dropping duplicates,
    * truncated at k — deterministic for any merge order.
    */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val tmp = new Array[Long](math.min(a.length + b.length, k))
    var (i, j, n) = (0, 0, 0)
    var last = 0L
    var has = false
    while (n < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val h = a(i); i += 1; h }
        else { val h = b(j); j += 1; h }
      if (!has || v != last) { tmp(n) = v; n += 1; last = v; has = true }
    }
    if (n == tmp.length) tmp else java.util.Arrays.copyOf(tmp, n)
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

/** Distributed sketches whose OUTPUT is deterministic (and therefore
  * oracle-checkable): estimates are pure functions of a portable hash, not
  * of partitioning, RNG state, or engine-internal hashing.
  */
object Sketches {

  /** Hash domain size for [[PortableHash.hash32]]: values are uniform in
    * [0, 2^32).
    */
  val HashDomain: Double = 4294967296.0

  /** KMV distinct-count estimate per group.
    *
    * `keyStr` is hashed with the portable 32-bit hash; per group we keep
    * the k smallest distinct hash values (single pass, partial agg, see
    * [[BottomKDistinctAggregator]]). With fewer than k distinct hashes the
    * sketch IS the exact distinct set, so the estimate is exact; otherwise
    * the classic unbiased estimator `(k-1) * 2^32 / h_(k)` (the k-th
    * minimum linearly extrapolates the hash density). Relative error is
    * ~1/sqrt(k-2); k=256 gives ~6%.
    *
    * Output: groupCols ++ (n_sketch INT — distinct hashes retained,
    * kth_min BIGINT — the k-th minimum or the max retained when exact,
    * estimate DOUBLE).
    */
  def kmvDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      keyStr: Column,
      k: Int): DataFrame = {
    val bottomK = udaf(new BottomKDistinctAggregator(k))
    // null keys hash to NULL, which a primitive-Long udaf would silently
    // read as 0L (a spurious sketch minimum); drop them before the agg —
    // a NULL key contributes no distinct value, matching the SQL twin's
    // WHERE hv IS NOT NULL
    df.withColumn("__hv", PortableHash.hash32(keyStr))
      .filter(col("__hv").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(bottomK(col("__hv")).as("__mins"))
      .select(
        groupCols.map(col) ++ Seq(
          size(col("__mins")).as("n_sketch"),
          element_at(col("__mins"), size(col("__mins"))).as("kth_min"),
          when(size(col("__mins")) < k,
            size(col("__mins")).cast("double"))
            .otherwise(
              lit((k - 1).toDouble * HashDomain) /
                element_at(col("__mins"), k).cast("double"))
            .as("estimate")): _*)
  }

  /** Fixed-grid quantile sketch — the quantile sibling of [[kmvDistinct]]:
    * deterministic, merge-order independent, oracle-checkable
    * value-for-value (unlike KLL/t-digest, whose compactions depend on
    * arrival order and can only be checked within error bars).
    *
    * `ticks` must be an integral Column (callers convert values
    * decimal-exactly, e.g. money → cents). Values are bucketed on a fixed
    * grid of `width` ticks (floor division via the pmod identity, exact
    * for negatives); the sketch state is one count per occupied bucket —
    * bounded by domain/width, independent of row count, and map-side
    * combined before the one shuffle. For each requested percent p, the
    * answer is the first bucket whose cumulative count reaches
    * `ceil(p·n/100)` (pure integer arithmetic — no float rank): the true
    * p-quantile is guaranteed inside it, so the value error is at most
    * `width` ticks by construction.
    *
    * At 100 TB: the count aggregation is the only data-sized operation
    * (shuffle weight = occupied buckets × groups); the window + percent
    * explode run on the tiny bucket table. Quantile state never grows
    * with rows — the property `percentile_approx` provides, but with a
    * deterministic, engine-portable answer.
    *
    * Output: groupCols ++ (pct INT, target_rank BIGINT — the rank the
    * bucket must cover, bucket BIGINT, upper_tick BIGINT — exclusive
    * upper bound of the answering bucket).
    */
  def gridQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      ticks: Column,
      width: Long,
      percents: Seq[Int]): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1, 100], got $percents")
    val g = groupCols.map(col)
    val counts = df
      .select(g :+ ticks.cast("long").as("__t"): _*)
      // NULL ticks are not measurements: unfiltered they'd become a NULL
      // bucket that Spark's ascending window sorts FIRST (DuckDB sorts it
      // LAST — an engine divergence on top of the skew), silently
      // dragging every quantile down. SQL percentile semantics ignore
      // nulls; so do we, in both this plan and the SQL twin.
      .filter(col("__t").isNotNull)
      .select(g :+ expr(s"(__t - pmod(__t, ${width}L)) div ${width}L").as("__bkt"): _*)
      .groupBy(g :+ col("__bkt"): _*)
      .agg(count(lit(1)).as("__cnt"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("__bkt"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(g: _*)
    counts
      .withColumn("__cum", sum(col("__cnt")).over(wCum))
      .withColumn("__n", sum(col("__cnt")).over(wAll))
      .select(g ++ Seq(col("__bkt"), col("__cnt"), col("__cum"), col("__n"),
        explode(typedLit(percents)).as("pct")): _*)
      .withColumn("target_rank", expr("(pct * __n + 99) div 100"))
      .filter(col("__cum") - col("__cnt") < col("target_rank") &&
        col("__cum") >= col("target_rank"))
      .select(g ++ Seq(col("pct").cast("int").as("pct"), col("target_rank"),
        col("__bkt").as("bucket"),
        ((col("__bkt") + 1) * width).as("upper_tick")): _*)
  }

  /** KMV SET ALGEBRA — the reason bottom-k sketches beat plain distinct
    * counters in a pipeline: two independently-built sketches answer
    * union / intersection / Jaccard questions WITHOUT revisiting the
    * data. For key sets A and B (each reduced to its k smallest distinct
    * portable hashes — one bounded partial-agg pass per side):
    *
    *  - union estimate: the standard KMV estimator over merge(A, B)
    *    (the k smallest of the hash union — exactly what a bottom-k
    *    sketch of A ∪ B would have retained);
    *  - Jaccard estimate: the fraction of the merged sketch's members
    *    present in BOTH input sketches (ρ = |M ∩ A ∩ B| / |M|, the
    *    classic KMV coincidence estimator);
    *  - intersection estimate: ρ × union estimate.
    *
    * Everything downstream of the two aggregations is arithmetic over
    * two ≤k-long arrays on a one-row frame — driver-scale work. All
    * outputs are deterministic functions of the portable hashes, so the
    * oracle reproduces them exactly (sets smaller than k degrade to
    * exact values by the same CASE both engines apply).
    *
    * Output (one row): n_a, n_b (sketch sizes), est_a, est_b,
    * est_union, jaccard_est, est_intersection (floats rounded to 6 dp).
    */
  def kmvSetOps(
      dfA: DataFrame,
      keyA: Column,
      dfB: DataFrame,
      keyB: Column,
      k: Int): DataFrame = {
    val bottomK = udaf(new BottomKDistinctAggregator(k))
    def sketch(df: DataFrame, key: Column, alias: String) =
      df.withColumn("__hv", PortableHash.hash32(key))
        .filter(col("__hv").isNotNull)
        .agg(bottomK(col("__hv")).as(alias))
    def est(mins: Column): Column =
      when(size(mins) < k, size(mins).cast("double"))
        .otherwise(lit((k - 1).toDouble * HashDomain) /
          element_at(mins, k).cast("double"))
    sketch(dfA, keyA, "a").crossJoin(sketch(dfB, keyB, "b"))
      .withColumn("m", slice(array_sort(array_union(col("a"), col("b"))), 1, k))
      .withColumn("est_union", round(est(col("m")), 6))
      .withColumn("__in_both",
        size(filter(col("m"), x =>
          array_contains(col("a"), x) && array_contains(col("b"), x))))
      .withColumn("jaccard_est",
        round(col("__in_both").cast("double") / size(col("m")), 6))
      .select(
        size(col("a")).as("n_a"),
        size(col("b")).as("n_b"),
        round(est(col("a")), 6).as("est_a"),
        round(est(col("b")), 6).as("est_b"),
        col("est_union"),
        col("jaccard_est"),
        round(col("jaccard_est") * col("est_union"), 6).as("est_intersection"))
  }

  /** DuckDB twin of [[kmvSetOps]]: same bottom-k lists, merge, and
    * estimator arithmetic. `fromA`/`fromB` are FROM-able sources whose
    * `keySql` yields the key string.
    */
  def kmvSetOpsSql(
      fromA: String, keyASql: String,
      fromB: String, keyBSql: String,
      k: Int): String = {
    def sketchCte(name: String, from: String, keySql: String) =
      s"""$name AS (
         |  SELECT list(hv ORDER BY hv) AS mins FROM (
         |    SELECT DISTINCT ${PortableHash.hash32Sql(keySql)} AS hv
         |    FROM $from
         |    WHERE ${PortableHash.hash32Sql(keySql)} IS NOT NULL
         |    ORDER BY hv LIMIT $k))""".stripMargin
    val estK = (k - 1).toDouble * HashDomain
    def est(mins: String) =
      s"CASE WHEN len($mins) < $k THEN CAST(len($mins) AS DOUBLE) ELSE $estK / $mins[$k] END"
    s"""WITH ${sketchCte("sa", fromA, keyASql)},
       |${sketchCte("sb", fromB, keyBSql)},
       |mg AS (SELECT sa.mins AS a, sb.mins AS b,
       |         list_sort(list_distinct(list_concat(sa.mins, sb.mins)))[1:$k] AS m
       |       FROM sa, sb),
       |c AS (SELECT a, b, m,
       |        round(${est("m")}, 6) AS est_union,
       |        round(CAST(len(list_filter(m, x -> list_contains(a, x) AND list_contains(b, x))) AS DOUBLE)
       |              / len(m), 6) AS jaccard_est
       |      FROM mg)
       |SELECT CAST(len(a) AS INTEGER) AS n_a, CAST(len(b) AS INTEGER) AS n_b,
       |  round(${est("a")}, 6) AS est_a, round(${est("b")}, 6) AS est_b,
       |  est_union, jaccard_est,
       |  round(jaccard_est * est_union, 6) AS est_intersection
       |FROM c""".stripMargin
  }

  /** Count-min frequency sketch — the frequency member of the
    * deterministic sketch family ([[kmvDistinct]] = distinct count,
    * [[gridQuantiles]] = quantiles): a d×w table of counters where key x
    * increments cell `(i, ((hash32(x) mod P)·a_i + b_i) mod P mod w)` for
    * each of d rows; the estimate for x is the MIN over its d cells —
    * always ≥ the true count (collisions only inflate), within εN with
    * probability 1−δ for w = e/ε, d = ln(1/δ).
    *
    * Determinism: positions come from the portable universal-hash family
    * with literal constants — the full cell table, and therefore every
    * estimate INCLUDING collision inflation, is reproduced bit-for-bit by
    * the oracle. Merge = cell-wise add (commutative): partitioning-
    * invariant.
    *
    * Scale shape: the count aggregation is the only data-sized operation
    * (map-side combined, shuffle bounded by d×w occupied cells — NOT by
    * key cardinality, which is the whole point vs an exact groupBy at
    * 100 TB); the collected table is d×w longs (128 KB at the registered 4×4096; it also rides as a plan literal in countMinEstimate, so size w accordingly), the
    * same structurally-small class as a codebook.
    */
  /** The distributed half of [[countMinTable]]: the sparse (cell, count)
    * frame — `__cell` is the dense index `i·w + pos_i`, `__n` its count.
    * Exposed separately so incremental maintainers (the streaming sketch
    * tier) can persist per-batch cell counts and merge additively on
    * read instead of re-scanning history.
    */
  def countMinCells(
      df: DataFrame,
      keyStr: Column,
      d: Int,
      w: Int): DataFrame = {
    require(d > 0 && w > 0, s"need d > 0, w > 0; got d=$d w=$w")
    val ab = PortableHash.minhashAB(d)
    // native kernel: one md5 per row (the columnar array expression
    // inlines the base hash into every element — d md5s/row)
    df.select(explode(org.apache.spark.sql.GraftSqlBridge.column(
        graft.expr.CmsCells(
          org.apache.spark.sql.GraftSqlBridge.expression(keyStr),
          ab, w))).as("__cell"))
      .groupBy(col("__cell")).agg(count(lit(1)).as("__n"))
  }

  def countMinTable(
      df: DataFrame,
      keyStr: Column,
      d: Int,
      w: Int): Array[Long] = {
    val cells = countMinCells(df, keyStr, d, w).collect()
    val arr = new Array[Long](d * w)
    cells.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Point-estimate Column over a collected [[countMinTable]]: min of the
    * key's d cells (narrow map over a literal table).
    */
  def countMinEstimate(table: Seq[Long], keyStr: Column, d: Int, w: Int): Column = {
    require(table.length == d * w, s"table length ${table.length} != $d*$w")
    val ab = PortableHash.minhashAB(d)
    val arr = typedLit(table)
    val x = pmod(PortableHash.hash32(keyStr), lit(PortableHash.P))
    ab.zipWithIndex.map { case ((a, b), i) =>
      element_at(arr, (lit(i * w) + pmod(x * a + b, lit(PortableHash.P)) % w).cast("int") + 1)
    }.reduce(least(_, _))
  }

  /** DuckDB CTEs reproducing [[countMinTable]] bit-for-bit over
    * `keysFromSql` (rows of key expr `keySql`): `cmarr` is one row whose
    * `cm` column is the dense d·w cell list.
    */
  def countMinSqlCtes(keysFromSql: String, keySql: String, d: Int, w: Int): String = {
    val ab = PortableHash.minhashAB(d)
    val ha = PortableHash.bigintListSql(ab.map(_._1))
    val hb = PortableHash.bigintListSql(ab.map(_._2))
    val P = PortableHash.P
    s"""cmab AS (SELECT $ha AS ha, $hb AS hb),
       |cmcell AS (SELECT (i-1)*$w +
       |             ((${PortableHash.hash32Sql(keySql)} % $P) * ha[CAST(i AS INT)]
       |              + hb[CAST(i AS INT)]) % $P % $w AS cell
       |           FROM $keysFromSql, cmab, (SELECT unnest(range(1, ${d + 1})) AS i)),
       |cmcnt AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n FROM cmcell GROUP BY cell),
       |cmarr AS (SELECT list(COALESCE(cmcnt.n, 0) ORDER BY r.i) AS cm
       |          FROM (SELECT unnest(range(0, ${d * w})) AS i) r
       |          LEFT JOIN cmcnt ON cmcnt.cell = r.i)""".stripMargin
  }

  /** SQL estimate mirroring [[countMinEstimate]] against `cmarr.cm`. */
  def countMinEstimateSql(keySql: String, d: Int, w: Int): String = {
    val ab = PortableHash.minhashAB(d)
    val P = PortableHash.P
    val cells = ab.zipWithIndex.map { case ((a, b), i) =>
      s"cm[CAST(${i * w} + ((${PortableHash.hash32Sql(keySql)} % $P) * $a + $b) % $P % $w + 1 AS INT)]"
    }
    cells.mkString("LEAST(", ", ", ")")
  }

  /** The DuckDB twin of [[gridQuantiles]] for a single group column:
    * identical integer bucket / cumulative / ceil-rank arithmetic.
    */
  def gridQuantilesSql(
      table: String, groupCol: String, tickSql: String,
      width: Long, percents: Seq[Int]): String =
    s"""WITH b AS (SELECT $groupCol AS g, CAST($tickSql AS BIGINT) AS t FROM $table),
       |c AS (SELECT g, t // ${width} AS bkt, CAST(COUNT(*) AS BIGINT) AS cnt
       |      FROM b WHERE t IS NOT NULL GROUP BY g, bkt),
       |w AS (SELECT g, bkt, cnt,
       |        SUM(cnt) OVER (PARTITION BY g ORDER BY bkt) AS cum,
       |        SUM(cnt) OVER (PARTITION BY g) AS n FROM c),
       |p AS (SELECT unnest([${percents.mkString(", ")}]) AS pct)
       |SELECT g AS $groupCol, CAST(pct AS INT) AS pct,
       |  CAST((pct*n + 99) // 100 AS BIGINT) AS target_rank,
       |  CAST(bkt AS BIGINT) AS bucket,
       |  CAST((bkt+1)*${width} AS BIGINT) AS upper_tick
       |FROM w, p
       |WHERE cum - cnt < (pct*n + 99) // 100 AND cum >= (pct*n + 99) // 100
       |ORDER BY $groupCol, pct""".stripMargin

  /** The DuckDB twin of [[kmvDistinct]] for a single group column: same
    * hash, same k-th minimum, same estimator expression, so the two
    * engines agree bit-for-bit. `(k-1) * 2^32` is an exact integer
    * (< 2^53) and the estimate is one IEEE double division — deterministic
    * on both sides.
    */
  def kmvDistinctSql(table: String, groupCol: String, keyStrSql: String, k: Int): String =
    s"""WITH h AS (
       |  SELECT DISTINCT $groupCol, ${PortableHash.hash32Sql(keyStrSql)} AS hv
       |  FROM $table
       |  WHERE ${PortableHash.hash32Sql(keyStrSql)} IS NOT NULL),
       |r AS (
       |  SELECT $groupCol, hv,
       |         row_number() OVER (PARTITION BY $groupCol ORDER BY hv) AS rn,
       |         COUNT(*) OVER (PARTITION BY $groupCol) AS nd
       |  FROM h)
       |SELECT $groupCol,
       |  CAST(LEAST(nd, $k) AS INTEGER) AS n_sketch,
       |  MAX(CASE WHEN rn = LEAST(nd, $k) THEN hv END) AS kth_min,
       |  CASE WHEN nd < $k THEN CAST(nd AS DOUBLE)
       |       ELSE ${(k - 1).toDouble * HashDomain} / MAX(CASE WHEN rn = $k THEN hv END) END AS estimate
       |FROM r WHERE rn <= $k
       |GROUP BY $groupCol, nd
       |ORDER BY $groupCol""".stripMargin

  /** HyperLogLog distinct-count estimate per group — the FIXED-state
    * member of the distinct-sketch family. Where [[kmvDistinct]] carries
    * the k smallest hashes (k longs of state, exact below k), HLL carries
    * `m = 2^b` 5-bit registers: bucket `h mod m`, register = max over the
    * bucket of `rho(w)` = position of the leading 1-bit of `w = h div m`
    * within its `W = 32 - b` bit budget. Standard error ~1.04/sqrt(m).
    *
    * Fully declarative — no custom Aggregator: `max rho` per bucket equals
    * `rho(min w)` (rho is non-increasing in w), so the sketch is
    *   groupBy(group, bucket).min(w)  →  groupBy(group) harmonic sum
    * with the first aggregation map-side combined and its shuffle bounded
    * by m rows per (group × task) — the classic 100 TB distinct plan.
    *
    * Determinism (what makes the estimate oracle-checkable, not just
    * error-barred): the bucket/rank split is integer arithmetic on the
    * portable hash; `1/2^rho` terms are exact IEEE powers of two whose
    * sum over <= m registers never exceeds 53 mantissa bits, so ANY
    * accumulation order yields the same double; alpha·m² is inlined as
    * one driver-computed literal in both engines; the final value is
    * rounded to 6 dp (the float-compare rule), hiding only the <= 1 ulp
    * `ln` divergence in the small-range linear-counting branch.
    *
    * Output: groupCols ++ (n_present INT — occupied registers,
    * estimate DOUBLE — bias-corrected, linear counting below 2.5m).
    */
  def hllDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      keyStr: Column,
      b: Int): DataFrame = {
    require(b >= 2 && b <= 12, s"b must be in [2, 12], got $b")
    val m = 1 << b
    val bigW = 32 - b
    val alphaM2 = hllAlphaM2(m)
    val g = groupCols.map(col)
    df.withColumn("__h", PortableHash.hash32(keyStr))
      .filter(col("__h").isNotNull)
      .select(g ++ Seq(
        pmod(col("__h"), lit(m.toLong)).as("__b"),
        expr(s"__h div ${m}L").as("__w")): _*)
      .groupBy(g :+ col("__b"): _*)
      .agg(min(col("__w")).as("__wmin"))
      .withColumn("__rho",
        when(col("__wmin") === 0L, lit(bigW + 1))
          .otherwise(lit(bigW + 1) - length(bin(col("__wmin")))))
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("__np"),
        // SQL form: the Scala `shiftleft` helper takes a literal shift,
        // not a Column; 2^rho <= 2^27 is an exact IEEE double
        sum(lit(1.0) / expr("shiftleft(1L, __rho)").cast("double")).as("__sp"))
      .withColumn("__s", col("__sp") + (lit(m.toDouble) - col("__np").cast("double")))
      .withColumn("__zeros", lit(m.toLong) - col("__np"))
      .withColumn("__raw", lit(alphaM2) / col("__s"))
      .select(g ++ Seq(
        col("__np").cast("int").as("n_present"),
        round(
          when(col("__raw") <= lit(2.5 * m) && col("__zeros") > 0L,
            lit(m.toDouble) * log(lit(m.toDouble) / col("__zeros").cast("double")))
            .otherwise(col("__raw")),
          6).as("estimate")): _*)
  }

  /** alpha_m · m² — the HLL bias constant, computed once driver-side and
    * inlined as the SAME double literal into both engines' plans.
    */
  def hllAlphaM2(m: Int): Double = 0.7213 / (1.0 + 1.079 / m) * m * m

  /** Sliding-window distinct counts from MERGED per-pane HLL register
    * states — the re-aggregability that makes trailing distinct counts
    * feasible on a stream: the raw data is hashed ONCE into per-pane
    * (e.g. hourly) register states; every sliding window is then the
    * register-wise MERGE (`min` of `wmin`, = `max` of rho) of its
    * constituent panes. An exact `count_distinct` cannot do this — each
    * window would re-scan its full span, counting every event `panes`
    * times; here the expansion runs on pane-register rows, bounded by
    * panes × m, NEVER on events.
    *
    * Windows are trailing: window `w` covers panes `(w-panes, w]`, one
    * output row per pane index up to the last observed pane (head
    * windows are partial by construction; the cap avoids phantom
    * post-stream windows). Same deterministic estimator arithmetic as
    * [[hllDistinct]] — the estimate is oracle-checkable value-for-value,
    * and merged-window estimates are EXACTLY what a one-shot sketch of
    * the window's span would produce (merge = min is associative and
    * lossless on register states).
    */
  def hllSlidingDistinct(
      df: DataFrame,
      tsCol: String,
      keyStr: Column,
      b: Int,
      panes: Int,
      paneUs: Long): DataFrame = {
    require(b >= 2 && b <= 12, s"b must be in [2, 12], got $b")
    require(panes > 0 && paneUs > 0, s"need panes > 0, paneUs > 0; got $panes, $paneUs")
    val m = 1 << b
    val bigW = 32 - b
    val alphaM2 = hllAlphaM2(m)
    val paneRegs = df
      .withColumn("__h", PortableHash.hash32(keyStr))
      .filter(col("__h").isNotNull)
      .select(
        (unix_micros(col(tsCol)) / paneUs).cast("long").as("__p"),
        pmod(col("__h"), lit(m.toLong)).as("__b"),
        expr(s"__h div ${m}L").as("__w"))
      .groupBy(col("__p"), col("__b"))
      .agg(min(col("__w")).as("__wmin"))
    val maxPane = paneRegs.agg(max(col("__p")).as("__maxp"))
    paneRegs
      .select(col("__b"), col("__wmin"),
        explode(sequence(col("__p"), col("__p") + (panes - 1))).as("__win"))
      .crossJoin(broadcast(maxPane))
      .filter(col("__win") <= col("__maxp"))
      .groupBy(col("__win"), col("__b"))
      .agg(min(col("__wmin")).as("__wmin"))
      .withColumn("__rho",
        when(col("__wmin") === 0L, lit(bigW + 1))
          .otherwise(lit(bigW + 1) - length(bin(col("__wmin")))))
      .groupBy(col("__win"))
      .agg(
        count(lit(1)).as("__np"),
        sum(lit(1.0) / expr("shiftleft(1L, __rho)").cast("double")).as("__sp"))
      .withColumn("__s", col("__sp") + (lit(m.toDouble) - col("__np").cast("double")))
      .withColumn("__zeros", lit(m.toLong) - col("__np"))
      .withColumn("__raw", lit(alphaM2) / col("__s"))
      .select(
        col("__win").as("win"),
        date_format(timestamp_micros((col("__win") + 1) * paneUs),
          "yyyy-MM-dd HH:mm:ss").as("win_end"),
        col("__np").cast("int").as("n_present"),
        round(
          when(col("__raw") <= lit(2.5 * m) && col("__zeros") > 0L,
            lit(m.toDouble) * log(lit(m.toDouble) / col("__zeros").cast("double")))
            .otherwise(col("__raw")),
          6).as("estimate"))
  }

  /** DuckDB twin of [[hllSlidingDistinct]]: same pane split, pane→window
    * expansion, register-wise min merge, and estimator arithmetic.
    */
  def hllSlidingDistinctSql(
      table: String,
      tsUsSql: String,
      keyStrSql: String,
      b: Int,
      panes: Int,
      paneUs: Long): String = {
    val m = 1 << b
    val bigW = 32 - b
    val alphaM2 = hllAlphaM2(m)
    s"""WITH h AS (
       |  SELECT ($tsUsSql) // $paneUs AS p, ${PortableHash.hash32Sql(keyStrSql)} AS hv
       |  FROM $table
       |  WHERE ${PortableHash.hash32Sql(keyStrSql)} IS NOT NULL),
       |bk AS (
       |  SELECT p, hv % $m AS b, MIN(hv // $m) AS wmin
       |  FROM h GROUP BY p, hv % $m),
       |mx AS (SELECT MAX(p) AS maxp FROM bk),
       |ex AS (
       |  SELECT unnest(generate_series(p, p + ${panes - 1})) AS win, b, wmin FROM bk),
       |wb AS (
       |  SELECT win, b, MIN(wmin) AS wmin FROM ex
       |  WHERE win <= (SELECT maxp FROM mx) GROUP BY win, b),
       |rg AS (
       |  SELECT win,
       |         CASE WHEN wmin = 0 THEN ${bigW + 1}
       |              ELSE ${bigW + 1} - length(bin(wmin)) END AS rho
       |  FROM wb),
       |ag AS (
       |  SELECT win, COUNT(*) AS np,
       |         SUM(1.0 / CAST(CAST(1 AS BIGINT) << rho AS DOUBLE)) AS sp
       |  FROM rg GROUP BY win)
       |SELECT win,
       |  strftime(make_timestamp((win + 1) * $paneUs), '%Y-%m-%d %H:%M:%S') AS win_end,
       |  CAST(np AS INTEGER) AS n_present,
       |  round(CASE WHEN $alphaM2 / (sp + (CAST($m AS DOUBLE) - CAST(np AS DOUBLE))) <= ${2.5 * m}
       |                  AND $m - np > 0
       |             THEN CAST($m AS DOUBLE) * ln(CAST($m AS DOUBLE) / CAST($m - np AS DOUBLE))
       |             ELSE $alphaM2 / (sp + (CAST($m AS DOUBLE) - CAST(np AS DOUBLE))) END,
       |        6) AS estimate
       |FROM ag
       |ORDER BY win""".stripMargin
  }

  /** DuckDB twin of [[hllDistinct]] for a single group column: same
    * bucket/rank split, same exact harmonic sum, same inlined alpha·m²
    * literal, same linear-counting branch and 6-dp rounding.
    */
  def hllDistinctSql(table: String, groupCol: String, keyStrSql: String, b: Int): String = {
    val m = 1 << b
    val bigW = 32 - b
    val alphaM2 = hllAlphaM2(m)
    s"""WITH h AS (
       |  SELECT $groupCol, ${PortableHash.hash32Sql(keyStrSql)} AS hv
       |  FROM $table
       |  WHERE ${PortableHash.hash32Sql(keyStrSql)} IS NOT NULL),
       |bk AS (
       |  SELECT $groupCol, hv % $m AS b, MIN(hv // $m) AS wmin
       |  FROM h GROUP BY $groupCol, hv % $m),
       |rg AS (
       |  SELECT $groupCol,
       |         CASE WHEN wmin = 0 THEN ${bigW + 1}
       |              ELSE ${bigW + 1} - length(bin(wmin)) END AS rho
       |  FROM bk),
       |ag AS (
       |  SELECT $groupCol, COUNT(*) AS np,
       |         SUM(1.0 / CAST(CAST(1 AS BIGINT) << rho AS DOUBLE)) AS sp
       |  FROM rg GROUP BY $groupCol)
       |SELECT $groupCol,
       |  CAST(np AS INTEGER) AS n_present,
       |  round(CASE WHEN $alphaM2 / (sp + (CAST($m AS DOUBLE) - CAST(np AS DOUBLE))) <= ${2.5 * m}
       |                  AND $m - np > 0
       |             THEN CAST($m AS DOUBLE) * ln(CAST($m AS DOUBLE) / CAST($m - np AS DOUBLE))
       |             ELSE $alphaM2 / (sp + (CAST($m AS DOUBLE) - CAST(np AS DOUBLE))) END,
       |        6) AS estimate
       |FROM ag
       |ORDER BY $groupCol""".stripMargin
  }
}

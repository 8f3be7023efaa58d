package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation metrics over scored corpora — the measurement
  * tier that closes the loop on the model-based filters ([[Classify]],
  * [[TextAnalysis.qualityScore]], langid): a curation pipeline that
  * gates documents on a score needs AUC / calibration / PR evidence
  * that the score separates, and it needs them computed ON the corpus,
  * distributed, not on a driver-side sample.
  *
  * reference: the reference system (cdc_system.py) has no evaluation
  * tier; this extends the classifier family the way a production
  * data-quality loop needs.
  *
  * Scale shape: every metric here first collapses the corpus to ONE row
  * per distinct score value (`groupBy(score)` — map-side combined, so
  * the shuffle is bounded by |distinct scores|, not rows). Scores are
  * rounded to 6 dp by the callers, capping the collapsed frame at ~2M
  * rows per score unit no matter the corpus size. The ROC sweep then
  * runs a single-partition ordered window over THAT frame — the same
  * deliberate bounded-frame-global-window trade [[Sketches]] documents:
  * at 100 TB the corpus never moves, only the distinct-score histogram
  * does.
  */
object Metrics {

  /** Area under the ROC curve by the rank-sum (Mann–Whitney) identity,
    * tie-aware:
    *
    *   AUC = Σ_s  pos(s) · (negBelow(s) + neg(s)/2)  /  (P · N)
    *
    * i.e. the probability a random positive outranks a random negative,
    * ties counted half. `posCol` is a boolean column; `scoreCol` the
    * (already rounded) score. Returns ONE row
    * (n_pos, n_neg, n_scores, auc) — auc is NULL when either class is
    * empty (undefined, and both engines must agree on the encoding).
    */
  def binaryAuc(df: DataFrame, posCol: String, scoreCol: String): DataFrame = {
    val perScore = df.groupBy(col(scoreCol).as("s"))
      .agg(
        sum(when(col(posCol), 1L).otherwise(0L)).as("pos"),
        sum(when(col(posCol), 0L).otherwise(1L)).as("neg"))
    // single-partition ordered window over the |distinct scores| frame —
    // bounded by construction (see object scaladoc), never by corpus rows
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // numerator kept INTEGRAL (doubled to clear the half-tie term):
    // 2·num = Σ pos·(2·negBelow + neg), summed as DECIMAL(38,0) — exact
    // at any corpus size, no float-association drift, one rounding at
    // the final division
    perScore
      .withColumn("neg_below", coalesce(sum(col("neg")).over(w), lit(0L)))
      .agg(
        sum(col("pos")).as("n_pos"),
        sum(col("neg")).as("n_neg"),
        count(lit(1)).as("n_scores"),
        sum((col("pos") * (lit(2L) * col("neg_below") + col("neg")))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("__num2"))
      .select(col("n_pos"), col("n_neg"), col("n_scores"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__num2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6))
          .as("auc"))
  }

  /** Reliability diagram: `nBuckets` fixed-width score buckets over the
    * OBSERVED [min, max] (a 1-row broadcast, not a parameter — the
    * caller shouldn't need to know the score's range), each reporting
    * size, mean score, and empirical positive rate. A calibrated score
    * has mean_score ≈ frac_pos per bucket. The max score lands in the
    * top bucket (least(), not a half-open miss); a constant score
    * degenerates to one bucket 0 row.
    */
  def calibration(df: DataFrame, posCol: String, scoreCol: String,
                  nBuckets: Int): DataFrame = {
    val perScore = df.groupBy(col(scoreCol).as("s"))
      .agg(
        sum(when(col(posCol), 1L).otherwise(0L)).as("pos"),
        count(lit(1)).as("n"))
    val bounds = perScore.agg(min(col("s")).as("lo"), max(col("s")).as("hi"))
    perScore.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        when(col("hi") === col("lo"), lit(0))
          .otherwise(least(
            floor((col("s") - col("lo")) / (col("hi") - col("lo")) * nBuckets),
            lit(nBuckets - 1L))).cast("int"))
      .groupBy(col("bucket"))
      .agg(
        sum(col("n")).as("n"),
        // scores arrive 6-dp-rounded, so the DECIMAL cast is lossless
        // and the weighted sum exact — float association would drift
        // across engines/partitionings at the 6-dp compare boundary
        round(sum(col("s").cast(org.apache.spark.sql.types.DecimalType(28, 10)) *
          col("n")).cast("double") / sum(col("n")).cast("double"), 6)
          .as("mean_score"),
        round(sum(col("pos")).cast("double") / sum(col("n")).cast("double"), 6)
          .as("frac_pos"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic: the max CDF gap between
    * the `inACol = true` and `= false` populations of `scoreCol` — the
    * distribution-drift test behind "is the holdout representative?" /
    * "did this source shift?". Same bounded-histogram shape as
    * [[binaryAuc]]: collapse to one row per distinct score, ONE ordered
    * window for both cumulatives, then an argmax row. CDF gaps are
    * rounded to 10 dp before the max so the argmax row (gap DESC, score
    * ASC) is engine-stable; empty sides yield a NULL statistic. Returns
    * one row (n_a, n_b, ks_stat, at_score).
    */
  def ksTest(df: DataFrame, inACol: String, scoreCol: String): DataFrame = {
    val perScore = df.groupBy(col(scoreCol).as("s"))
      .agg(
        sum(when(col(inACol), 1L).otherwise(0L)).as("ca"),
        sum(when(col(inACol), 0L).otherwise(1L)).as("cb"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perScore
      .withColumn("cum_a", sum(col("ca")).over(w))
      .withColumn("cum_b", sum(col("cb")).over(w))
    val tot = cum.agg(max(col("cum_a")).as("n_a"), max(col("cum_b")).as("n_b"))
    val gaps = cum.crossJoin(broadcast(tot))
      .withColumn("gap",
        // guarded: ANSI division by an empty side's 0 total would throw
        // before the final NULL-out ever sees the row
        when(col("n_a") > 0 && col("n_b") > 0,
          round(abs(col("cum_a").cast("double") / col("n_a") -
            col("cum_b").cast("double") / col("n_b")), 10))
          .otherwise(lit(0.0)))
    val pick = Window.orderBy(col("gap").desc, col("s"))
    gaps.withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0, round(col("gap"), 6))
          .as("ks_stat"),
        when(col("n_a") > 0 && col("n_b") > 0, col("s")).as("at_score"))
  }

  /** Two-sample Mann–Whitney U (Wilcoxon rank-sum): the rank-based
    * "is population A stochastically larger than B?" test — the
    * nonparametric sibling of [[ksTest]] (KS asks "different
    * distribution?", U asks "shifted?"). No global rank is ever
    * assigned: U ≡ #{(a,b): a > b} + ½·#{a = b}, computed from the
    * per-distinct-score histogram and ONE ordered cumulative window
    * over it — the same bounded-cardinality frame as [[binaryAuc]]
    * (6-dp scores in [0,1] cap the axis at ~10⁶ rows no matter how many
    * documents feed it). Doubled-U (`2U = Σ ca·(2·cumB< + cb)`) keeps
    * the arithmetic in exact integers (DECIMAL(38,0) — the ca·cumB
    * product overflows a long once both sides pass ~10⁹ rows); the
    * halving back to U is exact in binary. z carries the tie
    * correction `Σ(t³−t)`; degenerate frames (an empty side, or every
    * value tied so σ = 0) yield NULL z rather than ±∞. Returns one row
    * (n_a, n_b, u_a, p_gt, z): `p_gt = U/(n_a·n_b)` is the
    * common-language effect size P(A > B) + ½P(A = B).
    */
  def mannWhitney(df: DataFrame, inACol: String, scoreCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val perScore = df.groupBy(col(scoreCol).as("s"))
      .agg(
        sum(when(col(inACol), 1L).otherwise(0L)).as("ca"),
        sum(when(col(inACol), 0L).otherwise(1L)).as("cb"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perScore
      .withColumn("cumb_below", sum(col("cb")).over(w) - col("cb"))
    val t = col("ca") + col("cb")
    val agg = cum.agg(
      sum(col("ca")).as("n_a"),
      sum(col("cb")).as("n_b"),
      sum((col("ca") * (lit(2) * col("cumb_below") + col("cb"))).cast(dec))
        .as("u2"),
      sum((t * t * t - t).cast(dec)).as("tie3"))
    val naD = col("n_a").cast("double"); val nbD = col("n_b").cast("double")
    val nD = naD + nbD
    val uA = col("u2").cast("double") / 2.0
    val sigma2 = naD * nbD / 12.0 *
      ((nD + 1.0) - col("tie3").cast("double") / (nD * (nD - 1.0)))
    agg.select(
      col("n_a"), col("n_b"),
      when(col("n_a") > 0 && col("n_b") > 0, uA).as("u_a"),
      when(col("n_a") > 0 && col("n_b") > 0,
        round(uA / (naD * nbD), 6)).as("p_gt"),
      when(col("n_a") > 0 && col("n_b") > 0 && sigma2 > 0.0,
        round((uA - naD * nbD / 2.0) / sqrt(sigma2), 6)).as("z"))
  }

  /** Pearson chi-square test of independence over two categorical
    * columns: `Σ (O − E)² / E` with `E = rowTot·colTot/N`, plus the
    * degrees of freedom — the "is language independent of source?"
    * check before stratifying on either. Everything after the one
    * corpus scan is bounded by the |a|×|b| contingency grid; per-cell
    * terms are a fixed double chain over exact counts, rounded to 8 dp
    * and decimal-summed (partition-order independent). Returns one row
    * (n, n_rows, n_cols, dof, chi2).
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cell = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val rowT = cell.groupBy("a").agg(sum(col("o")).as("ra"))
    val colT = cell.groupBy("b").agg(sum(col("o")).as("cb"))
    val n = cell.agg(sum(col("o")).as("nn"))
    // E in doubles end-to-end: the long product rowTot·colTot overflows
    // at ~1e10-row inputs; the double chain is deterministic either way
    val e = col("ra").cast("double") * col("cb").cast("double") /
      col("nn").cast("double")
    // the FULL |a|×|b| grid, not just observed cells: an absent cell has
    // O = 0 but E > 0 and still contributes E to the statistic —
    // skipping it understates dependence exactly where it's strongest
    rowT.crossJoin(broadcast(colT))
      .join(cell, Seq("a", "b"), "left_outer")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(n))
      .withColumn("term",
        round((col("o") - e) * (col("o") - e) / e, 8)
          .cast(org.apache.spark.sql.types.DecimalType(28, 10)))
      .agg(
        max(col("nn")).as("n"),
        countDistinct(col("a")).as("n_rows"),
        countDistinct(col("b")).as("n_cols"),
        ((countDistinct(col("a")) - 1) * (countDistinct(col("b")) - 1)).as("dof"),
        round(sum(col("term")).cast("double"), 6).as("chi2"))
  }

  /** Precision/recall/F1 at each given threshold (prediction = score ≥
    * t). Thresholds ride in as ONE broadcast literal frame against the
    * per-score histogram, so the whole sweep is |thresholds| ×
    * |distinct scores| on bounded frames — adding thresholds never
    * rescans the corpus. Empty-prediction thresholds report NULL
    * precision/F1 (undefined), recall 0.
    */
  def prAtThresholds(df: DataFrame, posCol: String, scoreCol: String,
                     thresholds: Seq[Double]): DataFrame = {
    val perScore = df.groupBy(col(scoreCol).as("s"))
      .agg(
        sum(when(col(posCol), 1L).otherwise(0L)).as("pos"),
        sum(when(col(posCol), 0L).otherwise(1L)).as("neg"))
    val totals = perScore.agg(sum(col("pos")).as("p_total"))
    val th = thresholds.map(t => lit(t)).toArray
    val thFrame = perScore.sparkSession.range(1).select(
      explode(array(th: _*)).as("threshold"))
    perScore.crossJoin(broadcast(thFrame))
      .groupBy(col("threshold"))
      .agg(
        sum(when(col("s") >= col("threshold"), col("pos")).otherwise(0L)).as("tp"),
        sum(when(col("s") >= col("threshold"), col("neg")).otherwise(0L)).as("fp"))
      .crossJoin(broadcast(totals))
      .select(
        col("threshold"), col("tp"), col("fp"),
        when(col("tp") + col("fp") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fp")).cast("double"), 6))
          .as("precision"),
        when(col("p_total") > 0,
          round(col("tp").cast("double") / col("p_total").cast("double"), 6))
          .otherwise(lit(0.0)).as("recall"),
        // 2tp/(2tp+fp+fn) with fn = p_total − tp; defined exactly when
        // both precision and recall are
        when(col("tp") + col("fp") > 0 && col("p_total") > 0,
          round(lit(2.0) * col("tp").cast("double") /
            (col("tp") + col("fp") + col("p_total")).cast("double"), 6))
          .as("f1"))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ext.{Classify, Search}

/** Properties of the model tier: multinomial NB (train normalization,
  * separable-corpus prediction, degenerate-input contracts) and BM25
  * ranking (hand-computed score, idf ordering), plus the ANN recall
  * metric's bounds on the real fixture.
  */
class ClassifySpec extends SparkSpecBase {

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("nbTrain: per-label probabilities normalize to 1 under Laplace smoothing") {
    val docs = docsDf(Seq(
      (1L, "aa bb aa", "x"), (2L, "bb cc", "x"),
      (3L, "dd ee dd dd", "y"), (4L, "ee", "y")))
    val cond = Classify.nbTrain(docs, "doc_id", "text", "lang")
    val stats = Classify.nbLabelStats(docs, "doc_id", "text", "lang")
    // sum_t P(t|label) over the FULL vocabulary: seen tokens contribute
    // exp(log_cond_raw), the (V - n_seen) unseen ones exp(log_unseen) each
    val v = cond.select(countDistinct(col("token"))).head().getLong(0)
    val seen = cond.groupBy("label")
      .agg(sum(exp(col("log_cond_raw"))).as("p_seen"),
        count(lit(1)).as("n_seen"))
    val total = seen.join(stats.select(col("label"), col("log_unseen")), Seq("label"))
      .select(col("label"),
        (col("p_seen") + (lit(v) - col("n_seen")) * exp(col("log_unseen"))).as("p_tot"))
      .collect()
    assert(total.nonEmpty)
    total.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
      s"label ${r.getString(0)} total probability ${r.getDouble(1)}"))
  }

  test("nbScore: recovers the label on a separable corpus; unseen-token docs fall back sanely") {
    val train = docsDf(Seq(
      (1L, "alpha beta alpha gamma", "x"), (2L, "beta alpha beta", "x"),
      (3L, "delta epsilon zeta", "y"), (4L, "epsilon delta delta", "y")))
    val cond = Classify.nbTrain(train, "doc_id", "text", "lang")
    val stats = Classify.nbLabelStats(train, "doc_id", "text", "lang")
    val preds = Classify.nbScore(train, "doc_id", "text", cond, stats)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds == Map(1L -> "x", 2L -> "x", 3L -> "y", 4L -> "y"))
  }

  test("nbScore: zero-token and null-text docs take the prior argmax (ties break label-asc)") {
    val train = docsDf(Seq(
      (1L, "aa", "x"), (2L, "bb", "x"), (3L, "cc", "y")))
    val cond = Classify.nbTrain(train, "doc_id", "text", "lang")
    val stats = Classify.nbLabelStats(train, "doc_id", "text", "lang")
    val score = docsDf(Seq((10L, "", "x"), (11L, "   ", "y")))
      .withColumn("text", when(col("doc_id") === 11L, lit(null: String)).otherwise(col("text")))
    val preds = Classify.nbScore(score, "doc_id", "text", cond, stats)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // x has 2/3 prior vs y's 1/3 — both degenerate docs predict x
    assert(preds == Map(10L -> "x", 11L -> "x"))
  }

  test("bm25TopK: matches the hand-computed Okapi score and prefers rare terms") {
    // 3 docs; "rare" appears only in doc 1, "common" in all three
    val docs = docsDf(Seq(
      (1L, "rare common common", "x"),
      (2L, "common filler words here", "x"),
      (3L, "common more filler text", "x")))
    val postings = Search.invertedPostings(docs, "doc_id", "text")
    val stats = Search.docStats(postings)
    val out = Search.bm25TopK(postings, stats, Seq("rare", "common"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // hand computation: N=3, avgdl = (3+4+4)/3; idf(rare)=ln((3-1+0.5)/1.5+1),
    // idf(common)=ln((3-3+0.5)/3.5+1); tf-normalized with k1=1.2, b=0.75
    val avgdl = (3.0 + 4.0 + 4.0) / 3.0
    def w(tf: Double, dl: Double, df: Double, n: Double): Double = {
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    }
    val exp1 = BigDecimal(w(1, 3, 1, 3) + w(2, 3, 3, 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(1L) - exp1) < 1e-9, s"doc1 score ${out(1L)} vs $exp1")
    // the rare-term doc dominates the common-only docs
    assert(out(1L) > out(2L) && out(1L) > out(3L))
  }

  test("ann_recall: per-query recall in [0,1] on the real fixture") {
    val sf = "/root/testdata/sf0.001"
    val rec = SparkEntry.queries("ann_recall")(spark, sf).collect()
    assert(rec.length > 0)
    rec.foreach { r =>
      val v = r.getDouble(1)
      assert(v >= 0.0 && v <= 1.0, s"query ${r.getLong(0)} recall $v out of range")
    }
  }
}

package graft

import graft.ext.Corpus
import org.apache.spark.sql.functions._

/** Golden checks for the round-7 batch-2 operators: the duplicated-n-gram
  * memorization audit and the curation-funnel report.
  */
class RoundSevenOpsSpec extends SparkSpecBase {

  private lazy val s = spark
  import s.implicits._

  test("dupNgrams counts every occurrence, not the per-doc-distinct set") {
    val df = Seq(
      (1L, "a b c a b c"),   // "a b c" windows at 1 and 4 → 2 occurrences in one doc
      (2L, "a b c x y"),     // 1 more occurrence
      (3L, "z z"),           // shorter than n → contributes nothing
      (4L, "q r s t u")      // unique grams only
    ).toDF("doc_id", "text")
    val out = Corpus.dupNgrams(df, "doc_id", "text", n = 3, minDocs = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // only "a b c" spans ≥2 docs: 3 total occurrences across docs 1 and 2
    assert(out.toSeq === Seq(("a b c", 3L, 2L)))
  }

  test("dupNgrams: n_docs counts DISTINCT doc ids — a doc split across rows is one doc") {
    val df = Seq(
      (1L, "a b c d"),   // doc 1, part 1
      (1L, "a b c e"),   // doc 1, part 2 — same gram "a b c"
      (2L, "a b c f")
    ).toDF("doc_id", "text")
    val out = Corpus.dupNgrams(df, "doc_id", "text", n = 3, minDocs = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "a b c": 3 occurrences, but only 2 distinct docs (1 and 2)
    assert(out.toSeq === Seq(("a b c", 3L, 2L)))
    // and with minDocs = 3 the duplicate-row doc must NOT push it over
    assert(Corpus.dupNgrams(df, "doc_id", "text", n = 3, minDocs = 3, k = 10)
      .isEmpty)
  }

  test("dupNgrams orders by occurrences desc then gram, and respects k") {
    val df = Seq(
      (1L, "x x x x"),  // "x x" occurs 3 times here
      (2L, "x x"),      // +1 → 4 total, 2 docs
      (3L, "y y"),
      (4L, "y y")       // "y y" 2 total, 2 docs
    ).toDF("doc_id", "text")
    val out = Corpus.dupNgrams(df, "doc_id", "text", n = 2, minDocs = 2, k = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("x x", 4L, 2L)))
  }

  test("curationFunnel stage counts equal the staged pipeline run end-to-end") {
    // 6 train docs: one too short, one exact duplicate pair, one
    // contaminated against the eval doc (shares > maxHit 3-grams)
    val train = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),        // exact dup of 1
      (3L, "tiny"),                          // fails minTokens=3? no — 1 token, fails
      (4L, "contaminated eval text here now"),
      (5L, "something else entirely fresh today"),
      (6L, "yet another unique document body")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "contaminated eval text here now")).toDF("doc_id", "text")
    val out = Corpus.curationFunnel(train, "doc_id", "text", eval,
        minTokens = 3, n = 3, maxHitNgrams = 0L)
      .orderBy("stage_ord")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out(0) === ((1, "raw", 6L, 6L, 0L)))
    assert(out(1) === ((2, "min_tokens", 6L, 5L, 1L)))         // doc 3 dropped
    assert(out(2) === ((3, "decontaminate", 5L, 4L, 1L)))      // doc 4 dropped
    assert(out(3) === ((4, "exact_dedup", 4L, 3L, 1L)))        // doc 2 dropped
    // the funnel's final docs_out equals curate's survivor count
    val kept = Corpus.curate(train, "doc_id", "text", lit("x"), eval,
      minTokens = 3, n = 3, maxHitNgrams = 0L).count()
    assert(out(3)._4 === kept)
  }

  test("funnelLatency measures the anchor-to-anchor durations of funnel's cohort") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 1 converts a→b in 10 s and b→c in 20 s; user 2 reaches b only
    // (120 s); user 3 never starts. b-before-a events must not anchor.
    val ev = Seq(
      (1L, ts(0), "a"), (1L, ts(10), "b"), (1L, ts(30), "c"),
      (2L, ts(100), "b"), (2L, ts(200), "a"), (2L, ts(320), "b"),
      (3L, ts(50), "c")
    ).toDF("user_id", "ts", "event_type")
    val out = graft.ext.EventAnalytics.funnelLatency(ev, "user_id", "ts", "event_type",
        Seq("a", "b", "c"))
      .orderBy("step_idx").collect()
    assert(out.map(_.getString(1)).toSeq === Seq("a→b", "b→c"))
    // a→b: user1 10 s, user2 120 s → n=2, mean 65, min 10, max 120
    assert(out(0).getLong(2) === 2L)
    assert(out(0).getDouble(3) === 65.0)
    assert(out(0).getDouble(4) === 10.0)
    assert(out(0).getDouble(5) === 120.0)
    // b→c: only user1, 20 s
    assert(out(1).getLong(2) === 1L)
    assert(out(1).getDouble(3) === 20.0)
  }

  test("funnelLatency n_users matches funnel's downstream step counts") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      (1L, ts(0), "a"), (1L, ts(1), "b"),
      (2L, ts(0), "a"), (2L, ts(5), "b"),
      (4L, ts(0), "a")
    ).toDF("user_id", "ts", "event_type")
    val lat = graft.ext.EventAnalytics.funnelLatency(ev, "user_id", "ts", "event_type",
      Seq("a", "b")).collect()
    val fun = graft.ext.EventAnalytics.funnel(ev, "user_id", "ts", "event_type",
      Seq("a", "b")).orderBy("step_idx").collect()
    assert(lat(0).getLong(2) === fun(1).getLong(2))
  }

  test("normalizeText canonicalizes punctuation/case/whitespace; fingerprints diverge accordingly") {
    import graft.ext.TextAnalysis
    val df = Seq(
      (1L, "Hello,  World!"),
      (2L, "hello world"),
      (3L, "HELLO -- world"),
      (4L, "hello  worlds")
    ).toDF("doc_id", "text")
    val rows = df.select(col("doc_id"), TextAnalysis.normalizeText(col("text")).as("n"),
        TextAnalysis.normFingerprint(col("text")).as("nfp"),
        TextAnalysis.fingerprint(col("text")).as("rfp"))
      .orderBy("doc_id").collect()
    assert(rows.map(_.getString(1)).toSeq ===
      Seq("hello world", "hello world", "hello world", "hello worlds"))
    // normalized fingerprints: docs 1-3 collapse, raw fingerprints don't
    assert(rows.map(_.getString(2)).distinct.length === 2)
    assert(rows.map(_.getString(3)).distinct.length === 4)
  }

  test("fleschScore: hand-computed value, sentence floor, empty-doc NULL") {
    import graft.ext.TextAnalysis
    val df = Seq(
      (1L, "The cat sat. The dog ran!"),   // 6 words, 2 sentences, 6 vowel runs
      (2L, "no terminal punctuation here"), // sentence floor = 1
      (3L, "")                              // empty → NULL flesch
    ).toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("w"),
        TextAnalysis.sentenceCount(col("text")).as("s"),
        TextAnalysis.syllableCountProxy(col("text")).as("sy"),
        TextAnalysis.fleschScore(col("text")).as("f"))
      .orderBy("doc_id").collect()
    assert(rows(0).getInt(1) === 6 && rows(0).getInt(2) === 2 && rows(0).getInt(3) === 6)
    // 206.835 - 1.015*(6/2) - 84.6*(6/6) = 206.835 - 3.045 - 84.6
    assert(rows(0).getDouble(4) === 119.19)
    assert(rows(1).getInt(2) === 1)
    assert(rows(2).isNullAt(4))
  }

  test("customer distribution keeps zero-order customers") {
    val s2 = s
    val out = SparkEntry.queries("orders_customer_distribution")(s2, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val nCust = s2.read.parquet("/root/testdata/sf0.001/customer.parquet").count()
    assert(out.values.sum === nCust)          // every customer lands in a bucket
    val withOrders = s2.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(out.getOrElse(0L, 0L) === nCust - withOrders) // zero bucket exact
  }

  test("clusterOutliers flags the planted garbage vector, strict-< spares clean clusters") {
    import graft.ext.Similarity
    // cluster at centroid (1,0): three aligned members + one near-orthogonal
    // garbage vector; cluster at (0,1): two aligned members only
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.99, 0.1)), (3L, Seq(0.98, -0.1)),
      (4L, Seq(0.1, 0.99)),   // assigned to (0,1)
      (5L, Seq(0.2, 0.97)),
      (6L, Seq(0.6, 0.55))    // garbage-ish: nearest (1,0) but far off
    ).toDF("vec_id", "embedding")
    val cents = Seq((100L, Seq(1.0, 0.0)), (200L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.clusterOutliers(vecs, "vec_id", "embedding",
        cents, "vec_id", "embedding", sigmas = 1.0)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(6L))
    // single/tight clusters never self-flag at any sigma (strict <)
    val clean = Similarity.clusterOutliers(
      Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", cents, "vec_id", "embedding", sigmas = 0.0)
    assert(clean.count() === 0)
  }

  test("lengthCurves buckets are exact powers of two, short/empty docs in bucket 0") {
    val df = Seq(
      (1L, "a", "s1"),                        // 1 token  → bucket 0
      (2L, "", "s1"),                         // 0 tokens → bucket 0
      (3L, "a b c", "s1"),                    // 3 tokens → bucket 1
      (4L, "a b c d", "s1"),                  // 4 tokens → bucket 2
      (5L, (1 to 17).map(_ => "w").mkString(" "), "s2") // 17 → bucket 4
    ).toDF("doc_id", "text", "source")
    val out = graft.ext.Corpus.lengthCurves(df, "text", "source")
      .collect().map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(out(("s1", 0)) === ((2L, 1L)))   // docs 1+2, tokens 1+0
    assert(out(("s1", 1)) === ((1L, 3L)))
    assert(out(("s1", 2)) === ((1L, 4L)))
    assert(out(("s2", 4)) === ((1L, 17L)))
    assert(out.size === 4)
  }

  test("vocabCoverage: hand-computed curve, cutoffs beyond vocab saturate") {
    val df = Seq(
      (1L, "a a a a b b c"),   // a:4 b:2 c:1 (+ doc 2: a:1, d:1)
      (2L, "a d")
    ).toDF("doc_id", "text")
    val out = graft.ext.Corpus.vocabCoverage(df, "text", Seq(1, 2, 10))
      .orderBy("rank_cutoff")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // freq: a=5, b=2, c=1, d=1; total 9
    assert(out(0) === ((1, 1L, 5L, math.rint(5.0 / 9 * 1e6) / 1e6)))
    assert(out(1) === ((2, 2L, 7L, math.rint(7.0 / 9 * 1e6) / 1e6)))
    assert(out(2)._2 === 4L && out(2)._3 === 9L && out(2)._4 === 1.0)
  }

  test("temperatureWeights flattens shares toward the tail and boosts rare sources") {
    val df = (1 to 90).map(i => (i.toLong, "big")) ++ (91 to 100).map(i => (i.toLong, "small"))
    val out = graft.ext.Corpus.temperatureWeights(
        df.toDF("doc_id", "source"), "source", alpha = 0.5)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val (pBig, qBig, boostBig) = out("big")
    val (pSmall, qSmall, boostSmall) = out("small")
    assert(pBig === 0.9 && pSmall === 0.1)
    // sqrt temperature: q_small/q_big = sqrt(0.1/0.9) > p ratio
    assert(qSmall > pSmall && qBig < pBig)
    assert(boostSmall > 1.0 && boostBig < 1.0)
    assert(math.abs(qBig + qSmall - 1.0) < 1e-5)
  }

  test("covariance: hand-computed 2x2 moments, dirty vectors excluded") {
    import graft.ext.Similarity
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0)),
      (2L, Seq[java.lang.Double](3.0, 4.0)),
      (3L, Seq[java.lang.Double](5.0, null)),      // null element → excluded
      (4L, Seq[java.lang.Double](1.0, 2.0, 3.0))   // wrong length → excluded
    ).toDF("vec_id", "embedding")
    val cov = Similarity.covariance(df, "embedding", dim = 2)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    // two clean rows (1,2),(3,4): var(x)=1, var(y)=1, cov(x,y)=1
    assert(cov((0, 0)) === 1.0 && cov((1, 1)) === 1.0 && cov((0, 1)) === 1.0)
    assert(cov.size === 3)
  }

  test("topComponent converges to the dominant axis of a diagonal covariance") {
    import graft.ext.Similarity
    val cov = Seq((0, 0, 9.0), (0, 1, 0.0), (1, 1, 1.0)).toDF("dim_i", "dim_j", "cov")
    val out = Similarity.topComponent(cov, dim = 2, rounds = 8)
      .orderBy("dim_i").collect()
    val loadings = out.map(_.getDouble(1))
    assert(loadings(0) > 0.999)              // e0 dominates
    assert(math.abs(loadings(1)) < 0.01)
    assert(math.abs(out(0).getDouble(2) - 9.0) < 0.05) // eigenvalue ≈ 9
  }

  test("curationFunnel on an empty corpus yields an all-zero funnel") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val eval = Seq((1L, "whatever eval doc")).toDF("doc_id", "text")
    val out = Corpus.curationFunnel(empty, "doc_id", "text", eval,
        minTokens = 3, n = 3, maxHitNgrams = 0L)
      .orderBy("stage_ord").collect()
    assert(out.length === 4)
    assert(out.forall(r => r.getLong(2) === 0L && r.getLong(3) === 0L && r.getLong(4) === 0L))
  }
}

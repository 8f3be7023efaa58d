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

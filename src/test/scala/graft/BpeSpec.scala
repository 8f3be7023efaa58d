package graft

import graft.ext.Bpe

/** Hand-checkable BPE training/encoding goldens (the classic
  * low/lower example) plus the greedy-overlap invariant.
  */
class BpeSpec extends SparkSpecBase {

  private lazy val s = spark
  import s.implicits._

  test("train learns the classic low/lower merge sequence with lexical tie-breaks") {
    // words: low x2, lower x1. Round 1: (l,o)=3 ties (o,w)=3 — lexical
    // order picks (l,o). Round 3: (e,r)=1 ties (low,e)=1 — picks (e,r).
    val df = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val tr = Bpe.train(df, "text", numMerges = 6)
    assert(tr.merges === Seq(
      (1, "l", "o", 3L),
      (2, "lo", "w", 3L),
      (3, "e", "r", 1L),
      (4, "low", "er", 1L)), "training exhausts after 4 merges (no pairs left)")
    val syms = tr.wordSyms.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(syms === Map("low" -> Seq("low"), "lower" -> Seq("lower")))

    val enc = Bpe.encode(
      Seq((1L, "low low lower"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text", tr)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(enc === Seq((1L, 3L, 3L), (2L, 0L, 0L)))
  }

  test("merge application is greedy left-to-right on overlapping pairs") {
    // "aaa": (a,a) counts 2; applying it yields [aa, a], never [a, aa]
    val tr = Bpe.train(Seq((1L, "aaa")).toDF("doc_id", "text"), "text", 2)
    assert(tr.merges === Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
    assert(tr.wordSyms.collect().map(_.getSeq[String](2)).toSeq === Seq(Seq("aaa")))
  }

  test("trainInMemory is bit-identical to the distributed loop on real corpus text") {
    // the equivalence claim behind switching the registered queries to
    // the fast path: same merges (rank, pair, freq) AND same final
    // word → symbols table, on a real documents slice deep enough to
    // exercise multi-round pair creation (merged symbols re-merging)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val slow = Bpe.train(docs, "text", numMerges = 12)
    val fast = Bpe.trainInMemory(docs, "text", numMerges = 12)
    assert(fast.merges === slow.merges)
    val slowSyms = slow.wordSyms.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    val fastSyms = fast.wordSyms.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(fastSyms === slowSyms)
  }

  test("trainInMemory goldens, overlap semantics, and the maxWords cap contract") {
    val tr = Bpe.trainInMemory(Seq((1L, "low low lower")).toDF("doc_id", "text"), "text", 6)
    assert(tr.merges === Seq(
      (1, "l", "o", 3L), (2, "lo", "w", 3L), (3, "e", "r", 1L), (4, "low", "er", 1L)))
    val aaa = Bpe.trainInMemory(Seq((1L, "aaa")).toDF("doc_id", "text"), "text", 2)
    assert(aaa.merges === Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
    assert(aaa.wordSyms.collect().map(_.getSeq[String](2)).toSeq === Seq(Seq("aaa")))
    // cap keeps the top words by (freq DESC, word): "zz x1" drops under
    // maxWords=1 and its pairs never count
    val capped = Bpe.trainInMemory(
      Seq((1L, "low low zz")).toDF("doc_id", "text"), "text", 6, maxWords = Some(1))
    assert(capped.merges.map(m => (m._2, m._3)) === Seq("l" -> "o", "lo" -> "w"))
  }
}

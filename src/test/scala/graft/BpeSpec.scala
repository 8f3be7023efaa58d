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
}

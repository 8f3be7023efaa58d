package graft

import graft.ext.{Corpus, Dedup}
import org.apache.spark.sql.functions._

/** Golden checks for the round-9 batch-2 operators: the positional-gram
  * kernel, the repeated-substring span audit, and the packing-boundary
  * audit.
  */
class RoundNineOpsSpec extends SparkSpecBase {

  private lazy val s = spark
  import s.implicits._

  test("PosGrams kernel: ordered grams bit-identical to the columnar chain") {
    val rnd = new scala.util.Random(41)
    val words = Vector("alpha", "beta", "Gamma", "DELTA", "e", "ff", "第",
      "x1", "2y", "a-b")
    val edge = Seq("", " ", "  one  ", "one two", "a\tb\nc", "one one one one")
    val texts = edge ++ Seq.tabulate(100) { _ =>
      Seq.fill(1 + rnd.nextInt(30))(words(rnd.nextInt(words.size))).mkString(" ")
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(1, 3, 5)) {
      val tk = graft.ext.TextAnalysis.tokens(lower(col("text")))
      // ordered, with multiplicity, no short fallback — position matters
      val ref = df.select(col("id"),
          posexplode(when(size(tk) < n, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(0), size(tk) - n),
              i => concat_ws(" ", slice(tk, i + 1, lit(n)))))).as(Seq("pos", "g")))
      val fast = df.select(col("id"),
        posexplode(Dedup.posGrams(col("text"), n)).as(Seq("pos", "g")))
      assert(fast.exceptAll(ref).count() === 0 &&
        ref.exceptAll(fast).count() === 0,
        s"PosGrams positional mismatch at n=$n")
    }
  }

  test("dupSpans finds cross-doc 5-gram windows and merges consecutive runs") {
    val df = Seq(
      (1L, "a b c d e f g"),             // shares "a b c d e" with doc 2
      (2L, "x x a b c d e y z"),
      (3L, "hello world"),               // < 5 tokens: no windows, absent
      (4L, "p q r s t u v w 1"),         // 8-token shared prefix with doc 5
      (5L, "p q r s t u v w 2")
    ).toDF("doc_id", "text")
    val out = Corpus.dupSpans(df, "doc_id", "text", n = 5, k = 10)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 5L))
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1: 3 windows, 1 duplicated, 1 run, span = 1 + 4 tokens
    assert(byId(1L) === ((3L, 1L, 1L, 5L)))
    // doc 2: 5 windows, 1 duplicated
    assert(byId(2L) === ((5L, 1L, 1L, 5L)))
    // docs 4/5: 4 consecutive duplicated windows = one 8-token substring
    assert(byId(4L) === ((5L, 4L, 1L, 8L)))
    assert(byId(5L) === ((5L, 4L, 1L, 8L)))
    // dup_frac is the 6-dp ratio
    val fracs = Corpus.dupSpans(df, "doc_id", "text", n = 5, k = 10)
      .orderBy("doc_id").select("dup_frac").collect().map(_.getDouble(0))
    assert(fracs.toSeq === Seq(0.333333, 0.2, 0.8, 0.8))
  }

  test("dupSpans: a within-doc repeat alone is NOT a cross-doc duplicate") {
    // "m n o p q" occurs twice in doc 1 but in no other doc — dense_rank
    // over doc_id must count DISTINCT docs, not occurrences
    val df = Seq(
      (1L, "m n o p q m n o p q"),
      (2L, "something entirely different here okay")
    ).toDF("doc_id", "text")
    assert(Corpus.dupSpans(df, "doc_id", "text", n = 5, k = 10).count() === 0)
  }

  test("packStats counts boundary-straddling docs per (stratum, ctx)") {
    val df = Seq(
      (1L, "en", "t1 t2 t3"),        // span [0,2]  — inside seq 0 at ctx 4
      (2L, "en", "t1 t2 t3 t4"),     // span [3,6]  — straddles 4
      (3L, "en", "t1 t2"),           // span [7,8]  — straddles 8
      (4L, "fr", ""),                // zero tokens: excluded
      (5L, "fr", "u1 u2")            // span [0,1]  — inside
    ).toDF("doc_id", "lang", "text")
    val out = Corpus.packStats(df, "doc_id", "text", ctxs = Seq(4), col("lang"))
      .collect().map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getLong(2) === 3L)                      // n_docs
    assert(en.getLong(3) === 9L)                      // total_tokens
    assert(en.getLong(4) === 3L)                      // n_seqs = ceil(9/4)
    assert(en.getLong(5) === 2L)                      // n_cross_docs
    assert(en.getDouble(6) === 0.666667)              // cross_doc_frac
    assert(en.getDouble(7) === 0.666667)              // cross_token_frac = 6/9
    val fr = out("fr")
    assert(fr.getLong(2) === 1L && fr.getLong(5) === 0L)
    assert(fr.getDouble(6) === 0.0)
  }
}

package graft

import graft.ext.{Corpus, Search}
import org.apache.spark.sql.functions._

/** Hand-checkable cases for the round-7 curation/retrieval operators:
  * per-source cap, line-level dedup, RRF hybrid fusion.
  */
class CurationSpec extends SparkSpecBase {

  private lazy val s = spark
  import s.implicits._

  // ------------------------------------------------------------ sourceCap

  test("sourceCap: at most cap per source; two-phase equals single-window reference") {
    val docs = (1L to 40L).map(i => (i, if (i <= 30) "big" else "small"))
      .toDF("doc_id", "source")
    val got = Corpus.sourceCap(docs, "doc_id", "source", cap = 5, salt = "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = got.groupBy(_._2)
    assert(bySrc("big").length == 5 && bySrc("small").length == 5)
    assert(got.forall(_._3 <= 5))
    // preBuckets=1 degenerates to the single-window formulation; the
    // two-phase default must select the identical rows and ranks
    val ref = Corpus.sourceCap(docs, "doc_id", "source", cap = 5, salt = "t",
        preBuckets = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got.toSet == ref)
  }

  test("sourceCap index: append equals rebuild; param mismatch fails fast") {
    val all = (1L to 60L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val base = all.filter($"doc_id" % 4 =!= 0)
    val batch = all.filter($"doc_id" % 4 === 0)
    val path = java.nio.file.Files.createTempDirectory("srccap").toString
    Corpus.writeSourceCapIndex(base, "doc_id", "source", cap = 7, salt = "x", path = path)
    Corpus.appendToSourceCapIndex(batch, "doc_id", "source", cap = 7, salt = "x", path = path)
    val served = Corpus.serveSourceCapIndex(spark, path, "doc_id", "source")
    val rebuilt = Corpus.sourceCap(all, "doc_id", "source", cap = 7, salt = "x")
    assertSameRows(served, rebuilt, "append-vs-rebuild")
    // a different salt or cap would silently serve a set no single-shot
    // cap produces — the params guard must reject it
    val e = intercept[IllegalArgumentException] {
      Corpus.appendToSourceCapIndex(batch, "doc_id", "source", cap = 9, salt = "x", path = path)
    }
    assert(e.getMessage.contains("cap"), e.getMessage)
  }

  test("sourceCap index: append ≡ rebuild under random split/batch orders (property)") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    import org.scalacheck.Prop.propBoolean
    val genCase = for {
      nDocs <- Gen.choose(10, 50)
      nSrc <- Gen.choose(1, 5)
      cap <- Gen.choose(1, 6)
      nBatches <- Gen.choose(1, 3)
      cut <- Gen.listOfN(nDocs, Gen.choose(0, nBatches)) // 0 = base
    } yield (nDocs, nSrc, cap, nBatches, cut)
    val prop = Prop.forAll(genCase) { case (nDocs, nSrc, cap, nBatches, cut) =>
      val all = (1 to nDocs).map(i => (i.toLong, s"s${i % nSrc}")).toDF("doc_id", "source")
      val path = java.nio.file.Files.createTempDirectory("srccap_prop").toString
      val parts = (1 to nDocs).map(i => cut(i - 1))
      def slice(b: Int) = {
        val ids = (1 to nDocs).filter(i => parts(i - 1) == b).map(_.toLong)
        all.filter(col("doc_id").isin(ids.map(java.lang.Long.valueOf): _*))
      }
      Corpus.writeSourceCapIndex(slice(0), "doc_id", "source", cap, "p", path)
      (1 to nBatches).foreach { b =>
        val batch = slice(b)
        if (batch.head(1).nonEmpty)
          Corpus.appendToSourceCapIndex(batch, "doc_id", "source", cap, "p", path)
      }
      val served = Corpus.serveSourceCapIndex(spark, path, "doc_id", "source")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val rebuilt = Corpus.sourceCap(all, "doc_id", "source", cap, "p")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      (served == rebuilt) :| s"served=$served rebuilt=$rebuilt"
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("sourceCap index: an EMPTY initial build is valid state appends grow from") {
    // an empty base writes ZERO part-files under kept/ — the index must
    // still read (schema rides in params, never inferred) and appends
    // must grow it to the single-shot cap
    val all = (1L to 20L).map(i => (i, s"s${i % 2}")).toDF("doc_id", "source")
    val path = java.nio.file.Files.createTempDirectory("srccap_empty").toString
    Corpus.writeSourceCapIndex(all.limit(0), "doc_id", "source",
      cap = 3, salt = "e", path = path)
    assert(Corpus.serveSourceCapIndex(spark, path, "doc_id", "source").isEmpty)
    Corpus.appendToSourceCapIndex(all, "doc_id", "source",
      cap = 3, salt = "e", path = path)
    assertSameRows(
      Corpus.serveSourceCapIndex(spark, path, "doc_id", "source"),
      Corpus.sourceCap(all, "doc_id", "source", cap = 3, salt = "e"),
      "empty-base append-vs-rebuild")
  }

  test("streaming micro-batches maintain the source-cap index (foreachBatch)") {
    // the curation analog of the streaming dedup-index test: each
    // micro-batch folds into the persisted cap index; after the drain
    // the served set equals the single-shot cap over everything landed
    val s2 = spark
    import s2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("srccap_stream").toString
    val all = (1L to 40L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    Corpus.writeSourceCapIndex(all.filter($"doc_id" <= 10), "doc_id", "source",
      cap = 4, salt = "st", path = s"$tmp/idx")
    all.filter($"doc_id" > 10).coalesce(1)
      .write.mode("append").parquet(s"$tmp/src")
    val q = s2.readStream.schema(all.schema).parquet(s"$tmp/src")
      .writeStream.option("checkpointLocation", s"$tmp/chk")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        Corpus.appendToSourceCapIndex(b, "doc_id", "source",
          cap = 4, salt = "st", path = s"$tmp/idx")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assertSameRows(
      Corpus.serveSourceCapIndex(spark, s"$tmp/idx", "doc_id", "source"),
      Corpus.sourceCap(all, "doc_id", "source", cap = 4, salt = "st"),
      "streamed-vs-rebuild")
  }

  // ------------------------------------------------------------ lineDedup

  test("lineDedup: boilerplate over maxDocs removed everywhere, short lines exempt, null text -> null md5") {
    val boiler = "COOKIE BANNER TEXT"
    val docs = Seq(
      (1L, s"unique one line\n$boiler\nx"),
      (2L, s"$boiler\nanother unique line"),
      (3L, s"third unique line\n$boiler"),
      (4L, "standalone document"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    // boiler appears in 3 > maxDocs=2 docs -> dropped from all three;
    // "x" is short (<10 chars) -> exempt even though unique
    val got = Corpus.lineDedup(docs, "doc_id", "text", maxDocs = 2, minLineLen = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.getString(3)))).toMap
    def m(t: String) = Option(
      java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(got(1L) == ((3L, 2L, m("unique one line\nx"))))
    assert(got(2L) == ((2L, 1L, m("another unique line"))))
    assert(got(3L) == ((2L, 1L, m("third unique line"))))
    assert(got(4L) == ((1L, 1L, m("standalone document"))))
    assert(got(5L) == ((0L, 0L, None)))
  }

  test("lineDedup: line recurring within ONE doc does not count as boilerplate") {
    val rep = "repeated inside one document"
    val docs = Seq((1L, s"$rep\n$rep\n$rep"), (2L, "some other text entirely"))
      .toDF("doc_id", "text")
    val got = Corpus.lineDedup(docs, "doc_id", "text", maxDocs = 2, minLineLen = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 1 distinct doc <= maxDocs -> kept (within-doc repetition is
    // text_repetition's business, not cross-corpus boilerplate's)
    assert(got(1L) == ((3L, 3L)))
  }

  // ------------------------------------------------------------ lshRecall

  test("lshRecall: exact copies land in the top decile fully caught; disjoint docs produce no pairs") {
    val dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, dup), (2L, dup), (3L, dup),                     // 3 exact copies -> 3 pairs jac 1.0
      (4L, "totally different words entirely here now"),
      (5L, "another unrelated document with fresh tokens")
    ).toDF("doc_id", "text")
    val got = graft.ext.Dedup.lshRecall(docs, "text", "doc_id",
        sampleSize = 5, salt = "t", minJaccard = 0.5)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // jac=1.0 -> floor(10)/10 = 1.0 bucket; identical shingle sets MUST
    // collide in every band, so recall is exactly 1
    assert(got.toSeq == Seq((1.0, 3L, 3L, 1.0)), s"got ${got.toSeq}")
  }

  // ------------------------------------------------------------- keySkew

  test("keySkew: hand-computed stats and top keys on a skewed frame") {
    // key a: 6 rows, b: 2, c: 1, d: 1 -> n_rows 10, n_keys 4, mean 2.5
    // counts sorted: [1, 1, 2, 6]; p50 = ceil(.5*4)=2nd -> 1,
    // p90 = ceil(3.6)=4th -> 6, p99 -> 6, max 6, skew 6/2.5 = 2.4
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val got = graft.ext.Profiler.keySkew(df, "k", topK = 2)
      .collect().map(r => (r.getString(0), Option(r.getString(1)), r.getDouble(2))).toSet
    assert(got == Set(
      ("n_rows", None, 10.0), ("n_keys", None, 4.0), ("mean", None, 2.5),
      ("p50", None, 1.0), ("p90", None, 6.0), ("p99", None, 6.0),
      ("max", None, 6.0), ("skew", None, 2.4),
      ("top", Some("a"), 6.0), ("top", Some("b"), 2.0)),
      s"got $got")
  }

  // --------------------------------------------------------- tokenEntropy

  test("tokenEntropy: uniform tokens hit ln(k), repeated single token hits 0, empty is NULL") {
    val docs = Seq(
      (1L, "a b c d"),        // 4 distinct uniform -> ln(4)
      (2L, "x x x x x"),      // single token -> 0
      (3L, ""),               // no tokens -> NULL entropy
      (4L, "a a b b")         // 2×2 uniform -> ln(2)
    ).toDF("doc_id", "text")
    val got = graft.ext.TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), Option(r.get(2)))).toMap
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((4L, Some(rnd(math.log(4))))), s"got ${got(1L)}")
    assert(got(2L) == ((5L, Some(0.0))))
    assert(got(3L) == ((0L, None)))
    assert(got(4L) == ((4L, Some(rnd(math.log(2))))))
  }

  // --------------------------------------------------------------- whiten

  test("whiten: hand-computed standardization; zero-variance dim -> 0; null vector stays null") {
    // dim0: values 1, 3 -> mean 2, std 1; dim1: constant 5 -> std 0
    val df = Seq(
      (1L, Seq(1.0f, 5.0f)), (2L, Seq(3.0f, 5.0f))
    ).toDF("vec_id", "embedding")
      .unionByName(Seq((3L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    val got = graft.ext.Similarity.whiten(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Double](1))).toMap
    assert(got(1L).get == Seq(-1.0, 0.0), s"got ${got(1L)}")
    assert(got(2L).get == Seq(1.0, 0.0))
    assert(got(3L).isEmpty)
  }

  // -------------------------------------------------------------- rrfFuse

  test("rrfFuse: hand-computed reciprocal-rank fusion with partial overlap") {
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val vec = Seq((20L, 1L), (40L, 2L)).toDF("id", "rank")
    val got = Search.rrfFuse(lex, vec, "id", "rank", k = 10, rrfK = 60)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getDouble(3), r.getLong(4)))
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Seq(
      (20L, true, true, rnd(1.0 / 62 + 1.0 / 61), 1L),   // both runs
      (10L, true, false, rnd(1.0 / 61), 2L),              // lexical only
      (40L, false, true, rnd(1.0 / 62), 3L),              // vector only
      (30L, true, false, rnd(1.0 / 63), 4L))
    assert(got.toSeq == want, s"got ${got.toSeq}")
  }
}

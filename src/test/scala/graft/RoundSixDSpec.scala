package graft

import graft.apply.IncrementalAgg
import graft.capture.ChangeCapture
import graft.ext.{Similarity, TextAnalysis}
import graft.log.ChangeLog
import graft.model.CdcTableSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch-5 operators: cluster-scoped k-NN graph, Gopher-style
  * quality filter, and MIN/MAX dirty-group view maintenance.
  */
class RoundSixDSpec extends SparkSpecBase {

  private lazy val s = spark
  import s.implicits._

  // ------------------------------------------------------------- knnGraph

  private val cents: Seq[(Long, Seq[Double])] =
    Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))

  private def vecs = Seq(
    (1L, Seq(1.0, 0.0)),
    (2L, Seq(0.9, 0.1)),
    (3L, Seq(0.8, 0.05)),
    (4L, Seq(0.0, 1.0)),
    (5L, Seq(0.1, 0.9))
  ).toDF("vid", "v")

  test("knnGraph: neighbors stay in-cluster, <=k per source, ranked by score") {
    val g = Similarity.knnGraph(vecs, "vid", "v", cents, k = 2)
    val rows = g.collect()
    // ids 1-3 land in cluster 0, ids 4-5 in cluster 1: no cross edges
    val cluster = Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1)
    rows.foreach { r =>
      assert(cluster(r.getLong(0)) == cluster(r.getLong(1)),
        s"cross-cluster edge: $r")
    }
    // per-source cap and rank contiguity; cluster-1 sources have 1 mate
    val bySrc = rows.groupBy(_.getLong(0))
    assert(bySrc(1L).length == 2 && bySrc(4L).length == 1 && bySrc(5L).length == 1)
    bySrc.values.foreach { rs =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length))
      val byRank = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("knnGraph: equals windowed brute force within each cluster") {
    val g = Similarity.knnGraph(vecs, "vid", "v", cents, k = 2)
    // independent formulation: assign, self-join, window row_number
    val ids = Similarity.ivfAssign(vecs.select(col("vid").as("id"), col("v")), cents, "v")
      .select(col("id"), col("centroid_id"))
    val ref = ids.select(col("id").as("src_id"), col("centroid_id"))
      .join(ids.select(col("id").as("neighbor_id"), col("centroid_id")), Seq("centroid_id"))
      .filter(col("src_id") =!= col("neighbor_id"))
      .join(vecs.select(col("vid").as("src_id"), col("v").as("va")), Seq("src_id"))
      .join(vecs.select(col("vid").as("neighbor_id"), col("v").as("vb")), Seq("neighbor_id"))
      .select(col("src_id"), col("neighbor_id"),
        round(Similarity.cosine(col("va"), col("vb")), 6).as("score"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("src_id").orderBy(col("score").desc, col("neighbor_id"))).cast("int"))
      .filter(col("rnk") <= 2)
    assertSameRows(g, ref, "knnGraph vs windowed brute force")
  }

  // -------------------------------------------------------- qualityFilter

  test("qualityFilter: hand-computed metrics and empty-doc contract") {
    val docs = Seq(
      // 5 words, lengths 3+4+3+4+4=18 -> mean 3.6, stop hits: 'the' x2 (lowercased)
      (1L, "the cats THE dogs runs"),
      // empty -> n_words 0, NULL mean, fails everything
      (2L, "   "),
      // 4 words, no stopwords, lengths 4*4=16 -> mean 4.0
      (3L, "aaaa bbbb cccc dddd")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFilter(docs, "doc_id", "text",
      minWords = 2, maxWords = 4, minMeanWordLen = 3.0, maxMeanWordLen = 5.0,
      minStopHits = 1, stopwords = TextAnalysis.EnglishStopwords)
    val m = out.collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 5 words (fails [2,4]), mean 3.6, 2 stop hits (lowercased match)
    assert(m(1L).getLong(1) == 5L && m(1L).getDouble(2) == 3.6 && m(1L).getLong(3) == 2L)
    assert(!m(1L).getBoolean(4) && m(1L).getBoolean(5) && m(1L).getBoolean(6) && !m(1L).getBoolean(7))
    // doc 2: empty contract — 0 words, NULL mean coalesces to fail, keep false
    assert(m(2L).getLong(1) == 0L && m(2L).isNullAt(2) && m(2L).getLong(3) == 0L)
    assert(!m(2L).getBoolean(4) && !m(2L).getBoolean(5) && !m(2L).getBoolean(7))
    // doc 3: passes words+len, fails stopwords
    assert(m(3L).getLong(1) == 4L && m(3L).getDouble(2) == 4.0 && m(3L).getLong(3) == 0L)
    assert(m(3L).getBoolean(4) && m(3L).getBoolean(5) && !m(3L).getBoolean(6) && !m(3L).getBoolean(7))
  }

  // ---------------------------------------------------- perplexityBuckets

  test("perplexityBuckets: thirds per lang, score-ordered, empty doc gets NULL bucket") {
    // 6 scorable docs in lang en (repeated words -> distinct lm scores),
    // 1 empty doc, 3 in lang fr
    val docs = Seq(
      (1L, "en", "x x x x x x"), (2L, "en", "x x x y"), (3L, "en", "x y z"),
      (4L, "en", "y z w"), (5L, "en", "w w y"), (6L, "en", "z w q"),
      (7L, "en", "   "),
      (8L, "fr", "a a b"), (9L, "fr", "a b c"), (10L, "fr", "b c c")
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.perplexityBuckets(docs, "doc_id", "text", "lang")
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)),
      Option(r.getString(4)))).toSeq
    // empty doc: NULL score -> NULL bucket
    assert(rows.find(_._1 == 7L).get._3.isEmpty &&
      rows.find(_._1 == 7L).get._4.isEmpty)
    // en: 6 scored docs -> 2/2/2; fr: 3 -> 1/1/1
    val en = rows.filter(r => r._2 == "en" && r._4.nonEmpty)
    val fr = rows.filter(r => r._2 == "fr" && r._4.nonEmpty)
    assert(en.groupBy(_._4.get).view.mapValues(_.size).toMap ==
      Map("head" -> 2, "middle" -> 2, "tail" -> 2))
    assert(fr.groupBy(_._4.get).view.mapValues(_.size).toMap ==
      Map("head" -> 1, "middle" -> 1, "tail" -> 1))
    // tier ordering: min(head) >= max(middle) >= ... within each lang
    for (grp <- Seq(en, fr)) {
      def scores(b: String) = grp.filter(_._4.contains(b)).map(_._3.get)
      assert(scores("head").min >= scores("middle").max)
      assert(scores("middle").min >= scores("tail").max)
    }
  }

  // --------------------------------------------------------------- dimStats

  test("dimStats: hand-computed moments; null vector and null element excluded") {
    val vs = Seq(
      (1L, Some(Seq(Some(1.0), Some(4.0)))),
      (2L, Some(Seq(Some(3.0), None))),
      (3L, Option.empty[Seq[Option[Double]]])
    ).toDF("id", "v")
    val out = Similarity.dimStats(vs, "v").orderBy("dim_i").collect()
    assert(out.length == 2)
    // dim 0: {1, 3} -> mean 2, var ((1+9)/2 - 4)=1 -> std 1
    assert(out(0).getInt(0) == 0 && out(0).getLong(1) == 2L &&
      out(0).getDouble(2) == 2.0 && out(0).getDouble(3) == 1.0 &&
      out(0).getDouble(4) == 1.0 && out(0).getDouble(5) == 3.0)
    // dim 1: {4} alone (null element dropped) -> mean 4, std 0
    assert(out(1).getInt(0) == 1 && out(1).getLong(1) == 1L &&
      out(1).getDouble(2) == 4.0 && out(1).getDouble(3) == 0.0)
  }

  // ------------------------------------------------------- maintainMinMax

  private val mSpec = CdcTableSpec("mt", Seq("id", "g", "v"), "id")

  private def mkLog(before: DataFrame, after: DataFrame): DataFrame =
    ChangeLog.assignCdcIds(
      ChangeCapture.finishLogSchema(
        ChangeCapture.captureChanges(before, after, mSpec)), global = true)

  test("maintainMinMax: delete-of-max, group-moving update, untouched carry") {
    val before = Seq(
      (1L, "a", 10.0), (2L, "a", 5.0), (3L, "b", 7.0), (4L, "d", 2.0)
    ).toDF("id", "g", "v")
    // delete the max of 'a'; move 3 from b->a with a new max; insert into c;
    // 'd' untouched — must carry from the stored view, not recompute
    val after = Seq(
      (2L, "a", 5.0), (3L, "a", 20.0), (5L, "c", 1.0), (4L, "d", 2.0)
    ).toDF("id", "g", "v")
    val log = mkLog(before, after)
    val stored = IncrementalAgg.snapshotMinMax(before, "g", "v")
    val maintained = IncrementalAgg.maintainMinMax(stored, log, after, "g", "v")
    assertSameRows(maintained, IncrementalAgg.snapshotMinMax(after, "g", "v"),
      "maintainMinMax vs recompute")
    // group b must be GONE (its only row moved out), not min=max=stale
    assert(maintained.filter(col("g_key") === "b").isEmpty)
  }

  test("maintainMinMax: batch with only inserts does not dirty the null-key group") {
    val before = Seq((1L, Option.empty[String], 9.0), (2L, Some("a"), 1.0))
      .toDF("id", "g", "v")
    val after = Seq((1L, Option.empty[String], 9.0), (2L, Some("a"), 1.0),
      (3L, Some("a"), 4.0)).toDF("id", "g", "v")
    val log = mkLog(before, after)
    val stored = IncrementalAgg.snapshotMinMax(before, "g", "v")
    // deliberately WRONG base for the null group: if the insert batch
    // (whose absent old images surface NULL keys) spuriously dirtied the
    // null group, the recompute would "fix" it and this assert would fail
    val poisonedBase = after.withColumn("v",
      when(col("g").isNull, lit(123.0)).otherwise(col("v")))
    val maintained = IncrementalAgg.maintainMinMax(stored, log, poisonedBase, "g", "v")
    val nullRow = maintained.filter(col("g_key").isNull).collect()
    assert(nullRow.length == 1 &&
      nullRow.head.getDecimal(1).doubleValue == 9.0 &&
      nullRow.head.getDecimal(2).doubleValue == 9.0,
      "null-key group was recomputed by an insert-only batch")
    // while a batch TOUCHING the null key does dirty exactly it
    val after2 = Seq((1L, Option.empty[String], 3.0), (2L, Some("a"), 1.0),
      (3L, Some("a"), 4.0)).toDF("id", "g", "v")
    val log2 = mkLog(after, after2)
    val m2 = IncrementalAgg.maintainMinMax(
      IncrementalAgg.snapshotMinMax(after, "g", "v"), log2, after2, "g", "v")
    assertSameRows(m2, IncrementalAgg.snapshotMinMax(after2, "g", "v"),
      "null-key update vs recompute")
  }
}

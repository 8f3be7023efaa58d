package graft

import graft.ext.{Dedup, EventAnalytics, Metrics}
import java.sql.Timestamp

/** Hand-computed fixtures for the rank/robust statistics family
  * (Mann–Whitney U, median/MAD anomalies) and the weighted-cosine
  * near-dup pairs — the properties the DuckDB oracle can't pin down
  * alone (NULL guards, tie handling, multiplicity-vs-set semantics).
  */
class RobustStatsSpec extends SparkSpecBase {

  private lazy val s = spark
  import s.implicits._

  // ---- mannWhitney ----

  test("mannWhitney: hand-computed U with one tie") {
    // A = {3,5,7}, B = {1,5,6}: U_A = #{a>b} + 0.5·#{a=b} = 5 + 0.5
    val df = Seq((true, 3.0), (true, 5.0), (true, 7.0),
      (false, 1.0), (false, 5.0), (false, 6.0)).toDF("a", "sc")
    val r = Metrics.mannWhitney(df, "a", "sc").collect()(0)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("u_a") == 5.5)
    assert(r.getAs[Double]("p_gt") == math.rint(5.5 / 9.0 * 1e6) / 1e6)
    // σ² = (9/12)·((6+1) − 6/(6·5)) = 5.1; z = (5.5−4.5)/√5.1
    val expZ = math.rint(1.0 / math.sqrt(5.1) * 1e6) / 1e6
    assert(r.getAs[Double]("z") == expZ)
  }

  test("mannWhitney: empty side yields NULL u/z; all-tied yields NULL z") {
    val oneSided = Seq((true, 1.0), (true, 2.0)).toDF("a", "sc")
    val r1 = Metrics.mannWhitney(oneSided, "a", "sc").collect()(0)
    assert(r1.isNullAt(r1.fieldIndex("u_a")) && r1.isNullAt(r1.fieldIndex("z")))
    // every value identical → σ = 0 → z NULL, but U is still defined
    val tied = Seq((true, 4.0), (true, 4.0), (false, 4.0)).toDF("a", "sc")
    val r2 = Metrics.mannWhitney(tied, "a", "sc").collect()(0)
    assert(r2.getAs[Double]("u_a") == 1.0) // 0.5 · (2·1 ties)
    assert(r2.isNullAt(r2.fieldIndex("z")))
  }

  test("mannWhitney: clean separation gives U = n_a·n_b and p_gt = 1") {
    val df = Seq((true, 10.0), (true, 11.0), (false, 1.0), (false, 2.0))
      .toDF("a", "sc")
    val r = Metrics.mannWhitney(df, "a", "sc").collect()(0)
    assert(r.getAs[Double]("u_a") == 4.0)
    assert(r.getAs[Double]("p_gt") == 1.0)
  }

  // ---- anomalyMadDaily ----

  private def ev(id: Long, day: Int, n: Int, tpe: String) =
    (0 until n).map(i =>
      (id + i, Timestamp.valueOf(f"2024-02-$day%02d 12:00:00"), tpe))

  test("anomalyMadDaily: spike day flagged, MAD=0 type suppressed") {
    // type "hot": daily counts 8,9,10,11,12,100 → med 10.5, MAD 1.5,
    // score(100) = 89.5/(1.4826·1.5) ≈ 40.2 → flagged; no other day is
    val hot = Seq(8, 9, 10, 11, 12, 100).zipWithIndex.flatMap {
      case (n, d) => ev(1000L * d, d + 1, n, "hot")
    }
    // type "flat": counts 10,10,10,10,1000 → MAD 0 → NULL score, never
    // flagged even though the mean/σ detector would scream here
    val flat = Seq(10, 10, 10, 10, 1000).zipWithIndex.flatMap {
      case (n, d) => ev(100000L + 1000L * d, d + 1, n, "flat")
    }
    val df = (hot ++ flat).toDF("event_id", "ts", "event_type")
    val out = EventAnalytics.anomalyMadDaily(df, "event_type", "ts", 2.5).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("event_type") == "hot")
    assert(r.getAs[String]("day") == "2024-02-06")
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Double]("med") == 10.5 && r.getAs[Double]("mad") == 1.5)
    val expScore = math.rint(89.5 / (1.4826 * 1.5) * 1e6) / 1e6
    assert(r.getAs[Double]("score") == expScore)
  }

  // ---- survivalCurve ----

  test("survivalCurve: textbook KM with censoring between event days") {
    def ts(m: String) = Timestamp.valueOf(m)
    // u1 converts day 1; u2 censored day 2; u3, u4 convert day 3;
    // u5 censored day 5 → S(1) = 4/5, S(3) = 0.8·(1 − 2/3) ≈ 0.266667
    val rows = Seq(
      (1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, "purchase", ts("2024-01-02 10:00:00")),
      (2L, "signup", ts("2024-01-01 10:00:00")),
      (2L, "view", ts("2024-01-03 10:00:00")),
      (3L, "signup", ts("2024-01-01 10:00:00")),
      (3L, "purchase", ts("2024-01-04 10:00:00")),
      (4L, "signup", ts("2024-01-01 10:00:00")),
      (4L, "purchase", ts("2024-01-04 10:00:00")),
      (5L, "signup", ts("2024-01-01 10:00:00")),
      (5L, "view", ts("2024-01-06 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.survivalCurve(rows, "user_id", "ts",
        "event_type", "signup", "purchase")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.length == 2)
    assert(got(0) == ((1L, 5L, 1L, 0.8)))
    val s3 = math.rint(math.exp(
      math.rint(math.log(0.8) * 1e12) / 1e12 +
        math.rint(math.log(1.0 / 3.0) * 1e12) / 1e12) * 1e6) / 1e6
    assert(got(1) == ((3L, 3L, 2L, s3)))
  }

  test("survivalCurve: full conversion on the last day extinguishes S to exactly 0") {
    def ts(m: String) = Timestamp.valueOf(m)
    val rows = Seq(
      (1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, "purchase", ts("2024-01-02 10:00:00")),
      (2L, "signup", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-02 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.survivalCurve(rows, "user_id", "ts",
      "event_type", "signup", "purchase").collect()
    assert(got.length == 1 && got(0).getDouble(3) == 0.0)
  }

  // ---- cosinePairs ----

  test("cosinePairs: multiplicity weights the dot product (set Jaccard would not)") {
    // A = one shingle {pqr:1}; B repeats it: {pqr:2, qrs:2, rsp:1, spq:1}
    // cos = 2/√(1·10) ≈ 0.6325 — the SET view (Jaccard 1/4) calls these
    // far apart; the COUNT view correctly sees the shared repeated core
    val docs = Seq(
      (1L, "p q r"),
      (2L, "p q r s p q r s"),
      (3L, "x y z w")).toDF("doc_id", "text")
    val out = Dedup.cosinePairs(docs, "text", "doc_id", n = 3, threshold = 0.5)
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Double]("cosine") == math.rint(2.0 / math.sqrt(10.0) * 1e6) / 1e6)
  }

  // ---- sortedNeighborhoodPairs ----

  test("sortedNeighborhood: mid-text edits stay adjacent and pair; leading-token edits teleport away") {
    import org.apache.spark.sql.functions.col
    // docs 1/2 differ mid-text → identical normalized prefix → adjacent
    // in the sort → caught. docs 3/4 are the same near-dup pair but the
    // EDIT IS IN TOKEN 1, and 20 'm*' fillers sort between them → the
    // one-pass window provably cannot see the pair (the documented SNM
    // recall property, not a bug).
    val fillers = (10L to 29L).map(i => (i, s"m$i filler text block $i"))
    val docs = (Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "aaa common tail one two three four"),
      (4L, "zzz common tail one two three four")) ++ fillers)
      .toDF("doc_id", "text")
    val out = Dedup.sortedNeighborhoodPairs(docs, "text", "doc_id",
      org.apache.spark.sql.functions.lit("en"), window = 4, threshold = 0.3)
      .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.contains((1L, 2L)))
    assert(!out.contains((3L, 4L)))
  }

  test("sortedNeighborhood: pairs never cross block boundaries") {
    import org.apache.spark.sql.functions.{col, when}
    val docs = Seq(
      (1L, "same exact text here today", "en"),
      (2L, "same exact text here today", "fr")).toDF("doc_id", "text", "lang")
    assert(Dedup.sortedNeighborhoodPairs(docs, "text", "doc_id", col("lang"))
      .isEmpty)
  }

  test("cosinePairs: identical docs score 1.0; df cap drops saturated grams") {
    val twins = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "u v w x y"))
      .toDF("doc_id", "text")
    val out = Dedup.cosinePairs(twins, "text", "doc_id").collect()
    assert(out.length == 1 && out(0).getAs[Double]("cosine") == 1.0)
    // with maxDf = 1 every shared gram is over the cap → no pairs at all
    assert(Dedup.cosinePairs(twins, "text", "doc_id", maxDf = 1).isEmpty)
  }
}

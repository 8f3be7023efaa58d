package graft

import graft.ext.{EventAnalytics, Search}
import org.apache.spark.sql.functions._

/** Specs for inverted-index search and event-transition analysis. */
class SearchTransitionsSpec extends SparkSpecBase {

  import spark.implicits._

  test("invertedPostings: tf per (token, doc); blank/empty text yields none") {
    val docs = Seq(
      (1L, "a b a c"),
      (2L, "B b"),
      (3L, ""),
      (4L, "   ")).toDF("doc_id", "text")
    val p = Search.invertedPostings(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().sortBy(r => (r._2, r._1))
    assert(p.toSeq == Seq(("a", 1L, 2L), ("b", 1L, 1L), ("c", 1L, 1L), ("b", 2L, 2L))
      .sortBy(r => (r._2, r._1)))
  }

  test("searchAll: AND semantics, tf-sum scoring, distinct-terms contract") {
    val docs = Seq(
      (1L, "x y x z"), // both terms: score 2+1
      (2L, "x x x"),   // missing y
      (3L, "y x y")    // both: 1+2
    ).toDF("doc_id", "text")
    val postings = Search.invertedPostings(docs, "doc_id", "text")
    val hits = Search.searchAll(postings, Seq("x", "y"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(hits.toSeq == Seq((1L, 3L), (3L, 3L)))
    intercept[IllegalArgumentException] {
      Search.searchAll(postings, Seq("x", "x"))
    }
    intercept[IllegalArgumentException] {
      Search.searchAll(postings, Nil)
    }
  }

  test("transitions: per-user chains, id tiebreak at equal ts, last event open") {
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z"))
    def ts(s: Long) = java.sql.Timestamp.from(t0.toInstant.plusSeconds(s))
    val events = Seq(
      // user 1: a -> b -> a
      (10L, 1L, ts(0), "a"), (11L, 1L, ts(1), "b"), (12L, 1L, ts(2), "a"),
      // user 2: a -> b (tie at same ts resolved by event_id), then -> c
      (20L, 2L, ts(5), "a"), (21L, 2L, ts(5), "b"), (22L, 2L, ts(6), "c"),
      // user 3: single event — no transition
      (30L, 3L, ts(9), "a")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.transitions(events, "user_id", "ts", "event_type", "event_id")
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(("a", "b", 2L), ("b", "a", 1L), ("b", "c", 1L)))
  }

  test("transitions plan: one window shuffle + one combined aggregate, nothing else") {
    val e = Fixtures.events(spark, "/root/testdata/sf0.001")
    val plan = EventAnalytics.transitions(e, "user_id", "ts", "event_type", "event_id")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 2, s"expected <=2 shuffles:\n$plan")
    assert(plan.contains("partial_count"), s"expected map-side combine:\n$plan")
  }

  test("topPaths: 3-step journeys per user, short users contribute nothing") {
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z"))
    def ts(s: Long) = java.sql.Timestamp.from(t0.toInstant.plusSeconds(s))
    val events = Seq(
      // user 1: a b c d → paths a>b>c, b>c>d
      (10L, 1L, ts(0), "a"), (11L, 1L, ts(1), "b"),
      (12L, 1L, ts(2), "c"), (13L, 1L, ts(3), "d"),
      // user 2: a b c (tie at ts(5) broken by event_id) → a>b>c
      (20L, 2L, ts(5), "a"), (21L, 2L, ts(5), "b"), (22L, 2L, ts(6), "c"),
      // user 3: two events — no 3-path
      (30L, 3L, ts(9), "a"), (31L, 3L, ts(10), "b")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.topPaths(events, "user_id", "ts", "event_type",
        "event_id", k = 20, len = 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a>b>c", 2L), ("b>c>d", 1L)))
    // heavy-hitters contract: the plan bounds what survives the final
    // sort. Asserted over the parquet fixture, NOT the local Seq above —
    // on a LocalRelation with maxRows <= k the optimizer (correctly)
    // eliminates the Limit and no top-k node exists to find.
    val plan = EventAnalytics.topPaths(Fixtures.events(spark, "/root/testdata/sf0.001"),
        "user_id", "ts", "event_type", "event_id", k = 20, len = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }
}

package graft

import graft.ext.EventAnalytics
import graft.log.ChangeLog
import graft.model.CdcTableSpec
import graft.sources.{CdcSource, JdbcSource, ParquetSink, ParquetSource}
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class EventAnalyticsSpec extends SparkSpecBase {

  private lazy val s = spark
  import s.implicits._

  private def ts(m: String) = Timestamp.valueOf(m)

  private val evts = Seq(
    // user 1: two sessions (45-min gap between events 2 and 3)
    (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
    (2L, 10L, ts("2024-01-01 10:10:00"), 2.0),
    (3L, 10L, ts("2024-01-01 10:55:00"), 3.0),
    // user 2: one session
    (4L, 20L, ts("2024-01-01 09:00:00"), 4.0),
    (5L, 20L, ts("2024-01-01 09:29:59"), 5.0))
    .toDF("event_id", "user_id", "ts", "value")

  test("sessionize splits on gaps > maxGap per user") {
    val st = EventAnalytics.sessionStats(evts, "user_id", "ts", "event_id", "value", 30)
      .orderBy("user_id", "session_seq").collect()
    assert(st.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((10L, 1L, 2L), (10L, 2L, 1L), (20L, 1L, 2L)))
    val s1 = st(0)
    assert(s1.getAs[Long]("duration_us") === 10L * 60 * 1000000)
    assert(s1.getAs[Double]("sum_value") === 3.0)
  }

  test("funnel counts strictly-increasing step completions per user") {
    val fe = Seq(
      // user 1 completes a->b->c in order
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "b"),
      (3L, 1L, ts("2024-01-01 10:02:00"), "c"),
      // user 2 has b BEFORE a (b must not count), then no later b
      (4L, 2L, ts("2024-01-01 09:00:00"), "b"),
      (5L, 2L, ts("2024-01-01 09:30:00"), "a"),
      // user 3: a and b at the SAME instant — strict > excludes b
      (6L, 3L, ts("2024-01-01 08:00:00"), "a"),
      (7L, 3L, ts("2024-01-01 08:00:00"), "b"),
      // user 4: a, then b, then c earlier than b (c must not count)
      (8L, 4L, ts("2024-01-01 07:00:00"), "a"),
      (9L, 4L, ts("2024-01-01 07:30:00"), "c"),
      (10L, 4L, ts("2024-01-01 07:45:00"), "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(fe, "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .orderBy("step_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((0, "a", 4L), (1, "b", 2L), (2, "c", 1L)))
  }

  test("funnelWithin enforces the per-step conversion deadline") {
    val fe = Seq(
      // user 1: b 30 min after a — inside a 1 h window
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 10:30:00"), "b"),
      // user 2: b 2 h after a — ordered, but outside the window
      (3L, 2L, ts("2024-01-01 09:00:00"), "a"),
      (4L, 2L, ts("2024-01-01 11:00:00"), "b"),
      // user 3: first b late, second b inside the window (min-qualifying)
      (5L, 3L, ts("2024-01-01 07:00:00"), "a"),
      (6L, 3L, ts("2024-01-01 09:30:00"), "b"),
      (7L, 3L, ts("2024-01-01 07:20:00"), "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.funnelWithin(fe, "user_id", "ts", "event_type",
        Seq("a", "b"), maxGapUs = 3600L * 1000000)
      .orderBy("step_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((0, "a", 3L), (1, "b", 2L)))
    // boundary: exactly at the deadline is IN (<=)
    val exact = Seq(
      (1L, 9L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 9L, ts("2024-01-01 11:00:00"), "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val g2 = EventAnalytics.funnelWithin(exact, "user_id", "ts", "event_type",
        Seq("a", "b"), maxGapUs = 3600L * 1000000)
      .orderBy("step_idx").collect().map(_.getLong(2)).toSeq
    assert(g2 === Seq(1L, 1L))
  }

  test("funnelExists finds compliant chains the greedy anchor rejects") {
    // the documented greedy-undercount shape: a@0h, b@10h, b@20h, c@35h
    // with a 24 h deadline — greedy anchors b at 10 h and rejects c
    // (gap 25 h); the chain a→b@20h→c@35h is fully compliant.
    val gap = 24L * 3600 * 1000000
    val fe = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 10:00:00"), "b"),
      (3L, 1L, ts("2024-01-01 20:00:00"), "b"),
      (4L, 1L, ts("2024-01-02 11:00:00"), "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    def counts(d: org.apache.spark.sql.DataFrame,
               f: (org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame) =
      f(d).orderBy("step_idx").collect().map(_.getLong(2)).toSeq
    val greedy = counts(fe, EventAnalytics.funnelWithin(_, "user_id", "ts",
      "event_type", Seq("a", "b", "c"), gap))
    val exact = counts(fe, EventAnalytics.funnelExists(_, "user_id", "ts",
      "event_type", Seq("a", "b", "c"), gap))
    assert(greedy === Seq(1L, 1L, 0L), "greedy rejects the late chain")
    assert(exact === Seq(1L, 1L, 1L), "chain-existence counts it")

    // sandwich on a mixed fixture: within <= exists <= unbounded, and
    // with an effectively-infinite deadline exists == unbounded funnel
    val mixed = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 10:30:00"), "b"),
      (3L, 2L, ts("2024-01-01 09:00:00"), "a"),
      (4L, 2L, ts("2024-01-03 09:00:00"), "b"),
      (5L, 3L, ts("2024-01-01 07:00:00"), "a"),
      (6L, 3L, ts("2024-01-01 07:20:00"), "b"),
      (7L, 3L, ts("2024-01-01 09:30:00"), "b"),
      (8L, 3L, ts("2024-01-02 08:00:00"), "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val steps = Seq("a", "b", "c")
    val w = counts(mixed, EventAnalytics.funnelWithin(_, "user_id", "ts",
      "event_type", steps, gap))
    val x = counts(mixed, EventAnalytics.funnelExists(_, "user_id", "ts",
      "event_type", steps, gap))
    val u = counts(mixed, EventAnalytics.funnel(_, "user_id", "ts",
      "event_type", steps))
    val xInf = counts(mixed, EventAnalytics.funnelExists(_, "user_id", "ts",
      "event_type", steps, maxGapUs = Long.MaxValue / 4))
    assert(w.zip(x).forall { case (a, b) => a <= b }, s"within <= exists ($w vs $x)")
    assert(x.zip(u).forall { case (a, b) => a <= b }, s"exists <= unbounded ($x vs $u)")
    assert(xInf === u, s"infinite-deadline exists == unbounded funnel ($xInf vs $u)")
  }

  test("retention cohorts by first-activity epoch week with exact fractions") {
    val re = Seq(
      // users 1,2 first active week w0; user 1 returns in w0+1
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-08 10:00:00")),
      (3L, 2L, ts("2024-01-02 10:00:00")),
      // user 3 first active the next week
      (4L, 3L, ts("2024-01-09 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val got = EventAnalytics.retention(re, "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    // cohort w0 (2 users): offset 0 -> 2 users, offset 1 -> 1 user (50%)
    // cohort w0+1 (1 user): offset 0 -> 1 user
    assert(got === Seq((0L, 2L, 1.0), (1L, 1L, 0.5), (0L, 1L, 1.0)))
    // the cohort_start label is the Monday-aligned epoch-week start date
    val starts = EventAnalytics.retention(re, "user_id", "ts")
      .select("cohort_start").distinct().collect().map(_.getString(0)).sorted
    assert(starts.forall(_.matches("\\d{4}-\\d{2}-\\d{2}")))
  }

  test("streaming hourly counts with watermark match the batch aggregate") {
    val tmp = Files.createTempDirectory("evstream").toString
    evts.write.mode("overwrite").parquet(s"$tmp/in")
    val stream = s.readStream.schema(evts.schema).parquet(s"$tmp/in")
    val agg = EventAnalytics.streamingHourlyCounts(stream, "ts", "user_id")
    val q = agg.writeStream.format("memory").queryName("ev_hourly")
      .outputMode("complete")
      .option("checkpointLocation", s"$tmp/chk")
      .start()
    try {
      q.processAllAvailable()
      val got = s.table("ev_hourly")
        .select(date_format(col("hour_start"), "HH:mm").as("h"), col("user_id"), col("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set(("10:00", 10L, 3L), ("09:00", 20L, 2L)))
    } finally q.stop()
  }

  test("asOfJoin matches the latest right row at or before each left row, per key") {
    import org.apache.spark.sql.functions._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val clicks = Seq(
      (101L, 1L, ts(10)), (102L, 1L, ts(50)),
      (103L, 3L, ts(20)), (104L, 3L, ts(20))) // duplicate ts → higher seq wins
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (201L, 1L, ts(30)),  // → click 101
      (202L, 1L, ts(50)),  // same instant as click 102 → matched (at-or-before)
      (203L, 1L, ts(5)),   // before any click → NULL
      (204L, 2L, ts(40)),  // user with no clicks → NULL
      (205L, 3L, ts(25)))  // duplicate-ts clicks → 104 (higher event_id)
      .toDF("event_id", "user_id", "ts")
    val got = graft.ext.EventAnalytics.asOfJoin(purchases, clicks, "user_id", "ts", "event_id")
      .select(col("l.event_id"), col("r.event_id"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(201L -> 101L, 202L -> 102L, 203L -> -1L, 204L -> -1L, 205L -> 104L))
  }

  test("asOfJoin equals a brute-force reference on random data with ts collisions") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(29)
    // small ts range + few users → plenty of duplicate timestamps
    def gen(n: Int, idBase: Long) = Seq.tabulate(n) { i =>
      (idBase + i, rnd.nextInt(8).toLong, new java.sql.Timestamp(rnd.nextInt(40) * 1000L))
    }
    val lRows = gen(120, 1000L)
    val rRows = gen(120, 2000L)
    val got = graft.ext.EventAnalytics.asOfJoin(
        lRows.toDF("event_id", "user_id", "ts"),
        rRows.toDF("event_id", "user_id", "ts"),
        "user_id", "ts", "event_id")
      .select(col("l.event_id"), col("r.event_id"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // brute force: max by (ts, event_id) among right rows at or before
    val expected = lRows.map { case (lid, u, lts) =>
      val cands = rRows.filter { case (_, ru, rts) => ru == u && !rts.after(lts) }
      lid -> (if (cands.isEmpty) -1L
              else cands.maxBy { case (rid, _, rts) => (rts.getTime, rid) }._1)
    }.toMap
    assert(got === expected)
  }

  test("stream-stream interval join matches the batch join; across micro-batches") {
    def ts(m: String) = Timestamp.valueOf(m)
    val imps = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")),
      (11L, 1L, ts("2024-01-01 12:00:00")),
      (12L, 2L, ts("2024-01-01 10:30:00")))
      .toDF("imp_id", "user_id", "imp_ts")
    val clicks = Seq(
      (100L, 1L, ts("2024-01-01 10:20:00")), // → imp 10 (20 min gap)
      (101L, 1L, ts("2024-01-01 11:30:00")), // > 1h after imp 10 → no match
      (102L, 1L, ts("2024-01-01 12:40:00")), // → imp 11
      (103L, 2L, ts("2024-01-01 10:15:00")), // BEFORE imp 12 → no match
      (104L, 3L, ts("2024-01-01 10:00:00"))) // user with no impression
      .toDF("click_id", "user_id", "click_ts")

    val tmp = Files.createTempDirectory("ssjoin").toString
    // feed impressions across two micro-batch files to cross epochs
    imps.filter(col("imp_id") <= 10).write.mode("overwrite").parquet(s"$tmp/imps")
    clicks.write.mode("overwrite").parquet(s"$tmp/clicks")
    val iStream = s.readStream.schema(imps.schema).parquet(s"$tmp/imps")
    val cStream = s.readStream.schema(clicks.schema).parquet(s"$tmp/clicks")
    val joined = EventAnalytics.streamingClickAttribution(
      iStream, cStream, "user_id", "imp_ts", "click_ts", "imp_id", "click_id")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/chk")
      .start()
    try {
      q.processAllAvailable()
      imps.filter(col("imp_id") > 10).write.mode("append").parquet(s"$tmp/imps")
      q.processAllAvailable()
      val got = s.table("ss_join")
        .select(col("imp_id"), col("click_id"), col("gap_seconds"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set((10L, 100L, 1200L), (11L, 102L, 2400L)))
      // the batch form of the same expression agrees
      val batch = EventAnalytics.streamingClickAttribution(
          imps, clicks, "user_id", "imp_ts", "click_ts", "imp_id", "click_id")
        .select(col("imp_id"), col("click_id"), col("gap_seconds"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batch === got)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join emits unmatched impressions after the watermark passes") {
    def ts(m: String) = Timestamp.valueOf(m)
    val imps = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")),  // will match
      (11L, 2L, ts("2024-01-01 10:00:00")))  // never matches → null click
      .toDF("imp_id", "user_id", "imp_ts")
    val clicks = Seq((100L, 1L, ts("2024-01-01 10:20:00")))
      .toDF("click_id", "user_id", "click_ts")
    val tmp = Files.createTempDirectory("ssouter").toString
    imps.write.mode("overwrite").parquet(s"$tmp/imps")
    clicks.write.mode("overwrite").parquet(s"$tmp/clicks")
    val iStream = s.readStream.schema(imps.schema).parquet(s"$tmp/imps")
      .withWatermark("imp_ts", "10 minutes").as("i")
    val cStream = s.readStream.schema(clicks.schema).parquet(s"$tmp/clicks")
      .withWatermark("click_ts", "10 minutes").as("c")
    val joined = iStream.join(cStream,
      col("i.user_id") === col("c.user_id") &&
        col("c.click_ts") >= col("i.imp_ts") &&
        col("c.click_ts") <= col("i.imp_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("i.imp_id"), col("c.click_id"))
    val q = joined.writeStream.format("memory").queryName("ss_outer")
      .outputMode("append").option("checkpointLocation", s"$tmp/chk").start()
    try {
      q.processAllAvailable()
      // the unmatched row is HELD until the watermark provably rules out
      // a future match; the GLOBAL watermark is min(left, right), so
      // BOTH streams must advance (a later click alone leaves the
      // impression-side watermark at the epoch of imp 11)
      Seq((999L, 9L, ts("2024-01-02 00:00:00")))
        .toDF("click_id", "user_id", "click_ts")
        .write.mode("append").parquet(s"$tmp/clicks")
      Seq((99L, 8L, ts("2024-01-02 00:00:00")))
        .toDF("imp_id", "user_id", "imp_ts")
        .write.mode("append").parquet(s"$tmp/imps")
      q.processAllAvailable()
      q.processAllAvailable() // second pass: null emission follows the wm update
      val got = s.table("ss_outer").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      // imp 99 (the advancer) is itself still inside its match window →
      // correctly HELD in state, not emitted
      assert(got === Set((10L, 100L), (11L, -1L)))
    } finally q.stop()
  }

  test("streaming event dedup suppresses replayed duplicates across micro-batches") {
    val tmp = Files.createTempDirectory("evdedup").toString
    // batch 1: events 1..3
    evts.filter(col("event_id") <= 3).write.mode("overwrite").parquet(s"$tmp/in")
    val stream = s.readStream.schema(evts.schema).parquet(s"$tmp/in")
    val deduped = graft.ext.EventAnalytics.streamingDedupEvents(
      stream, "ts", "event_id", watermarkDelay = "2 hours")
    val q = deduped.writeStream.format("memory").queryName("ev_dedup")
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/chk")
      .start()
    try {
      q.processAllAvailable()
      // batch 2: a replay of events 2..3 (duplicate ids) plus new 4..5 —
      // the at-least-once scenario a retried producer creates
      evts.filter(col("event_id") >= 2).write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
      val got = s.table("ev_dedup").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(1L, 2L, 3L, 4L, 5L)) // each event exactly once
    } finally q.stop()
  }

  test("stateful streaming sessionization carries session numbering across batches") {
    val tmp = Files.createTempDirectory("statesess").toString
    val us = 1000000L
    def write(rows: Seq[(Long, Long, Long)], mode: String): Unit =
      rows.toDF("user_id", "event_id", "ts_us")
        .write.mode(mode).parquet(s"$tmp/in")

    // batch 1: user 10 events at t=0s and t=60s (one session, gap 1 min)
    write(Seq((10L, 1L, 0L), (10L, 2L, 60L * us)), "overwrite")
    val schema = Seq.empty[(Long, Long, Long)].toDF("user_id", "event_id", "ts_us").schema
    val stream = s.readStream.schema(schema)
      .parquet(s"$tmp/in")
      .as[(Long, Long, Long)]
    val sessions = graft.ext.EventAnalytics.streamingSessionize(stream, maxGapMinutes = 30)
    val q = sessions.toDF().writeStream.format("memory").queryName("sess")
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/chk")
      .start()
    try {
      q.processAllAvailable()
      // batch 2: same user — one event 5 s after batch 1's last (same
      // session), one 95 min in (new session). A per-batch recomputation
      // would restart numbering; carried state must keep it global.
      write(Seq((10L, 3L, 65L * us), (10L, 4L, 95L * 60L * us)), "append")
      q.processAllAvailable()
      val got = s.table("sess")
        .select("event_id", "session_seq").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    } finally q.stop()
  }

  test("parquet source/sink round-trip and config-driven selection (S1/S11)") {
    val tmp = Files.createTempDirectory("srcsink").toString
    ParquetSink(s"$tmp/t").save(evts)
    val back = ParquetSource(s"$tmp/t", Some(evts.schema)).load(s)
    assert(back.count() === 5)
    assert(CdcSource.forConfig("parquet", s"$tmp/t").isInstanceOf[ParquetSource])
    assert(CdcSource.forConfig("postgresql", "jdbc:postgresql://h/db", "t")
      .isInstanceOf[JdbcSource])
    intercept[IllegalArgumentException](CdcSource.forConfig("sqlite3", "x"))
  }

  test("jsonl source: permissive read quarantines corrupt lines by raw text") {
    import org.apache.spark.sql.types._
    val tmp = Files.createTempDirectory("jsonl").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/docs.jsonl"),
      """{"doc_id": 1, "text": "hello world"}
        |{"doc_id": 2, "text": "second doc"}
        |{not valid json at all
        |{"doc_id": 4, "text": null}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // cache: Spark disallows querying ONLY the corrupt column from raw
    // JSON (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize the parse once
    val df = graft.sources.JsonlSource(s"$tmp/docs.jsonl", schema).load(s).cache()
    val rows = df.collect()
    assert(rows.length === 4)
    val good = df.filter(col("_corrupt").isNull)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(good === Seq(1L, 2L, 4L))
    val bad = df.filter(col("_corrupt").isNotNull)
      .select("_corrupt").collect().map(_.getString(0))
    assert(bad.toSeq === Seq("{not valid json at all"))
    // config-driven selection + the required-schema guard
    assert(graft.sources.CdcSource.forConfig("jsonl", s"$tmp/docs.jsonl",
      schema = Some(schema)).isInstanceOf[graft.sources.JsonlSource])
    intercept[IllegalArgumentException](
      graft.sources.CdcSource.forConfig("jsonl", s"$tmp/docs.jsonl"))
  }

  test("partitioned log write prunes partitions on time-bounded reads (S3)") {
    val spec = CdcTableSpec("t", Seq("id", "name", "value"), "id")
    val tmp = Files.createTempDirectory("logpart").toString
    def batch(day: String, id: Long) = {
      val t = graft.capture.CdcTable(
        Seq.empty[(Long, String, Long)].toDF("id", "name", "value"), spec)
      t.insert(Seq((id, s"d$day", id)).toDF("id", "name", "value"))
      t.changeLog.withColumn("changed_at",
        lit(Timestamp.valueOf(s"$day 12:00:00")))
    }
    ChangeLog.writePartitioned(batch("2026-01-01", 1L), tmp)
    ChangeLog.writePartitioned(batch("2026-02-01", 2L), tmp)
    val all = ChangeLog.readPartitioned(s, tmp)
    assert(all.count() === 2)
    val recent = ChangeLog.readPartitioned(s, tmp, Some(java.time.LocalDate.parse("2026-01-15")))
    assert(recent.count() === 1)
    // the date predicate must prune at planning time, not post-scan
    val plan = recent.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") &&
      plan.contains("change_date"), plan.take(800))
  }

  test("ChangeLog.asRecords gives a typed Dataset with JSON images (F8)") {
    val spec = CdcTableSpec("t", Seq("id", "name", "value"), "id")
    val t = graft.capture.CdcTable(
      Seq.empty[(Long, String, Long)].toDF("id", "name", "value"), spec)
    t.insert(Seq((1L, "typed", 9L)).toDF("id", "name", "value"))
    val recs = ChangeLog.asRecords(t.changeLog).collect()
    assert(recs.length === 1)
    val r = recs.head
    assert(r.operation === "INSERT")
    assert(r.oldData.isEmpty)
    assert(r.newData.exists(_.contains("\"typed\"")))
    assert(r.synced === 0)
  }
}

package graft

import graft.ext.{EventAnalytics, Expectations, Profiler, Segmentation, TextAnalysis}
import graft.log.{Erasure, History}
import org.apache.spark.sql.functions._

/** Hand-checkable cases for the round-6 batch-2 operators: PIT lookup
  * join, GDPR erasure, expectations, RFM, PMI, histogram, gap-fill.
  */
class RoundSixOpsSpec extends SparkSpecBase {

  private lazy val s = spark
  import s.implicits._

  // ------------------------------------------------------------ pitLookup

  private def hist = Seq(
    // key 1: three versions, second closed by the third, first by second
    (1L, "a", 0L, Some(10L)),
    (1L, "b", 10L, Some(20L)),
    (1L, "c", 20L, None),
    // key 2: one version closed by a DELETE at 15 (no successor)
    (2L, "x", 0L, Some(15L))
  ).toDF("record_id", "st", "valid_from", "valid_to")
    .withColumn("valid_to", col("valid_to").cast("long"))

  test("pitLookup: inclusive open bound, exclusive close, dead gap, pre-history") {
    val probes = Seq(
      (1L, 0L),   // at first version's open -> a
      (1L, 9L),   // inside first -> a
      (1L, 10L),  // at second's open (first closes exactly here) -> b
      (1L, 999L), // current -> c
      (2L, 14L),  // just before delete -> x
      (2L, 15L),  // at delete position: dead gap -> NULL
      (3L, 5L)    // key never existed -> NULL
    ).toDF("record_id", "pos")
    val out = History.pitLookup(hist, probes, "record_id", "pos")
      .select(col("l.record_id").as("record_id"), col("l.pos").as("pos"),
        col("r.st").as("st"))
    val got = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(got === Set(
      (1L, 0L, Some("a")), (1L, 9L, Some("a")), (1L, 10L, Some("b")),
      (1L, 999L, Some("c")), (2L, 14L, Some("x")), (2L, 15L, None),
      (3L, 5L, None)))
  }

  // -------------------------------------------------------------- Erasure

  test("erasure: report accounts for every row; eraseKeys drops exactly the keys") {
    val target = Seq(1L, 2L, 3L, 4L).toDF("record_id")
    val log = Seq(1L, 1L, 5L).toDF("record_id")
    val keys = Seq(1L, 4L, 99L).toDF("record_id")
    val rep = Erasure.eraseReport(Seq("target" -> target, "log" -> log), keys, "record_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(rep === Set(
      ("target", 4L, 2L, 2L, 2L), // rows 1,4 erased
      ("log", 3L, 2L, 1L, 1L)))   // both rows of key 1 erased, one key touched
    assert(Erasure.eraseKeys(target, keys, "record_id").as[Long].collect().sorted
      === Array(2L, 3L))
  }

  // --------------------------------------------------------- Expectations

  test("expectations: each family fires; zero-violation rules still report") {
    import Expectations._
    val df = Seq(
      (1L, Some(10L), "OK", 5.0),
      (2L, None, "OK", 5.0),        // null fk
      (3L, Some(999L), "OK", 5.0),  // orphan fk (passes not-null)
      (4L, Some(10L), "BAD", -1.0), // bad status + bad range
      (5L, Some(10L), "OK", 5.0),
      (5L, Some(10L), "OK", 5.0)    // dup key 5 (two rows count)
    ).toDF("k", "fk", "status", "amt")
    val dim = Seq(10L).toDF("dim_k")
    val rep = check(df, "k",
      rowRules = Seq(
        RowRule("status_ok", !col("status").isin("OK")),
        RowRule("amt_pos", col("amt") <= 0),
        RowRule("never_fires", col("amt") > 1e9)),
      uniqueKey = Some("k"),
      refRules = Seq(RefRule("fk_ref", "fk", dim, "dim_k")))
    val rows = rep.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    assert(rows === Set(
      ("status_ok", 6L, 1L, Some(4L)),
      ("amt_pos", 6L, 1L, Some(4L)),
      ("never_fires", 6L, 0L, None),
      ("unique:k", 6L, 2L, Some(5L)),  // both rows of the dup key
      ("fk_ref", 6L, 1L, Some(3L))))   // NULL fk passes ref, orphan fails
    // pass_rate sanity on the zero-violation rule
    val never = rep.filter(col("rule_name") === "never_fires").head()
    assert(never.getDouble(3) === 1.0)
  }

  // ------------------------------------------------------------------ RFM

  test("rfm: aggregate-then-rank with deterministic quintiles") {
    // 5 customers, clearly ordered on every dimension
    val tx = (1 to 5).flatMap { c =>
      // customer c: c orders of 100*c each, last order day 10*c
      (1 to c).map(i => (c.toLong, java.sql.Date.valueOf(f"2024-01-${10 + 2 * c}%02d"), 100.0 * c))
    }.toDF("cust", "d", "amt")
    val out = Segmentation.rfm(tx, "cust", "d", "amt")
      .orderBy("cust").collect()
    // customer 5: most recent (r=1), most frequent (f=1), biggest spend (m=1)
    val c5 = out.last
    assert(c5.getAs[Long]("r_days") === 0L)
    assert(c5.getAs[Int]("rfm_code") === 111)
    // customer 1: most lapsed on every axis
    val c1 = out.head
    assert(c1.getAs[Int]("rfm_code") === 555)
    // quintiles are a permutation 1..5 on each axis
    assert(out.map(_.getAs[Int]("r_score")).sorted === (1 to 5).toArray)
    assert(out.map(_.getAs[Int]("f_score")).sorted === (1 to 5).toArray)
    assert(out.map(_.getAs[Int]("m_score")).sorted === (1 to 5).toArray)
  }

  test("rfmApprox: windowless plan, >=95% score agreement with exact rfm") {
    // 400 entities, smooth distinct dimensions: entity i has last-order
    // day i (mod bounded), i%40+1 orders of distinct-ish amounts
    val tx = (0 until 400).flatMap { c =>
      val nOrders = c % 40 + 1
      (0 until nOrders).map(j =>
        (c.toLong, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(c % 365)),
          10.0 + c * 0.37 + j * 0.011))
    }.toDF("cust", "d", "amt")
    val exact = Segmentation.rfm(tx, "cust", "d", "amt")
      .select("cust", "r_score", "f_score", "m_score").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    val approxDf = Segmentation.rfmApprox(tx, "cust", "d", "amt")
    // fully parallel: no window operator anywhere in the plan
    val plan = approxDf.queryExecution.executedPlan.toString()
    assert(!plan.contains("Window"), s"rfmApprox must not plan a window:\n${plan.take(800)}")
    val approx = approxDf.select("cust", "r_score", "f_score", "m_score").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(approx.keySet === exact.keySet)
    val agree = approx.count { case (c, sc) => exact(c) === sc }
    assert(agree >= (exact.size * 0.95).toInt,
      s"only $agree/${exact.size} entities agree with exact quintiles")
    // scores stay in 1..5
    approx.values.foreach { case (r, f, m) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5) }
  }

  test("rfm distributed quintiles are bit-identical to global ntile(5), windowless-global plan") {
    // adversarial sizes for the ntile bucket formula: n % 5 ∈ {0,..,4},
    // n < 5, and ties on every dimension (broken by the entity key)
    for (nEnt <- Seq(3, 5, 40, 41, 42, 43, 44)) {
      val rnd = new scala.util.Random(nEnt)
      val tx = (0 until nEnt).flatMap { c =>
        val nOrders = rnd.nextInt(4) + 1
        (0 until nOrders).map(_ =>
          (c.toLong,
            java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
              .plusDays(rnd.nextInt(7))), // heavy date ties
            (rnd.nextInt(5) + 1) * 10.0)) // heavy amount ties
      }.toDF("cust", "d", "amt")
      // distributedFrom = 0 forces the distributed rank engine — the
      // production default would route these tiny frames to the global
      // window whose equivalence is exactly what this test certifies
      val got = Segmentation.rfm(tx, "cust", "d", "amt", distributedFrom = 0L)
      // reference: the literal global-window formulation
      val perCust = tx.groupBy(col("cust"))
        .agg(max(col("d")).as("last"), count(lit(1)).as("frequency"),
          sum(col("amt").cast("decimal(18,2)")).cast("double").as("monetary"))
        .crossJoin(broadcast(tx.agg(max(col("d")).as("maxd"))))
        .select(col("cust"),
          datediff(col("maxd"), col("last")).cast("long").as("r_days"),
          col("frequency"), col("monetary"))
      val w = org.apache.spark.sql.expressions.Window
      val expect = perCust
        .withColumn("r_score", ntile(5).over(w.orderBy(col("r_days"), col("cust"))).cast("int"))
        .withColumn("f_score", ntile(5).over(w.orderBy(col("frequency").desc, col("cust"))).cast("int"))
        .withColumn("m_score", ntile(5).over(w.orderBy(col("monetary").desc, col("cust"))).cast("int"))
        .collect().map(r => r.getLong(0) ->
          ((r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
      val gm = got.collect().map(r => r.getAs[Long]("cust") ->
        ((r.getAs[Int]("r_score"), r.getAs[Int]("f_score"), r.getAs[Int]("m_score")))).toMap
      assert(gm === expect, s"nEnt=$nEnt: distributed quintiles diverge from ntile(5)")
    }
    // plan shape: on the distributed path every Window is partitioned
    // (the per-pid rank windows) — no single-task global window survives
    val tx = (0 until 50).map(c => (c.toLong,
      java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(c % 9)),
      c * 1.5)).toDF("cust", "d", "amt")
    val plan = Segmentation.rfm(tx, "cust", "d", "amt", distributedFrom = 0L)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Window [") || !plan.contains("windowspecdefinition()"),
      "unexpected unpartitioned window")
    val globalWindows = plan.linesIterator.filter(l =>
      l.contains("Window") && !l.contains("__pid")).toSeq
    assert(globalWindows.isEmpty,
      s"rfm must not plan a window outside the per-pid rank:\n${globalWindows.mkString("\n")}")
  }

  // ------------------------------------------------------------------ PMI

  test("pmi: hand-computed score, minCount prunes") {
    // corpus: "a b" x3, "a c" x1  -> unigrams a:4 b:3 c:1, pairs: ab:3 ac:1, N=4
    val docs = Seq("a b", "a b", "a b", "a c").toDF("text")
    val out = TextAnalysis.pmiCollocations(docs, "text", minCount = 2L).collect()
    assert(out.length === 1) // "a c" pruned by minCount
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) === ("a", "b", 3L))
    val expected = BigDecimal(math.log(3.0 * 4 / (4.0 * 3)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) === expected) // = 0.0
  }

  // ------------------------------------------------------------ histogram

  test("histogram: equi-width bins, max clamped, fractions sum to 1") {
    val df = (0 to 10).map(_.toDouble).toDF("v") // min 0, max 10, 5 bins of 2
    val out = Profiler.histogram(df, "v", 5).orderBy("bin").collect()
    assert(out.map(_.getInt(0)) === Array(0, 1, 2, 3, 4))
    // bins 0..3 hold 2 values each; bin 4 holds 8,9 and the clamped 10
    assert(out.map(_.getLong(3)) === Array(2L, 2L, 2L, 2L, 3L))
    assert(out.head.getDouble(1) === 0.0 && out.head.getDouble(2) === 2.0)
    // frac is rounded to 6 dp per bin, so the sum is off by <= nBins * 5e-7
    assert(math.abs(out.map(_.getDouble(4)).sum - 1.0) < 1e-5)
  }

  // ---------------------------------------------------------- sliding HLL

  test("hllSlidingDistinct: merged-pane window == one-shot sketch of the span") {
    import graft.ext.Sketches
    val ts = (h: Int, m: Int) =>
      java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plusSeconds(3600L * h + 60L * m))
    // users spread over 10 hours; some recur across panes
    val ev = (0 until 10).flatMap { h =>
      (0 until 20).map(u => (s"u${(u * 7 + h * 3) % 40}", ts(h, u)))
    }.toDF("user_id", "ts")
    val panes = 4
    val slid = Sketches.hllSlidingDistinct(ev, "ts", col("user_id"), b = 5,
        panes = panes, paneUs = 3600000000L)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // merge is lossless: each window's estimate equals a one-shot sketch
    // over exactly that window's events
    val h0 = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond / 3600
    slid.keys.foreach { win =>
      val hr = (unix_micros(col("ts")) / 3600000000L).cast("long")
      val span = ev.filter(hr > win - panes && hr <= win)
      val oneShot = Sketches.hllDistinct(span.withColumn("g", lit(1)), Seq("g"),
        col("user_id"), b = 5).head().getDouble(2)
      assert(slid(win) === oneShot, s"window $win merge diverges from one-shot")
    }
    // windows stop at the last observed pane (no phantom tail)
    assert(slid.keys.max === h0 + 9)
    assert(slid.keys.min === h0) // head windows partial but present
  }

  // ----------------------------------------------------- rolling features

  test("rollingFeatures: trailing bound inclusive, equal-ts rows are peers") {
    val ts = (m: Int) =>
      java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(60L * m))
    val ev = Seq(
      (1L, ts(0), "click", 1.0, 1L),
      (1L, ts(30), "purchase", 2.0, 2L),
      (1L, ts(90), "click", 4.0, 3L),   // 60m window: includes the 30m row (boundary inclusive), not 0m
      (2L, ts(10), "click", 1.0, 4L),
      (2L, ts(10), "purchase", 1.0, 5L) // same instant: frame peers — each sees both
    ).toDF("user_id", "ts", "event_type", "value", "event_id")
    val out = EventAnalytics.rollingFeatures(ev, "user_id", "ts", "event_id",
        "value", "event_type", "purchase", windowUs = 3600000000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(out(1L) === ((1L, 1.0, 0L)))
    assert(out(2L) === ((2L, 3.0, 1L)))
    assert(out(3L) === ((2L, 6.0, 1L))) // 30m row sits exactly at the -60m bound: included
    assert(out(4L) === ((2L, 2.0, 1L)))
    assert(out(5L) === ((2L, 2.0, 1L)))
  }

  // ------------------------------------------------------------- gap-fill

  test("gapFillHourly: zeros in gaps, type carried forward, in-bucket last wins") {
    val ts = (h: Int, m: Int) =>
      java.sql.Timestamp.from(java.time.Instant.parse(f"2024-01-01T$h%02d:$m%02d:00Z"))
    val ev = Seq(
      (1L, ts(0, 10), "click", 1L),
      (1L, ts(0, 20), "view", 2L),  // later in bucket 0 -> bucket's last_type
      (1L, ts(3, 0), "buy", 3L),    // hours 1,2 are gaps carrying "view"
      (2L, ts(5, 0), "click", 4L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = EventAnalytics.gapFillHourly(ev, "user_id", "ts", "event_type", "event_id")
      .orderBy("user_id", "bucket_h")
      .select(col("user_id"), col("n"), col("carried_type"), col("bucket_start"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(out === Array(
      (1L, 2L, "view", "2024-01-01 00:00:00"),
      (1L, 0L, "view", "2024-01-01 01:00:00"),
      (1L, 0L, "view", "2024-01-01 02:00:00"),
      (1L, 1L, "buy", "2024-01-01 03:00:00"),
      (2L, 1L, "click", "2024-01-01 05:00:00")))
  }
}

package graft

import graft.apply.IncrementalAgg
import graft.capture.ChangeCapture
import graft.ext.{PortableHash, Sketches}
import graft.log.ChangeLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Specs for the round-4 additions: incremental aggregate maintenance and
  * the KMV distinct sketch.
  */
class SketchIncrementalSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  // ------------------------------------------------- incremental aggregate

  test("incremental agg equals full recompute on the fixture log") {
    val base = Fixtures.orders(spark, dir).select(Fixtures.OrdersSpec.columns.map(col): _*)
    val stored = IncrementalAgg.snapshotAgg(base, "o_orderpriority", "o_totalprice")
    val maintained =
      IncrementalAgg.maintain(stored, Fixtures.changeLog(spark, dir),
        "o_orderpriority", "o_totalprice")
    val recomputed =
      IncrementalAgg.snapshotAgg(Fixtures.after(base), "o_orderpriority", "o_totalprice")
    assertSameRows(maintained, recomputed, "incremental vs recompute")
  }

  test("incremental agg: emptied groups vanish, new groups appear, values exact") {
    import spark.implicits._
    val before = Seq(
      (1L, "a", 10.5), (2L, "a", 20.25), (3L, "b", 1.0)
    ).toDF("id", "grp", "v")
    // delete both 'a' rows (group dies), update 'b' value, insert 'c' (group born)
    val afterDf = Seq((3L, "b", 2.5), (4L, "c", 7.75)).toDF("id", "grp", "v")
    val spec = graft.model.CdcTableSpec("t", Seq("id", "grp", "v"), "id")
    val log = ChangeLog.assignCdcIds(
      ChangeCapture.finishLogSchema(
        ChangeCapture.captureChanges(before, afterDf, spec)), global = true)

    val maintained = IncrementalAgg.maintain(
      IncrementalAgg.snapshotAgg(before, "grp", "v"), log, "grp", "v")
    val recomputed = IncrementalAgg.snapshotAgg(afterDf, "grp", "v")
    assertSameRows(maintained, recomputed, "synthetic maintenance")
    assert(maintained.filter(col("g_key") === "a").count() == 0, "emptied group must vanish")
    assert(maintained.filter(col("g_key") === "c").count() == 1, "born group must appear")
  }

  test("incremental agg deltas shuffle O(groups): aggregate is partial") {
    // the physical plan must contain a partial hash aggregate below the
    // exchange (map-side combine), so shuffle rows = groups x tasks
    val d = IncrementalAgg.deltas(Fixtures.changeLog(spark, dir), "o_orderpriority", "o_totalprice")
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected hash aggregate, got:\n$plan")
  }

  // ------------------------------------------------------------ KMV sketch

  test("kmv: exact when distinct count below k") {
    import spark.implicits._
    val df = (1 to 50).map(i => ("g", i.toLong)).toDF("grp", "key")
      .unionAll((1 to 50).map(i => ("g", i.toLong)).toDF("grp", "key")) // dup every key
    val out = Sketches.kmvDistinct(df, Seq("grp"), col("key").cast("string"), k = 256)
      .collect()(0)
    assert(out.getAs[Int]("n_sketch") == 50)
    assert(out.getAs[Double]("estimate") == 50.0)
  }

  test("kmv: estimate within 3/sqrt(k-2) of exact at sf0.001") {
    val li = Fixtures.lineitem(spark, dir)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketches.kmvDistinct(li, Seq("l_returnflag"), col("l_partkey").cast("string"), 256)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("estimate")).toMap
    val tol = 3.0 / math.sqrt(254.0)
    exact.foreach { case (g, nd) =>
      val rel = math.abs(est(g) - nd) / nd.toDouble
      assert(rel < tol, s"group $g: exact=$nd est=${est(g)} rel=$rel tol=$tol")
    }
  }

  test("kmv: invariant under repartitioning (merge-order independence)") {
    val li = Fixtures.lineitem(spark, dir)
    val a = Sketches.kmvDistinct(li, Seq("l_returnflag"), col("l_partkey").cast("string"), 64)
    val b = Sketches.kmvDistinct(li.repartition(13, col("l_orderkey")),
      Seq("l_returnflag"), col("l_partkey").cast("string"), 64)
    assertSameRows(a, b, "kmv partitioning invariance")
  }

  test("hll: estimate within 4 standard errors, invariant under repartitioning") {
    val li = Fixtures.lineitem(spark, dir)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = 6
    val m = 1 << b
    val est = Sketches.hllDistinct(li, Seq("l_returnflag"),
        col("l_partkey").cast("string"), b)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("estimate")).toMap
    val tol = 4.0 * 1.04 / math.sqrt(m.toDouble) // ~52% at m=64, 4 sigma
    exact.foreach { case (g, nd) =>
      val rel = math.abs(est(g) - nd) / nd.toDouble
      assert(rel < tol, s"group $g: exact=$nd est=${est(g)} rel=$rel tol=$tol")
    }
    val re = Sketches.hllDistinct(li.repartition(13, col("l_orderkey")),
      Seq("l_returnflag"), col("l_partkey").cast("string"), b)
    assertSameRows(
      Sketches.hllDistinct(li, Seq("l_returnflag"), col("l_partkey").cast("string"), b),
      re, "hll partitioning invariance")
  }

  test("hll: linear-counting branch is exact-ish for tiny sets; nulls contribute nothing") {
    import spark.implicits._
    val df = (1 to 5).map(i => ("g", s"k$i")) // 5 distinct keys, m=64 registers
      .toDF("grp", "key")
      .unionAll(Seq(("g", null.asInstanceOf[String])).toDF("grp", "key"))
    val out = Sketches.hllDistinct(df, Seq("grp"), col("key"), b = 6).collect()(0)
    // 5 distinct values can collide into fewer registers, but never more
    assert(out.getAs[Int]("n_present") <= 5 && out.getAs[Int]("n_present") >= 1)
    // linear counting at this range: m·ln(m/zeros) is within 1 of the truth
    // for any collision pattern of 5 keys in 64 registers
    assert(math.abs(out.getAs[Double]("estimate") - 5.0) < 1.5,
      s"estimate ${out.getAs[Double]("estimate")} too far from 5")
  }

  test("hll: register table is bounded by m per group (partial-agg state)") {
    val li = Fixtures.lineitem(spark, dir)
    // the first aggregation keys on (group, bucket): its output — the only
    // thing that shuffles — cannot exceed groups × m rows
    val m = 64
    val buckets = li
      .select(col("l_returnflag"),
        pmod(PortableHash.hash32(col("l_partkey").cast("string")), lit(m.toLong)).as("b"))
      .groupBy("l_returnflag", "b").count()
    val groups = li.select("l_returnflag").distinct().count()
    assert(buckets.count() <= groups * m)
  }

  test("grid quantiles: invariant under repartitioning, bucket covers the exact quantile") {
    val li = Fixtures.lineitem(spark, dir)
    val ticks = (col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
      .cast("long")
    val a = Sketches.gridQuantiles(li, Seq("l_returnflag"), ticks, 25600L, Seq(25, 50, 90, 99))
    val b = Sketches.gridQuantiles(li.repartition(13, col("l_orderkey")),
      Seq("l_returnflag"), ticks, 25600L, Seq(25, 50, 90, 99))
    assertSameRows(a, b, "grid quantile partitioning invariance")

    // the exact target_rank-th order statistic falls inside the reported
    // bucket: bucket*width <= exact tick < (bucket+1)*width
    val exact = li
      .select(col("l_returnflag"), ticks.as("t"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_returnflag")).orderBy(col("t"))))
    val viol = a.join(exact,
        a("l_returnflag") === exact("l_returnflag") && col("rk") === col("target_rank"))
      .filter(col("t") < col("bucket") * 25600L || col("t") >= col("upper_tick"))
    assert(viol.count() === 0, "exact quantile must lie in the answering bucket")
  }

  test("count-min: never undercounts, table invariant under repartitioning") {
    val li = Fixtures.lineitem(spark, dir)
    val d = 4
    val w = 512 // small table → collisions guaranteed; bound must still hold
    val t1 = Sketches.countMinTable(li, col("l_partkey").cast("string"), d, w)
    val t2 = Sketches.countMinTable(li.repartition(13, col("l_orderkey")),
      col("l_partkey").cast("string"), d, w)
    assert(t1.toSeq === t2.toSeq, "cell table must not depend on partitioning")
    assert(t1.sum === li.count() * d, "each row increments exactly d cells")
    val audit = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_exact"))
      .withColumn("est",
        Sketches.countMinEstimate(t1.toSeq, col("l_partkey").cast("string"), d, w))
    assert(audit.filter(col("est") < col("n_exact")).count() === 0,
      "count-min must never undercount")
    assert(audit.filter(col("est") > col("n_exact")).count() > 0,
      "with w=512 collisions must be visible (sanity that the audit bites)")
  }

  test("kmv set algebra: estimates within error bars, invariant under repartitioning") {
    val li = Fixtures.lineitem(spark, dir)
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val b = li.filter(col("l_orderkey") % 3 === 0)
    val key = col("l_partkey").cast("string")
    val r = Sketches.kmvSetOps(a, key, b, key, k = 256).collect()(0)
    val exactA = a.select("l_partkey").distinct().count().toDouble
    val exactB = b.select("l_partkey").distinct().count().toDouble
    val exactU = a.select("l_partkey").unionByName(b.select("l_partkey"))
      .distinct().count().toDouble
    val exactI = a.select("l_partkey").intersect(b.select("l_partkey")).count().toDouble
    // k=256 → ~6% expected relative error; allow 4 sigma
    def within(est: Double, exact: Double, tol: Double) =
      math.abs(est - exact) / exact < tol
    assert(within(r.getAs[Double]("est_a"), exactA, 0.25), s"est_a=$r exact=$exactA")
    assert(within(r.getAs[Double]("est_b"), exactB, 0.25))
    assert(within(r.getAs[Double]("est_union"), exactU, 0.25))
    assert(within(r.getAs[Double]("est_intersection"), exactI, 0.35))
    // deterministic under repartitioning
    val r2 = Sketches.kmvSetOps(a.repartition(13), key, b.repartition(7), key, 256)
      .collect()(0)
    assert(r.toString === r2.toString)
  }

  test("sketch merge: CMS tables add, bloom words OR — batch-built equals whole-built") {
    // the property that makes both sketches streaming/incremental: a
    // day's sketch merges into the landed sketch without reprocessing
    val li = Fixtures.lineitem(spark, dir)
    val p1 = li.filter(col("l_orderkey") % 3 === 0)
    val p2 = li.filter(col("l_orderkey") % 3 === 1)
    val p3 = li.filter(col("l_orderkey") % 3 === 2)
    val key = col("l_partkey").cast("string")

    val whole = Sketches.countMinTable(li, key, 4, 512)
    val merged = Seq(p1, p2, p3).map(Sketches.countMinTable(_, key, 4, 512))
      .reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
    assert(whole.toSeq === merged.toSeq, "CMS merge = cell-wise add")

    val okey = col("o_orderkey").cast("string")
    val ord = Fixtures.orders(spark, dir).filter(col("o_totalprice") > 300000.0)
    val wWhole = graft.ext.BloomFilter.build(ord, okey, 1 << 14, 5)
    val wMerged = Seq(col("o_orderkey") % 2 === 0, col("o_orderkey") % 2 === 1)
      .map(f => graft.ext.BloomFilter.build(ord.filter(f), okey, 1 << 14, 5))
      .reduce((a, b) => a.zip(b).map { case (x, y) => x | y })
    assert(wWhole.toSeq === wMerged.toSeq, "bloom merge = word-wise OR")
  }

  // ------------------------------------------- sliding / anomaly / cube

  test("sliding windows: window() expand equals explicit slide arithmetic") {
    val ev = Fixtures.events(spark, dir)
    val got = graft.ext.EventAnalytics.slidingCounts(ev, "ts", "event_type",
      "1 hour", "15 minutes")
    // manual formulation: explode i in 0..3, window start = floor15(ts) - i*15min
    val manual = ev
      .select(col("ts"), col("event_type"), col("value"),
        explode(sequence(lit(0), lit(3))).as("i"))
      .withColumn("ws", timestamp_millis(
        (floor(unix_millis(col("ts")) / 900000L) - col("i")) * 900000L))
      .groupBy(col("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("sum_value"))
      .select(date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
    assertSameRows(got, manual, "sliding windows")
  }

  test("anomaly z-scores agree with stddev_samp within 1e-9") {
    val ev = Fixtures.events(spark, dir)
    val byDay = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = byDay.groupBy(col("user_id").as("u"))
      .agg(avg("n").as("m"), stddev_samp("n").as("sd"), count(lit(1)).as("days"))
    val expected = byDay.join(stats, col("user_id") === col("u"))
      .filter(col("days") >= 7 && col("sd") > 0)
      .withColumn("z_ref", (col("n") - col("m")) / col("sd"))
      .filter(abs(round(col("z_ref"), 6)) > 2.0)
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"), col("z_ref"))
    val got = graft.ext.EventAnalytics.dailyCountAnomalies(ev, "ts", "user_id", 7, 2.0)
    val joined = got.join(expected, Seq("user_id", "day"), "full_outer")
    assert(joined.filter(col("z").isNull || col("z_ref").isNull).count() == 0,
      "same outlier set as the stddev_samp formulation")
    // the operator rounds z to 6 dp by contract (EventAnalytics.dailyCountAnomalies);
    // round the reference identically before the 1e-9 comparison
    assert(joined.filter(abs(col("z") - round(col("z_ref"), 6)) > 1e-9).count() == 0)
  }

  test("cube: subtotal rows are consistent with detail rows") {
    val cube = SparkEntry.queries("orders_cube")(spark, dir).cache()
    val detail = cube.filter(col("gid") === 0)
      .agg(sum("n").as("n"), round(sum("sum_price"), 2).as("p")).collect()(0)
    val total = cube.filter(col("gid") === 3)
      .select(col("n"), round(col("sum_price"), 2).as("p")).collect()(0)
    assert(detail.getLong(0) == total.getLong(0))
    assert(detail.getDouble(1) == total.getDouble(1))
    cube.unpersist()
  }

  test("kmv sketch equals window-based reference formulation") {
    import org.apache.spark.sql.expressions.Window
    val k = 64
    val li = Fixtures.lineitem(spark, dir)
    val w = Window.partitionBy("l_returnflag").orderBy("hv")
    val ref = li.select(col("l_returnflag"),
        PortableHash.hash32(col("l_partkey").cast("string")).as("hv"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy("l_returnflag")
      .agg(max("hv").as("kth_min_ref"), count(lit(1)).cast("int").as("n_ref"))
    val got = Sketches.kmvDistinct(li, Seq("l_returnflag"), col("l_partkey").cast("string"), k)
    val joined = got.join(ref, "l_returnflag")
    assert(joined.filter(col("kth_min") =!= col("kth_min_ref") ||
      col("n_sketch") =!= col("n_ref")).count() == 0)
  }
}

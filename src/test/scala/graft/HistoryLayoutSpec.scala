package graft

import graft.capture.ChangeCapture
import graft.ext.{Corpus, Layout}
import graft.log.{ChangeLog, History}
import graft.model.CdcTableSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Specs for the history tier (SCD2 / log compaction / snapshot-as-of),
  * the Z-order layout operator, and weighted hash sampling.
  */
class HistoryLayoutSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  private val spec = CdcTableSpec("t", Seq("id", "v"), "id")

  /** Hand-built canonical log: id → ordered (cdc_id, op, newV). */
  private def mkLog(rows: Seq[(Long, Long, String, Option[Long])]): DataFrame = {
    val df = rows.toDF("cdc_id", "record_id", "operation", "nv")
    df.select(
      col("cdc_id"), col("operation"), col("record_id"),
      lit(null).cast("struct<id:bigint,v:bigint>").as("old_data"),
      when(col("operation") === "DELETE", lit(null))
        .otherwise(struct(col("record_id").as("id"), col("nv").as("v"))).as("new_data"),
      lit(Fixtures.T0).as("changed_at"),
      lit(0).as("synced"),
      lit(null).cast("timestamp").as("sync_timestamp"))
  }

  // ---------------------------------------------------------------- SCD2

  test("scd2: version chains, delete-closed keys, inserts, untouched keys") {
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
    // key 1: base -> U(v=11, id 5) -> U(v=12, id 9)
    // key 2: base -> D(id 6)
    // key 3: untouched
    // key 4: I(v=40, id 7)
    val log = mkLog(Seq(
      (5L, 1L, "UPDATE", Some(11L)),
      (9L, 1L, "UPDATE", Some(12L)),
      (6L, 2L, "DELETE", None),
      (7L, 4L, "INSERT", Some(40L))))
    val h = History.scd2(base, log, spec)
      .select("record_id", "v", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Long, Option[Long], Int)].collect().sortBy(r => (r._1, r._3))
    assert(h.toSeq == Seq(
      (1L, 10L, 0L, Some(5L), 0),
      (1L, 11L, 5L, Some(9L), 0),
      (1L, 12L, 9L, None, 1),
      (2L, 20L, 0L, Some(6L), 0), // closed by the delete; no current row
      (3L, 30L, 0L, None, 1),
      (4L, 40L, 7L, None, 1)))
  }

  test("coalesceVersions: equal-value adjacents merge; delete gaps never merge") {
    val spec2 = CdcTableSpec("t", Seq("id", "v", "w"), "id")
    def mk(rows: Seq[(Long, Long, String, Option[(Long, Long)])]): DataFrame = {
      val df = rows.map { case (c, r, o, nv) =>
        (c, r, o, nv.map(_._1), nv.map(_._2))
      }.toDF("cdc_id", "record_id", "operation", "nv", "nw")
      df.select(
        col("cdc_id"), col("operation"), col("record_id"),
        lit(null).cast("struct<id:bigint,v:bigint,w:bigint>").as("old_data"),
        when(col("operation") === "DELETE", lit(null))
          .otherwise(struct(col("record_id").as("id"), col("nv").as("v"),
            col("nw").as("w"))).as("new_data"),
        lit(Fixtures.T0).as("changed_at"), lit(0).as("synced"),
        lit(null).cast("timestamp").as("sync_timestamp"))
    }
    val base = Seq((1L, 10L, 100L), (2L, 20L, 200L)).toDF("id", "v", "w")
    // key 1: only w churns at 5,7 (v stays 10) -> v-track is ONE interval [0, inf)
    //        but w-track has three
    // key 2: delete at 4, re-insert SAME v at 6 -> gap must keep two islands
    val log = mk(Seq(
      (5L, 1L, "UPDATE", Some((10L, 101L))),
      (7L, 1L, "UPDATE", Some((10L, 102L))),
      (4L, 2L, "DELETE", None),
      (6L, 2L, "INSERT", Some((20L, 200L)))))
    val h = History.scd2(base, log, spec2)
    val vTrack = History.coalesceVersions(h, Seq("v"))
      .select("record_id", "v", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Long, Option[Long], Int)].collect().sortBy(r => (r._1, r._3))
    assert(vTrack.toSeq == Seq(
      (1L, 10L, 0L, None, 1),       // three versions, unchanged v -> one island
      (2L, 20L, 0L, Some(4L), 0),   // closed by delete
      (2L, 20L, 6L, None, 1)),      // re-insert: same value, NOT merged (gap)
      s"got ${vTrack.toSeq}")
    val wTrack = History.coalesceVersions(h, Seq("w"))
      .filter(col("record_id") === 1L)
    assert(wTrack.count() == 3, "w churns every version: nothing merges")
  }

  test("alignHistories of the attribute timelines reconstructs the combined history") {
    val combined = Fixtures.changeLog(spark, dir)
      .unionByName(Fixtures.secondBatchLog(spark, dir))
    val hist = History.scd2(
      Fixtures.orders(spark, dir).select(Fixtures.OrdersSpec.columns.map(col): _*),
      combined, Fixtures.OrdersSpec)
    val st = History.coalesceVersions(hist, Seq("o_orderstatus"))
    val pr = History.coalesceVersions(hist, Seq("o_totalprice"))
    val aligned = History.alignHistories(st, pr,
      Seq("o_orderstatus"), Seq("o_totalprice"))
    // every fixture change touches status or price, so align(st, pr) = hist
    assertSameRows(
      aligned.select("record_id", "o_orderstatus", "o_totalprice",
        "valid_from", "valid_to", "is_current"),
      hist.select("record_id", "o_orderstatus", "o_totalprice",
        "valid_from", "valid_to", "is_current"),
      "align reconstructs")
    // and the tracks are genuinely coarser: batch-2 touches only status
    assert(pr.count() < hist.count(), "price track must coalesce batch-2 churn")
  }

  test("dwell: total survives sums past Long.MaxValue (decimal accumulator)") {
    // three open intervals at a horizon of ~2^62: a BIGINT sum of the
    // dwells (3 × (2^62 - small)) overflows a long — the sf10 regression
    // class (15 M open orders × 2^41 horizon)
    val horizon = Long.MaxValue / 2
    val hist = Seq(
      ("A", 0L, Option.empty[Long]),
      ("A", 1L, Option.empty[Long]),
      ("A", 2L, Option.empty[Long]),
      ("B", 3L, Some(10L)))
      .toDF("st", "valid_from", "valid_to")
    val out = History.dwell(hist, Seq("st"), horizon)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2)))).toMap
    val expectA = BigDecimal(horizon) * 3 - 3 // (h-0)+(h-1)+(h-2)
    assert(out("A")._1 === 3L)
    assert(BigDecimal(out("A")._2) === expectA,
      s"exact decimal total expected, got ${out("A")._2}")
    assert(BigDecimal(out("B")._2) === BigDecimal(7))
  }

  test("versionAt: boundary semantics against the scd2 fixture") {
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
    val log = mkLog(Seq(
      (5L, 1L, "UPDATE", Some(11L)),
      (9L, 1L, "UPDATE", Some(12L)),
      (6L, 2L, "DELETE", None),
      (7L, 4L, "INSERT", Some(40L))))
    val h = History.scd2(base, log, spec)
    def at(p: Long) = History.versionAt(h, p)
      .select("record_id", "v").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(at(0L) == Seq((1L, 10L), (2L, 20L), (3L, 30L)), "position 0 = base")
    // at 5: key 1 flips to v=11 exactly AT its valid_from; key 2 still alive
    assert(at(5L) == Seq((1L, 11L), (2L, 20L), (3L, 30L)))
    // at 6: key 2's delete closes it AT position 6 (valid_to > pos fails)
    assert(at(6L) == Seq((1L, 11L), (3L, 30L)))
    // at 9+: final state — key 4 inserted, key 1 at v=12
    assert(at(100L) == Seq((1L, 12L), (3L, 30L), (4L, 40L)))
    // lookup equals the reconstruct path at every probed position
    for (p <- Seq(0L, 5L, 6L, 100L)) {
      val rec = History.snapshotAsOf(base, log, spec, p)
        .select("id", "v").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(at(p) == rec, s"versionAt($p) != snapshotAsOf($p)")
    }
  }

  test("scd2: exactly the live keys have a current version, and it equals the applied state") {
    val base = Fixtures.orders(spark, dir).select(Fixtures.OrdersSpec.columns.map(col): _*)
    val log = Fixtures.changeLog(spark, dir)
    val hist = History.scd2(base, log, Fixtures.OrdersSpec)
    val current = hist.filter(col("is_current") === 1)
      .select(col("record_id").as("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val applied = graft.apply.ChangeApplier
      .applyChanges(base, log, Fixtures.OrdersSpec)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    assertSameRows(current, applied, "current SCD2 slice vs applied snapshot")
  }

  // ------------------------------------------------------------ compaction

  test("compactLog: net-effect rules, including insert-then-delete elision") {
    val log = mkLog(Seq(
      (1L, 10L, "INSERT", Some(1L)), (4L, 10L, "UPDATE", Some(2L)),
      (8L, 10L, "DELETE", None), // I -> U -> D: never existed
      (2L, 11L, "UPDATE", Some(5L)), (6L, 11L, "DELETE", None), // U -> D: DELETE
      (3L, 12L, "INSERT", Some(7L)), (7L, 12L, "UPDATE", Some(8L)), // I -> U: INSERT, last image
      (5L, 13L, "UPDATE", Some(9L)), (9L, 13L, "UPDATE", Some(10L)), // U -> U: UPDATE, last image
      (10L, 14L, "DELETE", None))) // lone D: DELETE
    val c = History.compactLog(log)
      .select(col("record_id"), col("operation"), col("new_data.v").as("v"),
        col("n_changes"), col("first_id"), col("last_id"))
      .as[(Long, String, Option[Long], Long, Long, Long)].collect().sortBy(_._1)
    assert(c.toSeq == Seq(
      (11L, "DELETE", None, 2L, 2L, 6L),
      (12L, "INSERT", Some(8L), 2L, 3L, 7L),
      (13L, "UPDATE", Some(10L), 2L, 5L, 9L),
      (14L, "DELETE", None, 1L, 10L, 10L)))
  }

  test("compactLog then apply equals applying the full log") {
    val base = Fixtures.orders(spark, dir).select(Fixtures.OrdersSpec.columns.map(col): _*)
    val combined = Fixtures.changeLog(spark, dir)
      .unionByName(Fixtures.secondBatchLog(spark, dir))
    val full = graft.apply.ChangeApplier.applyChanges(base, combined, Fixtures.OrdersSpec)
    // compacted log lacks changed_at/synced bookkeeping; re-shape to canonical
    val compact = History.compactLog(combined).select(
      col("last_id").as("cdc_id"), col("operation"), col("record_id"),
      lit(null).cast(combined.schema("old_data").dataType).as("old_data"),
      col("new_data"),
      lit(Fixtures.T0).as("changed_at"), lit(0).as("synced"),
      lit(null).cast("timestamp").as("sync_timestamp"))
    val viaCompact = graft.apply.ChangeApplier.applyChanges(base, compact, Fixtures.OrdersSpec)
    assertSameRows(viaCompact, full, "apply(compact(log)) vs apply(log)")
  }

  test("compactLog is one partial-combined aggregate — no window, one exchange") {
    val combined = Fixtures.changeLog(spark, dir)
      .unionByName(Fixtures.secondBatchLog(spark, dir))
    val plan = History.compactLog(combined).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"compaction must not use a window:\n$plan")
    // struct-valued max_by falls back to SortAggregate, but the partial
    // (map-side) phase must still run BELOW the single exchange — that is
    // the O(keys)-shuffle property the 100 TB argument rests on
    assert(plan.contains("partial_max_by"), s"expected map-side combine:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1, s"expected one shuffle:\n$plan")
  }

  // --------------------------------------------------------- snapshot-as-of

  test("snapshotAsOf: position 0 is the base; max position is the full apply") {
    val base = Fixtures.orders(spark, dir).select(Fixtures.OrdersSpec.columns.map(col): _*)
    val log = Fixtures.changeLog(spark, dir)
    assertSameRows(History.snapshotAsOf(base, log, Fixtures.OrdersSpec, 0L), base,
      "as-of 0 (before any change)")
    val full = graft.apply.ChangeApplier.applyChanges(base, log, Fixtures.OrdersSpec)
    assertSameRows(History.snapshotAsOf(base, log, Fixtures.OrdersSpec, Long.MaxValue),
      full, "as-of end of log")
  }

  // ---------------------------------------------------------------- Z-order

  /** Reference bit-interleave: bit i of x → 2i, bit i of y → 2i+1. */
  private def refZ(x: Int, y: Int): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((x >> i) & 1).toLong << (2 * i)
      z |= ((y >> i) & 1).toLong << (2 * i + 1)
    }
    z
  }

  test("zOrderKey2 equals the bitwise reference interleave") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.tabulate(200)(_ => (rnd.nextInt(65536), rnd.nextInt(65536))) ++
      Seq((0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2))
    val got = pts.toDF("x", "y")
      .select(Layout.zOrderKey2(col("x"), col("y")).as("z"))
      .as[Long].collect()
    assert(got.toSeq == pts.map { case (x, y) => refZ(x, y) },
      "spread-mask interleave must match the per-bit reference")
  }

  test("writeZOrdered: per-file spans shrink on BOTH dimensions vs a hash layout") {
    val raw = Fixtures.orders(spark, dir).select(
      col("o_orderkey"),
      col("o_custkey").as("cx"),
      expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000").as("dy"))
    // dimension balance: normalize both dims onto the 16-bit lane from
    // their actual bounds (at scale these come from table stats)
    val Array(b) = raw.agg(min("cx"), max("cx"), min("dy"), max("dy")).collect()
    val o = raw.select(
      col("o_orderkey"),
      Layout.normalize16(col("cx"), b.getLong(0), b.getLong(1)).as("zx"),
      Layout.normalize16(col("dy"), b.getLong(2), b.getLong(3)).as("zy"))
    val out = Fixtures.scratchDir("zorder_spec", dir)
    Layout.writeZOrdered(o, Layout.zOrderKey2(col("zx"), col("zy")), numFiles = 8,
      path = s"$out/z")
    o.repartition(8).write.mode("overwrite").parquet(s"$out/h")

    def meanSpan(path: String): (Double, Double) = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max("zx") - min("zx"), max("zy") - min("zy"))
          .as[(Long, Long)].collect().head
        (r._1.toDouble, r._2.toDouble)
      }
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }
    val (zx, zy) = meanSpan(s"$out/z")
    val (hx, hy) = meanSpan(s"$out/h")
    // hash layout: every file spans ~the full range of both dims. Z-order
    // must cut the mean per-file span of BOTH dims — that shrink IS the
    // min/max data-skipping win.
    assert(zx < hx * 0.8 && zy < hy * 0.8,
      s"z-order spans ($zx, $zy) should be well under hash spans ($hx, $hy)")
  }

  // -------------------------------------------------------- weighted sample

  test("weightedSampleByHash: 0 keeps none, 1 keeps all, monotone in weight") {
    val docs = Fixtures.documents(spark, dir)
    val n = docs.count()
    assert(Corpus.weightedSampleByHash(docs, "doc_id", lit(0.0), "s").count() == 0)
    assert(Corpus.weightedSampleByHash(docs, "doc_id", lit(1.0), "s").count() == n)
    // clamping: out-of-range weights behave like the bounds
    assert(Corpus.weightedSampleByHash(docs, "doc_id", lit(7.5), "s").count() == n)
    assert(Corpus.weightedSampleByHash(docs, "doc_id", lit(-3.0), "s").count() == 0)
    val lo = Corpus.weightedSampleByHash(docs, "doc_id",
      col("n_chars").cast("double") / 4000.0, "s").select("doc_id")
    val hi = Corpus.weightedSampleByHash(docs, "doc_id",
      col("n_chars").cast("double") / 2000.0, "s").select("doc_id")
    assert(lo.exceptAll(hi).count() == 0,
      "raising the weight must keep a superset (same hash, higher threshold)")
    val nLo = lo.count(); val nHi = hi.count()
    assert(nLo < nHi && nHi < n, s"expected 0 < $nLo < $nHi < $n strata")
  }
  // ---------------------------------------------------- k-dim z-order

  /** Per-bit reference: bit i of dim d at position i*k + d. */
  private def refZk(vs: Seq[Int]): Long = {
    val k = vs.size
    var z = 0L
    for (d <- vs.indices; i <- 0 until 16)
      if (((vs(d) >> i) & 1) == 1) z |= 1L << (i * k + d)
    z
  }

  test("zOrderKey at 3 and 4 dims equals the per-bit reference interleave") {
    val rnd = new scala.util.Random(7)
    val pts3 = Seq.tabulate(200)(_ =>
      (rnd.nextInt(65536), rnd.nextInt(65536), rnd.nextInt(65536))) ++
      Seq((0, 0, 0), (65535, 65535, 65535), (65535, 0, 0), (0, 65535, 0),
        (0, 0, 65535), (1, 2, 4))
    val got3 = pts3.toDF("x", "y", "w")
      .select(Layout.zOrderKey(Seq(col("x"), col("y"), col("w"))).as("z"))
      .as[Long].collect()
    assert(got3.toSeq == pts3.map { case (x, y, w) => refZk(Seq(x, y, w)) },
      "3-dim magic-mask interleave must match the per-bit reference")
    val pts4 = Seq.tabulate(200)(_ => (rnd.nextInt(65536), rnd.nextInt(65536),
      rnd.nextInt(65536), rnd.nextInt(65536))) ++
      Seq((0, 0, 0, 0), (65535, 65535, 65535, 65535), (1, 2, 4, 8))
    val got4 = pts4.toDF("x", "y", "w", "v")
      .select(Layout.zOrderKey(
        Seq(col("x"), col("y"), col("w"), col("v"))).as("z"))
      .as[Long].collect()
    assert(got4.toSeq == pts4.map { case (x, y, w, v) => refZk(Seq(x, y, w, v)) },
      "4-dim double-spread interleave must match the per-bit reference")
    // 2-dim general form agrees with the existing zOrderKey2
    val z2a = pts3.map { case (x, y, _) => (x, y) }.toDF("x", "y")
      .select(Layout.zOrderKey(Seq(col("x"), col("y"))).as("z")).as[Long].collect()
    val z2b = pts3.map { case (x, y, _) => (x, y) }.toDF("x", "y")
      .select(Layout.zOrderKey2(col("x"), col("y")).as("z")).as[Long].collect()
    assert(z2a.toSeq == z2b.toSeq)
  }

  test("3-column clustered compaction: ALL THREE dims skip files, pruned = filtered") {
    import graft.sources.TxTable
    val tdir = java.nio.file.Files.createTempDirectory("z3compact").toString
    // three independent dimensions, each uniform over its own domain
    val rows = spark.range(0, 100000).select(
      (col("id") * 2654435761L % 5000).as("a"),
      (col("id") * 40503L % 3000).as("b"),
      (col("id") * 9973L % 8000).as("c"),
      col("id").as("payload"))
    // unclustered baseline: independent dims make every file span every
    // dim — nothing skips
    TxTable.commit(rows.repartition(64), tdir, "overwrite",
      statsColumns = Seq("a", "b", "c"))
    val hashSnap = TxTable.latest(tdir).get
    TxTable.compact(spark, tdir, targetFiles = 64,
      clusterBy = Seq("a", "b", "c"))
    val snap = TxTable.latest(tdir).get
    assert(snap.files.size >= 32, "enough files for skipping to mean something")
    val total = snap.files.size
    for ((cdim, hi) <- Seq(("a", 5000L), ("b", 3000L), ("c", 8000L))) {
      val lo = hi / 4
      val hi2 = hi / 4 + hi / 10 // a ~10% slice of the dim
      val keptHash = hashSnap.filesOverlapping(cdim, lo, hi2).size
      assert(keptHash > (hashSnap.files.size * 9) / 10,
        s"dim $cdim: hash layout has nothing to skip ($keptHash)")
      val kept = snap.filesOverlapping(cdim, lo, hi2).size
      // z-order skipping is approximate (sampled range boundaries split
      // mid-rectangle); with 2 effective bits per dim at 64 files the
      // ideal keep is ~25% — demand better than 60% on EVERY dim, the
      // property a single-column sort cannot give two of the three
      assert(kept * 10 < total * 6,
        s"dim $cdim: a 10% slice must skip at least 40% of files ($kept/$total)")
      // pruned read = filtered read, value for value
      assertSameRows(
        TxTable.readPruned(spark, tdir, cdim, lo, hi2),
        TxTable.read(spark, tdir).where(col(cdim) >= lo && col(cdim) <= hi2),
        s"dim $cdim")
    }
  }
}

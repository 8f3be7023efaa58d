package graft

import graft.sources.TxTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The `txtable` registered data source ([[graft.sources
  * .TxTableProvider]]): `spark.read.format("txtable")` and SQL over a
  * catalog table must plan Spark's own parquet scan (vectorized reads,
  * pushed filters) while the custom FileIndex consults manifest ranges
  * and Bloom sidecars — the round-10 "efficient read path is the DEFAULT
  * path" directive. Every skipping assertion is paired with a
  * value-equality assertion against the unpruned read: skipping must
  * never drop data.
  */
class TxProviderSpec extends SparkSpecBase {

  private lazy val s = spark
  import s.implicits._

  /** 8 range-clustered files over k=0..799, one file per 100-key band,
    * stats on k, blooms on the scattered column `u` (u = k * 7919 %
    * 1000 — overlapping ranges in every file, so only blooms can skip).
    */
  private def buildClustered(): String = {
    val dir = Files.createTempDirectory("txprov").toString
    val df = s.range(0, 800).select(
      col("id").as("k"),
      (col("id") * 7919 % 1000).as("u"),
      concat(lit("name_"), format_string("%04d", col("id"))).as("nm"))
    TxTable.commit(
      df.repartitionByRange(8, col("k")).sortWithinPartitions(col("k")),
      dir, "overwrite", statsColumns = Seq("k", "nm"),
      bloomColumns = Seq("u"), bloomBits = 1 << 16)
    dir
  }

  private def load(dir: String): DataFrame =
    s.read.format("txtable").load(dir)

  /** Files actually handed to the scan, read from the executed plan's
    * numFiles metric (the plan-level proof that skipping happened).
    */
  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    val scans = fileScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
    scans.map(_.metrics("numFiles").value).sum
  }

  /** The exact skip target: manifest files whose recorded long range
    * for `c` intersects [lo, hi] (repartitionByRange samples split
    * points, so band widths are approximate — the manifest, not an
    * assumed layout, defines correct skipping).
    */
  private def overlapCount(dir: String, c: String, lo: Long, hi: Long): Long =
    TxTable.latest(dir).get.filesOverlapping(c, lo, hi).size.toLong

  test("format read equals the TxTable.read API, including time travel") {
    val dir = Files.createTempDirectory("txprovtt").toString
    TxTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    TxTable.commit(Seq((3L, "c")).toDF("id", "v"), dir, "append")
    assertSameRows(load(dir), TxTable.read(s, dir), "latest")
    assertSameRows(
      s.read.format("txtable").option("versionAsOf", 0).load(dir),
      TxTable.read(s, dir, Some(0L)), "versionAsOf=0")
  }

  test("WHERE on the clustered column skips files by manifest range") {
    val dir = buildClustered()
    val total = TxTable.latest(dir).get.files.size.toLong
    assert(total === 8L)
    val eq = load(dir).where(col("k") === 137L)
    assert(scannedFiles(eq) === overlapCount(dir, "k", 137L, 137L),
      "point predicate must open exactly the overlapping files")
    assert(scannedFiles(eq) <= 2L, "a point probe opens at most a boundary pair")
    assertSameRows(eq, TxTable.read(s, dir).where(col("k") === 137L), "eq")
    val range = load(dir).where(col("k") >= 250L && col("k") < 450L)
    assert(scannedFiles(range) === overlapCount(dir, "k", 250L, 449L),
      "range must open exactly the overlapping files")
    assert(scannedFiles(range) < total, "range must actually skip")
    assertSameRows(range,
      TxTable.read(s, dir).where(col("k") >= 250L && col("k") < 450L), "range")
    // parquet-level pushdown still happens below the file skipping
    val plan = eq.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("k"),
      s"expected parquet pushdown in:\n$plan")
  }

  test("IN, OR, LIKE-prefix and string ranges prune; unknowns keep all") {
    val dir = buildClustered()
    val inExpect =
      (TxTable.latest(dir).get.filesOverlapping("k", 5L, 5L) ++
        TxTable.latest(dir).get.filesOverlapping("k", 505L, 505L)).distinct.size.toLong
    val in = load(dir).where(col("k").isin(5L, 505L))
    assert(scannedFiles(in) === inExpect, "IN must open the union of its bands")
    assert(scannedFiles(in) <= 4L && scannedFiles(in) < 8L)
    assertSameRows(in, TxTable.read(s, dir).where(col("k").isin(5L, 505L)), "in")
    val orExpect =
      (TxTable.latest(dir).get.filesOverlapping("k", 5L, 5L) ++
        TxTable.latest(dir).get.filesOverlapping("k", 700L, 700L)).distinct.size.toLong
    val or = load(dir).where(col("k") === 5L || col("k") === 700L)
    assert(scannedFiles(or) === orExpect, "OR must union the branch keeps")
    val like = load(dir).where(col("nm").startsWith("name_01"))
    assert(scannedFiles(like) ===
      TxTable.latest(dir).get
        .filesOverlappingString("nm", "name_01", "name_01ÿ").size.toLong,
      "prefix must bound to its byte interval")
    assert(scannedFiles(like) < 8L, "prefix must actually skip")
    assertSameRows(like,
      TxTable.read(s, dir).where(col("nm").startsWith("name_01")), "like")
    val strRange = load(dir).where(col("nm") < "name_0100")
    assert(scannedFiles(strRange) ===
      TxTable.latest(dir).get
        .filesOverlappingString("nm", "", "name_0100").size.toLong,
      "string upper bound prunes to the overlapping files")
    assert(scannedFiles(strRange) < 8L, "string upper bound must actually skip")
    assertSameRows(strRange,
      TxTable.read(s, dir).where(col("nm") < "name_0100"), "strRange")
    // a filter shape the translator does not know keeps every file
    val opaque = load(dir).where(col("k") % 97 === 0)
    assert(scannedFiles(opaque) === 8L, "unrecognized predicates keep all files")
    assertSameRows(opaque, TxTable.read(s, dir).where(col("k") % 97 === 0),
      "opaque")
  }

  test("Bloom sidecars skip point probes on the scattered column") {
    val dir = buildClustered()
    // u ranges overlap in every file: range stats cannot skip, blooms can
    val absent = load(dir).where(col("u") === 997L) // 997 not in k*7919%1000 image? verify below
    val absentHits = TxTable.read(s, dir).where(col("u") === 997L).count()
    val scanned = scannedFiles(absent)
    if (absentHits == 0)
      assert(scanned === 0L, "absent key must bloom-skip every file")
    val present = load(dir).where(col("u") === (37L * 7919 % 1000))
    assertSameRows(present,
      TxTable.read(s, dir).where(col("u") === (37L * 7919 % 1000)), "present")
    assert(scannedFiles(present) < 8L,
      "a present key must not open files whose bloom rejects it")
  }

  test("InSet (optimizer-converted large IN lists) prunes soundly") {
    val dir = buildClustered()
    // > spark.sql.optimizer.inSetConversionThreshold (10) values forces
    // the In → InSet conversion, whose values are CATALYST-internal
    // (UTF8String for strings) — the translator must handle both forms
    val longKeys = (0 until 15).map(i => 700L + i) // clustered: 1-2 bands
    val inSetLong = load(dir).where(col("k").isin(longKeys: _*))
    assertSameRows(inSetLong,
      TxTable.read(s, dir).where(col("k").isin(longKeys: _*)), "inset long")
    assert(scannedFiles(inSetLong) < 8L, "a 15-key InSet must still skip")
    val strKeys = (0 until 15).map(i => f"name_${300 + i}%04d")
    val inSetStr = load(dir).where(col("nm").isin(strKeys: _*))
    assertSameRows(inSetStr,
      TxTable.read(s, dir).where(col("nm").isin(strKeys: _*)), "inset string")
    assert(scannedFiles(inSetStr) < 8L,
      "string InSet values (UTF8String) must translate and skip")
  }

  test("pruning soundness sweep: random predicates, pruned ≡ full filter") {
    val dir = buildClustered()
    val rnd = new scala.util.Random(1234)
    val full = TxTable.read(s, dir)
    for (_ <- 1 to 12) {
      val lo = rnd.nextInt(900).toLong - 50L
      val hi = lo + rnd.nextInt(300).toLong
      val shape = rnd.nextInt(5) match {
        case 0 => col("k") === lo
        case 1 => col("k") >= lo && col("k") < hi
        case 2 => col("k") < lo || col("k") > hi
        case 3 => col("u") === (lo % 1000 + 1000) % 1000
        case 4 => col("nm") >= f"name_$lo%04d" && col("k") <= hi
      }
      assertSameRows(load(dir).where(shape), full.where(shape), s"shape $shape")
    }
  }

  test("catalog: CREATE TABLE USING txtable, SQL reads prune, DROP") {
    val dir = buildClustered()
    s.sql("DROP TABLE IF EXISTS tx_cat")
    s.sql(s"CREATE TABLE tx_cat USING txtable LOCATION '$dir'")
    try {
      val viaSql = s.sql("SELECT k, u, nm FROM tx_cat WHERE k = 42")
      assertSameRows(viaSql, TxTable.read(s, dir).where(col("k") === 42L)
        .select("k", "u", "nm"), "sql point read")
      assert(scannedFiles(viaSql) === overlapCount(dir, "k", 42L, 42L),
        "SQL WHERE must prune files too")
      assert(scannedFiles(viaSql) < 8L)
      val agg = s.sql(
        "SELECT count(*) AS n FROM tx_cat WHERE k BETWEEN 100 AND 199")
      assert(agg.collect()(0).getLong(0) === 100L)
      assert(scannedFiles(agg) === overlapCount(dir, "k", 100L, 199L),
        "BETWEEN prunes to its overlapping files")
      assert(scannedFiles(agg) < 8L)
    } finally {
      s.sql("DROP TABLE IF EXISTS tx_cat")
      ()
    }
  }

  test("writer API: modes route to commit; stats/bloom options recorded") {
    val dir = Files.createTempDirectory("txprovw").toString
    val df = s.range(0, 100).select(col("id").as("k"), (col("id") * 3).as("v"))
    df.write.format("txtable").option("statsColumns", "k").save(dir)
    assert(TxTable.versions(dir) === Seq(0L))
    assert(TxTable.latest(dir).get.stats.nonEmpty, "statsColumns honored")
    df.write.format("txtable").mode("append").option("statsColumns", "k").save(dir)
    assert(TxTable.versions(dir) === Seq(0L, 1L))
    assert(load(dir).count() === 200L)
    intercept[IllegalArgumentException] {
      df.write.format("txtable").mode("error").save(dir)
    }
    df.write.format("txtable").mode("ignore").save(dir) // no-op
    assert(TxTable.versions(dir) === Seq(0L, 1L))
    df.write.format("txtable").mode("overwrite").save(dir)
    assert(load(dir).count() === 100L)
  }

  test("INSERT INTO a catalog txtable commits transactionally") {
    val dir = Files.createTempDirectory("txprovins").toString
    TxTable.commit(
      s.range(0, 10).select(col("id").as("k"), (col("id") * 2).as("v")),
      dir, "overwrite", statsColumns = Seq("k"))
    s.sql("DROP TABLE IF EXISTS tx_ins_spec")
    s.sql(s"CREATE TABLE tx_ins_spec USING txtable LOCATION '$dir'")
    try {
      s.sql("INSERT INTO tx_ins_spec VALUES (100, 200), (101, 202)")
      // the insert is a real manifest version, visible to every reader
      assert(TxTable.versions(dir) === Seq(0L, 1L),
        "INSERT must publish a new manifest version")
      assert(TxTable.read(s, dir).count() === 12L,
        "rows must be reader-visible (the default resolution would have " +
          "landed raw parquet outside the manifest — silent loss)")
      // stats carried forward: the new version still skips on k
      assert(TxTable.latest(dir).get.stats.values.exists(_.contains("k")),
        "stats columns survive SQL inserts")
      // no un-manifested parquet polluting the table root
      val rootFiles = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .iterator()
      val stray = Iterator.continually(rootFiles)
        .takeWhile(_.hasNext).map(_.next().getFileName.toString)
        .filter(n => n != "data" && n != "_txlog").toSeq
      assert(stray.isEmpty, s"table root polluted: $stray")
      // INSERT OVERWRITE replaces the snapshot
      s.sql("INSERT OVERWRITE tx_ins_spec VALUES (7, 14)")
      assert(TxTable.read(s, dir).count() === 1L)
      // values are cast to the manifest schema (positional SQL semantics)
      s.sql("INSERT INTO tx_ins_spec SELECT 8, 16")
      assert(s.table("tx_ins_spec").count() === 2L)
    } finally {
      s.sql("DROP TABLE IF EXISTS tx_ins_spec")
      ()
    }
  }

  test("catalog survives additive evolution: stale stored schema reads the full manifest") {
    val dir = Files.createTempDirectory("txprovevo").toString
    TxTable.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    s.sql("DROP TABLE IF EXISTS tx_evo_spec")
    s.sql(s"CREATE TABLE tx_evo_spec USING txtable LOCATION '$dir'")
    try {
      assert(s.table("tx_evo_spec").count() === 1L)
      // additive append evolves the manifest; the catalog's stored
      // schema now lags (a strict prefix)
      TxTable.commit(Seq((2L, "b", 7.5)).toDF("id", "v", "score"), dir, "append")
      s.sql("REFRESH TABLE tx_evo_spec")
      val t = s.table("tx_evo_spec")
      assert(t.columns.toSeq === Seq("id", "v", "score"),
        "the read must expose the FULL manifest schema, not the stale one")
      assert(t.count() === 2L)
      assert(t.where(col("id") === 1L).collect()(0).isNullAt(2),
        "pre-evolution rows read the added column as null")
    } finally {
      s.sql("DROP TABLE IF EXISTS tx_evo_spec")
      ()
    }
  }

  test("declared CREATE TABLE schema must match the manifest") {
    val dir = Files.createTempDirectory("txprovschema").toString
    TxTable.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    s.sql("DROP TABLE IF EXISTS tx_bad")
    val e = intercept[Exception] {
      s.sql(s"CREATE TABLE tx_bad (id INT, v STRING) USING txtable LOCATION '$dir'")
      s.table("tx_bad").collect()
    }
    assert(e.getMessage.contains("manifest"),
      s"expected the manifest-authority error, got: ${e.getMessage}")
    s.sql("DROP TABLE IF EXISTS tx_bad")
  }
}

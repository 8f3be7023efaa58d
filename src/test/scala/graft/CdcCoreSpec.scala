package graft

import graft.apply.ChangeApplier
import graft.capture.{CdcTable, ChangeCapture}
import graft.log.ChangeLog
import graft.model.{CdcConfig, CdcTableSpec}
import graft.monitor.CdcMonitor
import graft.verify.ReplicationVerifier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mirrors the reference's pytest suite
  * (reference: test_cdc_system.py:38-318): setup, the three capture ops,
  * mark-synced, replication, statistics, health report, and the full
  * workflow integration test — re-expressed over DataFrames.
  */
class CdcCoreSpec extends SparkSpecBase {

  private lazy val s = spark
  import s.implicits._

  /** test_table(id, name, value) — reference: test_cdc_system.py:28-34. */
  private val spec = CdcTableSpec("test_table", Seq("id", "name", "value"), "id")

  private def freshTable(rows: Seq[(Long, String, Long)] = Nil): CdcTable =
    CdcTable(rows.toDF("id", "name", "value"), spec)

  // --- test_cdc_setup (reference: test_cdc_system.py:38-48)
  test("setup creates an empty change log with the canonical schema") {
    val t = freshTable()
    assert(t.changeLog.count() === 0)
    val names = t.changeLog.schema.fieldNames.toSeq
    assert(names === Seq("cdc_id", "operation", "record_id", "old_data",
      "new_data", "changed_at", "synced", "sync_timestamp"))
  }

  // --- test_insert_capture (reference: test_cdc_system.py:50-64)
  test("insert is captured with op=INSERT and a new image") {
    val t = freshTable()
    t.insert(Seq((1L, "test1", 100L)).toDF("id", "name", "value"))
    val changes = t.changeLog.collect()
    assert(changes.length === 1)
    val c = t.changeLog.select("operation", "record_id", "new_data.name").head()
    assert(c.getString(0) === "INSERT")
    assert(c.getLong(1) === 1L)
    assert(c.getString(2) === "test1")
    assert(t.changeLog.filter(col("old_data").isNotNull).count() === 0)
  }

  // --- test_update_capture (reference: test_cdc_system.py:66-84)
  test("update is captured with both old and new images") {
    val t = freshTable()
    t.insert(Seq((1L, "test1", 100L)).toDF("id", "name", "value"))
    t.update(col("name") === "test1", Map("value" -> lit(200L)))
    assert(t.changeLog.count() === 2)
    val upd = t.changeLog.filter(col("operation") === "UPDATE")
      .select("old_data.value", "new_data.value").head()
    assert(upd.getLong(0) === 100L)
    assert(upd.getLong(1) === 200L)
  }

  // --- test_delete_capture (reference: test_cdc_system.py:86-103)
  test("delete is captured with the old image preserved") {
    val t = freshTable()
    t.insert(Seq((1L, "test1", 100L)).toDF("id", "name", "value"))
    t.delete(col("name") === "test1")
    assert(t.changeLog.count() === 2)
    val del = t.changeLog.filter(col("operation") === "DELETE")
      .select("old_data.name", "new_data").head()
    assert(del.getString(0) === "test1")
    assert(del.isNullAt(1))
    assert(t.snapshot.count() === 0)
  }

  // --- test_mark_as_synced (reference: test_cdc_system.py:105-121)
  test("markSynced clears the pending set") {
    val t = freshTable()
    t.insert(Seq((1L, "test1", 100L), (2L, "test2", 200L)).toDF("id", "name", "value"))
    val pending = ChangeLog.pendingChanges(t.changeLog)
    assert(pending.count() === 2)
    val marked = ChangeLog.markSynced(t.changeLog, pending.select("cdc_id"))
    assert(ChangeLog.pendingChanges(marked).count() === 0)
    assert(marked.filter(col("sync_timestamp").isNull).count() === 0)
  }

  // --- test_replication (reference: test_cdc_system.py:123-170)
  test("insert replicates end-to-end and is findable in the target") {
    val t = freshTable()
    t.insert(Seq((1L, "source_row", 42L)).toDF("id", "name", "value"))
    val target = Seq.empty[(Long, String, Long)].toDF("id", "name", "value")
    val (newTarget, newLog, applied) =
      ChangeApplier.replicateChanges(target, t.changeLog, spec)
    assert(applied === 1)
    assert(newTarget.filter(col("name") === "source_row").count() === 1)
    assert(ChangeLog.pendingChanges(newLog).count() === 0)
  }

  // --- test_statistics (reference: test_cdc_system.py:172-198)
  test("statistics counts per operation: INSERT=2, UPDATE=1, DELETE=1") {
    val t = freshTable()
    t.insert(Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("id", "name", "value"))
    t.update(col("id") === 1, Map("value" -> lit(10L)))
    t.delete(col("id") === 2)
    val stats = CdcMonitor.statistics(t.changeLog)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats === Map("INSERT" -> 2L, "UPDATE" -> 1L, "DELETE" -> 1L))
  }

  // --- test_health_report (reference: test_cdc_system.py:225-240)
  test("health report has totals and classification") {
    val t = freshTable()
    t.insert(Seq((1L, "a", 1L)).toDF("id", "name", "value"))
    val r = CdcMonitor.healthReportRow(t.changeLog, CdcConfig())
    assert(r.keySet === Set("total_changes", "pending_changes",
      "synced_changes", "health", "timestamp"))
    assert(r("pending_changes").asInstanceOf[Long] > 0)
    assert(r("health") === "healthy")
  }

  // empty-log classification: SUM over zero rows is SQL NULL, and an
  // unguarded NULL < threshold would fall through to 'warning' — the
  // reference's 0 < 1000 on an empty table is healthy (cdc_system.py:372)
  test("health report on an empty change log is healthy with zero totals") {
    val t = freshTable()
    val r = CdcMonitor.healthReportRow(t.changeLog, CdcConfig())
    assert(r("total_changes") === 0L)
    assert(r("pending_changes") === 0L)
    assert(r("synced_changes") === 0L)
    assert(r("health") === "healthy")
  }

  // --- print_report rendering (reference: cdc_system.py:378-393)
  test("formatReport renders the reference's report layout") {
    val t = freshTable()
    t.insert(Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("id", "name", "value"))
    t.update(col("id") === 1, Map("value" -> lit(10L)))
    val rendered = CdcMonitor.formatReport(
      t.changeLog, "test_table", CdcConfig(), now = () => "2026-01-01T00:00:00Z")
    val lines = rendered.split("\n").toSeq
    assert(lines.head === "=" * 60)
    assert(lines(1) === "CDC HEALTH REPORT - 2026-01-01T00:00:00Z")
    assert(lines.contains("Table: test_table"))
    assert(lines.contains("Status: HEALTHY"))
    assert(lines.contains("Total Changes: 3"))
    assert(lines.contains("Pending: 3"))
    assert(lines.contains("Synced: 0"))
    // present ops in enum order, absent DELETE omitted
    val opIdx = lines.indexOf("By Operation:")
    assert(lines(opIdx + 1) === "  INSERT: 2 total, 2 pending")
    assert(lines(opIdx + 2) === "  UPDATE: 1 total, 1 pending")
    assert(!rendered.contains("DELETE"))
    assert(lines.last === "=" * 60)
  }

  test("formatReport flips to WARNING past the pending threshold") {
    val t = freshTable()
    t.insert((1L to 5L).map(i => (i, s"n$i", i)).toDF("id", "name", "value"))
    val rendered = CdcMonitor.formatReport(
      t.changeLog, "test_table", CdcConfig(healthPendingThreshold = 5))
    assert(rendered.contains("Status: WARNING"))
  }

  // --- test_full_cdc_workflow (reference: test_cdc_system.py:244-318)
  test("full workflow: orders inserts + update replicate correctly") {
    val ordersSpec = CdcTableSpec("orders", Seq("id", "customer", "amount", "status"), "id")
    val t = CdcTable(
      Seq.empty[(Long, String, Double, String)].toDF("id", "customer", "amount", "status"),
      ordersSpec)
    t.insert(Seq((1L, "John Doe", 99.99, "pending"),
      (2L, "Jane Smith", 149.99, "pending")).toDF("id", "customer", "amount", "status"))
    var target = Seq.empty[(Long, String, Double, String)].toDF("id", "customer", "amount", "status")
    var log = t.changeLog
    val (t1, l1, n1) = ChangeApplier.replicateChanges(target, log, ordersSpec)
    assert(n1 === 2)
    assert(t1.count() === 2)

    t.update(col("customer") === "John Doe", Map("status" -> lit("completed")))
    // new pending changes only (the first batch is synced in l1's lineage;
    // here we re-read the table's log and re-mark, mirroring the reference's
    // second replicate_changes call)
    val l1b = ChangeLog.markSynced(t.changeLog, l1.filter(col("synced") === 1).select("cdc_id"))
    val (t2, _, n2) = ChangeApplier.replicateChanges(t1, l1b, ordersSpec)
    assert(n2 === 1)
    val updated = t2.filter(col("customer") === "John Doe").select("status").head().getString(0)
    assert(updated === "completed")
    assert(ReplicationVerifier.fullyReplicated(t.snapshot, t2))
  }

  // --- snapshot-diff capture legs (SURVEY S4-S6) directly
  test("captureChanges classifies insert/update/delete with reference null pattern") {
    val before = Seq((1L, "a", 1L), (2L, "b", 2L), (3L, "c", 3L)).toDF("id", "name", "value")
    val after = Seq((2L, "b", 2L), (3L, "c2", 3L), (4L, "d", 4L)).toDF("id", "name", "value")
    val d = ChangeCapture.captureChanges(before, after, spec)
      .select("operation", "record_id", "old_data.name", "new_data.name")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSet
    assert(d === Set(
      ("DELETE", 1L, "a", null),
      ("UPDATE", 3L, "c", "c2"),
      ("INSERT", 4L, null, "d")))
  }

  test("captureChanges suppresses no-op updates by default, keeps them on request") {
    val before = Seq((1L, "a", 1L)).toDF("id", "name", "value")
    val same = Seq((1L, "a", 1L)).toDF("id", "name", "value")
    assert(ChangeCapture.captureChanges(before, same, spec).count() === 0)
    assert(ChangeCapture.captureChanges(before, same, spec, suppressNoOps = false).count() === 1)
  }

  test("json image round-trip preserves values (F1/F2)") {
    val t = freshTable()
    t.insert(Seq((7L, "json_row", 77L)).toDF("id", "name", "value"))
    val rowSchema = t.snapshot.schema
    val rt = ChangeCapture.parseJsonImages(
      ChangeCapture.withJsonImages(t.changeLog), rowSchema)
    val r = rt.select("new_data.id", "new_data.name", "new_data.value").head()
    assert((r.getLong(0), r.getString(1), r.getLong(2)) === ((7L, "json_row", 77L)))
  }

  test("partitionValid quarantines malformed changes instead of skipping silently") {
    val t = freshTable()
    t.insert(Seq((1L, "good", 1L)).toDF("id", "name", "value"))
    val good = t.changeLog
    val bad = good
      .withColumn("operation", lit("INSERT"))
      .withColumn("new_data", lit(null).cast(good.schema("new_data").dataType))
      .unionByName(good.withColumn("operation", lit("NOPE")))
    val (valid, quarantined) = ChangeApplier.partitionValid(good.unionByName(bad))
    assert(valid.count() === 1)
    assert(quarantined.count() === 2)
  }

  test("CdcConfig.fromEnv loads reference env vars with fallbacks (S11)") {
    val c = CdcConfig.fromEnv(Map(
      "CDC_BATCH_SIZE" -> "250", "CDC_SYNC_INTERVAL" -> "7",
      "CDC_STRATEGY" -> "timestamp", "CDC_MAX_RETRIES" -> "not-a-number"))
    assert(c.batchSize === 250)
    assert(c.syncIntervalSeconds === 7)
    assert(c.cdcStrategy === "timestamp")
    assert(c.maxRetries === 3) // malformed → default
    assert(CdcConfig.fromEnv(Map.empty) === CdcConfig())
  }

  test("version-strategy capture sees rows above the version watermark") {
    val vspec = CdcTableSpec("t", Seq("id", "name", "ver"), "id")
    val target = Seq((1L, "old", 3L), (2L, "keep", 2L)).toDF("id", "name", "ver")
    val source = Seq((1L, "new", 7L), (2L, "keep", 2L), (3L, "ins", 6L))
      .toDF("id", "name", "ver")
    val d = ChangeCapture.captureByVersion(source, target, vspec, "ver", lastVersion = 5L)
      .select("operation", "record_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(d === Set(("UPDATE", 1L), ("INSERT", 3L)))
  }

  test("timestamp-strategy capture sees inserts+updates, not deletes") {
    val ts0 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2025-06-01 00:00:00")
    val tspec = CdcTableSpec("t", Seq("id", "name", "updated_at"), "id")
    val target = Seq((1L, "old", ts0), (2L, "keep", ts0)).toDF("id", "name", "updated_at")
    val source = Seq((1L, "new", ts1), (2L, "keep", ts0), (3L, "ins", ts1))
      .toDF("id", "name", "updated_at")
    val d = ChangeCapture.captureByTimestamp(source, target, tspec, "updated_at",
        lit(java.sql.Timestamp.valueOf("2025-03-01 00:00:00")))
      .select("operation", "record_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(d === Set(("UPDATE", 1L), ("INSERT", 3L)))
  }

  test("merge strategy composes partial images; equals last-write-wins on full images") {
    import graft.model.ConflictStrategy
    val log = Seq(
      // key 1: full UPDATE then partial UPDATE (value only) → name from
      // change 1, value from change 2
      (1L, "UPDATE", 1L, "alice", Option(10L)),
      (2L, "UPDATE", 1L, null: String, Option(20L)),
      // key 2: full UPDATE then DELETE → delete wins, null image
      (3L, "UPDATE", 2L, "bob", Option(5L)),
      (4L, "DELETE", 2L, null: String, Option.empty[Long]),
      // key 3: single full image → unchanged
      (5L, "INSERT", 3L, "carol", Option(7L)))
      .toDF("cdc_id", "operation", "record_id", "n_name", "n_value")
      .withColumn("new_data",
        when(col("operation") === "DELETE",
          lit(null).cast("struct<name:string,value:bigint>"))
          .otherwise(struct(col("n_name").as("name"), col("n_value").as("value"))))
      .drop("n_name", "n_value")

    val merged = ChangeApplier.dedupToLatest(log, ConflictStrategy.Merge)
      .select(col("record_id"), col("operation"),
        col("new_data.name"), col("new_data.value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.get(3))).toSet
    assert(merged === Set(
      (1L, "UPDATE", "alice", 20L), // partial composes
      (2L, "DELETE", null, null),   // delete wins
      (3L, "INSERT", "carol", 7L)))

    // full images → merge degenerates to last-write-wins
    val full = log.filter(col("cdc_id") =!= 2L)
    val a = ChangeApplier.dedupToLatest(full, ConflictStrategy.Merge)
      .select("record_id", "operation", "new_data").collect().map(_.toString).toSet
    val b = ChangeApplier.dedupToLatest(full, ConflictStrategy.LastWriteWins)
      .select("record_id", "operation", "new_data").collect().map(_.toString).toSet
    assert(a === b)

    // manual strategy: only unambiguous (single-change) keys pass; the
    // conflicting keys surface via splitConflicts for resolution
    val manual = ChangeApplier.dedupToLatest(log, graft.model.ConflictStrategy.Manual)
      .select("record_id").collect().map(_.getLong(0)).toSet
    assert(manual === Set(3L)) // keys 1 and 2 each have two changes
    val (_, conflicts) = ChangeApplier.splitConflicts(log)
    assert(conflicts.select("record_id").distinct().collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L))
    assert(conflicts.count() === 4) // every conflicting change retained
  }

  test("schema evolution: v1 JSON images decode under a v2 spec with nulls for the new column") {
    // the JSON interop boundary makes adding a column non-breaking: old
    // log entries simply lack the key, and from_json yields null — the
    // same contract the reference's json.loads path gives for free
    val specV2 = CdcTableSpec("test_table",
      Seq("id", "name", "value", "tier"), "id")
    val t1 = freshTable(Seq((1L, "alice", 10L)))
    t1.insert(Seq((2L, "bob", 5L)).toDF("id", "name", "value"))
    val v1Json = ChangeCapture.withJsonImages(t1.changeLog)

    // a v2-era change carries the new column
    val v2Rows = Seq((3L, "carol", 7L, "gold")).toDF("id", "name", "value", "tier")
    val t2 = CdcTable(
      Seq.empty[(Long, String, Long, String)].toDF("id", "name", "value", "tier"),
      specV2)
    t2.insert(v2Rows)
    val v2Json = ChangeCapture.withJsonImages(t2.changeLog)

    val v2Schema = v2Rows.schema
    val decoded = ChangeCapture.parseJsonImages(
      v1Json.unionByName(v2Json, allowMissingColumns = true), v2Schema)
    val rows = decoded
      .select(col("record_id"), col("new_data.name"), col("new_data.tier"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rows === Set((2L, "bob", null), (3L, "carol", "gold")),
      "old images decode with null for the added column; new images carry it")

    // and the evolved log applies onto a v2 target
    val target = Seq((1L, "alice", 10L, null.asInstanceOf[String]))
      .toDF("id", "name", "value", "tier")
    val applied = ChangeApplier.applyChanges(target, decoded, specV2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(applied === Seq((1L, null), (2L, null), (3L, "gold")))
  }
}

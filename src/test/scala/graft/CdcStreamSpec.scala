package graft

import graft.capture.{CdcTable, DemoWorkload}
import graft.log.ChangeLog
import graft.monitor.CdcMonitor
import graft.streaming.CdcStream
import graft.verify.ReplicationVerifier
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end streaming parity with the reference's continuous-sync demo
  * (reference: example_usage.py:168-233): replay the demo workload
  * (10 inserts, 5 updates, 2 deletes), stream the change log through
  * foreachBatch replication with an AvailableNow drain, and assert
  * source ≡ target plus the statistics {INSERT:10, UPDATE:5, DELETE:2}.
  */
class CdcStreamSpec extends SparkSpecBase {

  private lazy val s = spark

  test("demo workload streams to a fully replicated target") {
    val tmp = Files.createTempDirectory("cdcstream").toString
    val logDir = s"$tmp/log"
    val targetDir = s"$tmp/target"
    val checkpointDir = s"$tmp/chk"

    // 1. replay the demo workload through write-through capture
    val table = DemoWorkload.replay(
      CdcTable(
        DemoWorkload.users(s, 0),
        DemoWorkload.UsersSpec),
      s, inserts = 10, updates = 5, deletes = 2)

    // statistics parity (reference: example_usage.py:141-143 workload)
    val stats = CdcMonitor.statistics(table.changeLog)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats === Map("INSERT" -> 10L, "UPDATE" -> 5L, "DELETE" -> 2L))

    // 2. commit the log to the streaming source directory
    table.changeLog.write.mode("overwrite").parquet(logDir)
    val rowSchema = table.snapshot.schema

    // 3. drain (Trigger.AvailableNow — T10 final drain semantics)
    CdcStream.drain(s, logDir, targetDir, checkpointDir,
      DemoWorkload.UsersSpec, rowSchema)

    // 4. target ≡ source snapshot
    val target = CdcStream.readTarget(s, targetDir, rowSchema)
    assert(target.count() === 8) // 10 inserts - 2 deletes
    assert(ReplicationVerifier.fullyReplicated(table.snapshot, target))

    // 5. restart the drain on the same checkpoint: no-op, target unchanged
    val v1 = CdcStream.currentVersion(targetDir)
    CdcStream.drain(s, logDir, targetDir, checkpointDir,
      DemoWorkload.UsersSpec, rowSchema)
    assert(CdcStream.currentVersion(targetDir) === v1)
    assert(ReplicationVerifier.fullyReplicated(table.snapshot,
      CdcStream.readTarget(s, targetDir, rowSchema)))

    // 6. late batch: more inserts land in the log; a second drain catches up
    table.insert(DemoWorkload.users(s, 3, startId = 100L))
    table.changeLog.filter(col("record_id") >= 100L)
      .write.mode("append").parquet(logDir)
    CdcStream.drain(s, logDir, targetDir, checkpointDir,
      DemoWorkload.UsersSpec, rowSchema)
    val target2 = CdcStream.readTarget(s, targetDir, rowSchema)
    assert(target2.count() === 11)
    assert(ReplicationVerifier.fullyReplicated(table.snapshot, target2))
  }

  test("re-applying a crashed epoch is idempotent and never reads its own output") {
    val tmp = Files.createTempDirectory("cdccrash").toString
    val table = DemoWorkload.replay(
      CdcTable(DemoWorkload.users(s, 0), DemoWorkload.UsersSpec), s,
      inserts = 4, updates = 1, deletes = 1)
    val rowSchema = table.snapshot.schema
    val log = table.changeLog
    val batch1 = log.filter(col("cdc_id") <= 4)
    val batch2 = log.filter(col("cdc_id") > 4)

    CdcStream.applyBatch(batch1, 0L, s"$tmp/target", DemoWorkload.UsersSpec, rowSchema)
    CdcStream.applyBatch(batch2, 1L, s"$tmp/target", DemoWorkload.UsersSpec, rowSchema)
    val after = CdcStream.readTarget(s, s"$tmp/target", rowSchema).collect().toSet
    // crash window: _current already points at epoch 1, checkpoint didn't
    // commit → the runtime re-runs epoch 1. Must not read+overwrite its
    // own output, must reproduce the same target.
    CdcStream.applyBatch(batch2, 1L, s"$tmp/target", DemoWorkload.UsersSpec, rowSchema)
    val replay = CdcStream.readTarget(s, s"$tmp/target", rowSchema).collect().toSet
    assert(replay === after)
    assert(ReplicationVerifier.fullyReplicated(table.snapshot,
      CdcStream.readTarget(s, s"$tmp/target", rowSchema)))
  }

  test("untouched buckets are carried forward byte-identically across an epoch") {
    val tmp = Files.createTempDirectory("cdcbucket").toString
    val targetDir = s"$tmp/target"
    val table = DemoWorkload.replay(
      CdcTable(DemoWorkload.users(s, 0), DemoWorkload.UsersSpec), s,
      inserts = 12, updates = 0, deletes = 0)
    val rowSchema = table.snapshot.schema
    val log = table.changeLog

    // epoch 0: all 12 inserts spread over the buckets
    CdcStream.applyBatch(log, 0L, targetDir, DemoWorkload.UsersSpec, rowSchema,
      numBuckets = 4)

    // epoch 1: update exactly one key → exactly one changed bucket
    val oneKey = log.orderBy("cdc_id").limit(1)
    CdcStream.applyBatch(oneKey, 1L, targetDir, DemoWorkload.UsersSpec, rowSchema,
      numBuckets = 4)
    assert(CdcStream.currentVersion(targetDir) === Some(1L))

    def bucketFiles(epoch: Long): Map[String, Seq[(String, Array[Byte])]] = {
      val root = java.nio.file.Paths.get(targetDir, s"v=$epoch")
      val it = Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala
          .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("__b="))
          .map { d =>
            val fs = Files.list(d)
            try d.getFileName.toString -> fs.iterator().asScala
              .filter(f => f.getFileName.toString.startsWith("part-"))
              .map(f => f.getFileName.toString -> Files.readAllBytes(f))
              .toSeq.sortBy(_._1)
            finally fs.close()
          }.toMap
      } finally it.close()
    }
    val v0 = bucketFiles(0L)
    val v1 = bucketFiles(1L)
    val changedBucket = {
      // same bucket function as the engine
      val k = log.orderBy("cdc_id").limit(1)
        .select(pmod(hash(col("record_id").cast("long")), lit(4)).as("b"))
        .collect().head.getInt(0)
      s"__b=$k"
    }
    // every untouched bucket: same file names, same bytes
    (v0.keySet - changedBucket).foreach { b =>
      assert(v1.contains(b), s"bucket $b missing from v=1")
      assert(v0(b).map(_._1) === v1(b).map(_._1), s"file names differ in $b")
      v0(b).zip(v1(b)).foreach { case ((_, bytes0), (_, bytes1)) =>
        assert(java.util.Arrays.equals(bytes0, bytes1), s"bytes differ in $b")
      }
    }
    // the full snapshot is still correct
    assert(ReplicationVerifier.fullyReplicated(table.snapshot,
      CdcStream.readTarget(s, targetDir, rowSchema)))
  }

  test("ProcessingTime stream replicates batches that arrive while running (T1)") {
    val tmp = Files.createTempDirectory("cdclive").toString
    val table = DemoWorkload.replay(
      CdcTable(DemoWorkload.users(s, 0), DemoWorkload.UsersSpec), s)
    table.changeLog.write.mode("overwrite").parquet(s"$tmp/log")
    val rowSchema = table.snapshot.schema

    val q = CdcStream.start(s, s"$tmp/log", s"$tmp/target", s"$tmp/chk",
      DemoWorkload.UsersSpec, rowSchema,
      trigger = Some(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds")))
    try {
      // late batch lands while the query is live
      table.insert(DemoWorkload.users(s, 2, startId = 200L))
      table.changeLog.filter(col("record_id") >= 200L)
        .write.mode("append").parquet(s"$tmp/log")
      val deadline = System.nanoTime() + 60_000_000_000L
      def replicated(): Boolean =
        CdcStream.currentVersion(s"$tmp/target").exists { _ =>
          CdcStream.readTarget(s, s"$tmp/target", rowSchema).count() == 10
        }
      while (!replicated() && System.nanoTime() < deadline) Thread.sleep(500)
      assert(replicated(), "live stream did not catch up within 60s")
      assert(ReplicationVerifier.fullyReplicated(table.snapshot,
        CdcStream.readTarget(s, s"$tmp/target", rowSchema)))
    } finally q.stop()
  }

  test("vacuumTarget keeps current + k-1 older versions, never newer or uncommitted") {
    val tmp = Files.createTempDirectory("cdcvac").toString
    val targetDir = s"$tmp/target"
    val table = DemoWorkload.replay(
      CdcTable(DemoWorkload.users(s, 0), DemoWorkload.UsersSpec), s,
      inserts = 6, updates = 0, deletes = 0)
    val rowSchema = table.snapshot.schema
    val log = table.changeLog
    (0L to 3L).foreach { epoch =>
      CdcStream.applyBatch(log.filter(col("cdc_id") % 4 === epoch), epoch,
        targetDir, DemoWorkload.UsersSpec, rowSchema, numBuckets = 4)
    }
    // a crashed in-flight epoch beyond _current must survive vacuum
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(targetDir, "v=99"))
    assert(CdcStream.currentVersion(targetDir) === Some(3L))

    val deleted = CdcStream.vacuumTarget(targetDir, keepVersions = 2)
    assert(deleted === Seq(0L, 1L))
    val left = java.nio.file.Files.list(java.nio.file.Paths.get(targetDir))
    val names = try {
      import scala.jdk.CollectionConverters._
      left.iterator().asScala.map(_.getFileName.toString).toSet
    } finally left.close()
    assert(names === Set("v=2", "v=3", "v=99", "_current"))
    // snapshot still fully readable after vacuum
    assert(ReplicationVerifier.fullyReplicated(table.snapshot,
      CdcStream.readTarget(s, targetDir, rowSchema)))
  }

  test("runWithRetries: per-incident budget, rethrow after exhaustion (T8)") {
    import graft.model.CdcConfig
    import org.apache.spark.sql.streaming.StreamingQuery
    def fakeQuery(behave: () => Unit): StreamingQuery = new StreamingQuery {
      override def name: String = "fake"
      override def id: java.util.UUID = java.util.UUID.randomUUID()
      override def runId: java.util.UUID = java.util.UUID.randomUUID()
      override def sparkSession: org.apache.spark.sql.SparkSession = s
      override def isActive: Boolean = false
      override def exception: Option[org.apache.spark.sql.streaming.StreamingQueryException] = None
      override def status: org.apache.spark.sql.streaming.StreamingQueryStatus = null
      override def recentProgress: Array[org.apache.spark.sql.streaming.StreamingQueryProgress] = Array()
      override def lastProgress: org.apache.spark.sql.streaming.StreamingQueryProgress = null
      override def awaitTermination(): Unit = behave()
      override def awaitTermination(timeoutMs: Long): Boolean = { behave(); true }
      override def processAllAvailable(): Unit = ()
      override def stop(): Unit = ()
      override def explain(): Unit = ()
      override def explain(extended: Boolean): Unit = ()
    }
    // retryDelaySeconds = 1 (not 0): the healthy-run threshold is
    // 2 × delay, and a zero threshold would let a millisecond of clock
    // jitter on a failing run reset the budget → infinite retry loop.
    val cfg = CdcConfig(maxRetries = 3, retryDelaySeconds = 1)

    // transient failures within budget → recovers
    var starts = 0
    CdcStream.runWithRetries(cfg) { () =>
      starts += 1
      fakeQuery(() => if (starts <= 2) throw new RuntimeException(s"boom $starts"))
    }
    assert(starts === 3) // 2 failures + 1 success

    // persistent failure → rethrown after maxRetries extra attempts
    var starts2 = 0
    val e = intercept[RuntimeException] {
      CdcStream.runWithRetries(cfg) { () =>
        starts2 += 1
        fakeQuery(() => throw new RuntimeException("always"))
      }
    }
    assert(e.getMessage === "always")
    assert(starts2 === cfg.maxRetries + 1)
  }

  test("streamed SCD2 history across micro-batches equals batch History.scd2") {
    val tmp = Files.createTempDirectory("cdchist").toString
    val logDir = s"$tmp/log"
    val histDir = s"$tmp/hist"
    val spec = DemoWorkload.UsersSpec

    // non-empty base snapshot: its keys must show up as version-0 rows,
    // get closed by updates/deletes, and survive untouched otherwise
    val base = DemoWorkload.users(s, 3, startId = 200L).localCheckpoint(true)
    val table = DemoWorkload.replay(CdcTable(base, spec), s,
      inserts = 10, updates = 5, deletes = 2)
    table.update(col("id") === 200L, Map("status" -> lit("updated")))
    table.delete(col("id") === 201L)
    val rowSchema = table.snapshot.schema
    val log = table.changeLog.localCheckpoint(true)
    val maxId = log.agg(max(col("cdc_id"))).head().getLong(0)

    // commit the log as ORDERED single-file chunks with explicit mtimes:
    // the file stream batches by modification time, and the history
    // contract requires batches in log order
    val cuts = Seq((1L, 6L), (7L, 12L), (13L, maxId))
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      log.filter(col("cdc_id").between(lo, hi)).coalesce(1)
        .write.mode("append").parquet(logDir)
      // stamp THIS chunk's (freshly written ⇒ mtime ≈ now, far above any
      // stamp) part files with an increasing coarse mtime
      val it = Files.list(java.nio.file.Paths.get(logDir))
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala
          .filter(_.getFileName.toString.startsWith("part-"))
          .filter(p => Files.getLastModifiedTime(p).toMillis > 1000L * cuts.length)
          .foreach(p => Files.setLastModifiedTime(p,
            java.nio.file.attribute.FileTime.fromMillis(1000L * (i + 1))))
      } finally it.close()
    }

    CdcStream.bootstrapHistory(base, histDir, spec, numBuckets = 4)
    CdcStream.drain(s, logDir, s"$tmp/target", s"$tmp/chk", spec, rowSchema,
      maxFilesPerTrigger = 1, historyDir = Some(histDir))
    // one epoch per chunk: the maintenance really ran incrementally
    assert(CdcStream.currentVersion(histDir).exists(_ >= cuts.length - 1))

    val streamed = CdcStream.readHistory(s, histDir, spec, rowSchema)
      .collect().toSet
    val expected = graft.log.History.scd2(
        base.select(spec.columns.map(col): _*), log, spec)
      .collect().toSet
    assert(streamed === expected)
    // the latest-state target stays correct alongside. The target has no
    // base-snapshot bootstrap (it starts empty and the log carries only
    // changes), so the expectation is the batch apply over an empty base
    // — base keys never touched by the log (202) are legitimately absent.
    val emptyBase = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], rowSchema)
    val expectedTarget = graft.apply.ChangeApplier
      .applyChanges(emptyBase, log, spec,
        graft.model.ConflictStrategy.LastWriteWins)
      .collect().toSet
    assert(CdcStream.readTarget(s, s"$tmp/target", rowSchema)
      .collect().toSet === expectedTarget)
  }

  test("re-applying a crashed epoch against the history table is idempotent") {
    val tmp = Files.createTempDirectory("cdchistcrash").toString
    val histDir = s"$tmp/hist"
    val spec = DemoWorkload.UsersSpec
    val base = DemoWorkload.users(s, 2, startId = 300L).localCheckpoint(true)
    val table = DemoWorkload.replay(CdcTable(base, spec), s,
      inserts = 4, updates = 2, deletes = 1)
    table.delete(col("id") === 300L)
    val rowSchema = table.snapshot.schema
    val log = table.changeLog.localCheckpoint(true)
    val batch1 = log.filter(col("cdc_id") <= 4)
    val batch2 = log.filter(col("cdc_id") > 4)

    CdcStream.bootstrapHistory(base, histDir, spec, numBuckets = 4)
    CdcStream.applyHistoryBatch(batch1, 0L, histDir, spec, rowSchema, numBuckets = 4)
    CdcStream.applyHistoryBatch(batch2, 1L, histDir, spec, rowSchema, numBuckets = 4)
    val after = CdcStream.readHistory(s, histDir, spec, rowSchema).collect().toSet
    // crash window: re-run epoch 1 — must reproduce, not double-close
    CdcStream.applyHistoryBatch(batch2, 1L, histDir, spec, rowSchema, numBuckets = 4)
    val replay = CdcStream.readHistory(s, histDir, spec, rowSchema).collect().toSet
    assert(replay === after)
    val expected = graft.log.History.scd2(
        base.select(spec.columns.map(col): _*), log, spec)
      .collect().toSet
    assert(after === expected)
  }

  test("streamed aggregate view across micro-batches equals recompute; crashed epoch idempotent") {
    val tmp = Files.createTempDirectory("cdcagg").toString
    val aggDir = s"$tmp/agg"
    val spec = DemoWorkload.UsersSpec
    val base = DemoWorkload.users(s, 3, startId = 400L).localCheckpoint(true)
    val table = DemoWorkload.replay(CdcTable(base, spec), s,
      inserts = 6, updates = 3, deletes = 2)
    table.update(col("id") === 400L, Map("status" -> lit("inactive")))
    val log = table.changeLog.localCheckpoint(true)
    val batch1 = log.filter(col("cdc_id") <= 5)
    val batch2 = log.filter(col("cdc_id") > 5)

    CdcStream.bootstrapAgg(base, aggDir, "status", "id")
    CdcStream.applyAggBatch(batch1, 0L, aggDir, "status", "id",
      org.apache.spark.sql.types.StringType)
    CdcStream.applyAggBatch(batch2, 1L, aggDir, "status", "id",
      org.apache.spark.sql.types.StringType)
    val after = CdcStream.readAgg(s, aggDir, org.apache.spark.sql.types.StringType)
      .collect().toSet
    // the maintained view equals a per-status recompute over the final snapshot
    val expected = graft.apply.IncrementalAgg
      .snapshotAgg(table.snapshot, "status", "id").collect().toSet
    assert(after === expected)
    // crash window: re-run epoch 1 — reads versionBefore(1), reproduces
    CdcStream.applyAggBatch(batch2, 1L, aggDir, "status", "id",
      org.apache.spark.sql.types.StringType)
    assert(CdcStream.readAgg(s, aggDir, org.apache.spark.sql.types.StringType)
      .collect().toSet === after)
  }

  test("streamed moments view across micro-batches equals recompute; crashed epoch idempotent") {
    val tmp = Files.createTempDirectory("cdcmoments").toString
    val mDir = s"$tmp/moments"
    val spec = DemoWorkload.UsersSpec
    val base = DemoWorkload.users(s, 3, startId = 500L).localCheckpoint(true)
    val table = DemoWorkload.replay(CdcTable(base, spec), s,
      inserts = 6, updates = 3, deletes = 2)
    table.update(col("id") === 500L, Map("status" -> lit("inactive")))
    val log = table.changeLog.localCheckpoint(true)
    val batch1 = log.filter(col("cdc_id") <= 5)
    val batch2 = log.filter(col("cdc_id") > 5)

    CdcStream.bootstrapMoments(base, mDir, "status", "id")
    CdcStream.applyMomentsBatch(batch1, 0L, mDir, "status", "id",
      org.apache.spark.sql.types.StringType)
    CdcStream.applyMomentsBatch(batch2, 1L, mDir, "status", "id",
      org.apache.spark.sql.types.StringType)
    val after = CdcStream.readMoments(s, mDir, org.apache.spark.sql.types.StringType)
      .collect().toSet
    // maintained second moments equal a recompute over the final snapshot
    val expected = graft.apply.IncrementalAgg
      .snapshotMoments(table.snapshot, "status", "id").collect().toSet
    assert(after === expected)
    // crash window: re-run epoch 1 — reads versionBefore(1), reproduces
    CdcStream.applyMomentsBatch(batch2, 1L, mDir, "status", "id",
      org.apache.spark.sql.types.StringType)
    assert(CdcStream.readMoments(s, mDir, org.apache.spark.sql.types.StringType)
      .collect().toSet === after)
  }

  test("streamed distinct-count view across micro-batches equals recompute; crashed epoch idempotent") {
    import org.apache.spark.sql.types.{LongType, StringType}
    val tmp = Files.createTempDirectory("cdcdistinct").toString
    val dDir = s"$tmp/distinct"
    val spec = DemoWorkload.UsersSpec
    val base = DemoWorkload.users(s, 3, startId = 600L).localCheckpoint(true)
    val table = DemoWorkload.replay(CdcTable(base, spec), s,
      inserts = 6, updates = 3, deletes = 2)
    table.update(col("id") === 600L, Map("status" -> lit("inactive")))
    val log = table.changeLog.localCheckpoint(true)
    val batch1 = log.filter(col("cdc_id") <= 5)
    val batch2 = log.filter(col("cdc_id") > 5)

    CdcStream.bootstrapDistinct(base, dDir, "status", "id")
    CdcStream.applyDistinctBatch(batch1, 0L, dDir, "status", "id",
      StringType, LongType)
    CdcStream.applyDistinctBatch(batch2, 1L, dDir, "status", "id",
      StringType, LongType)
    val after = CdcStream.readDistinct(s, dDir, StringType, LongType)
      .collect().toSet
    // the maintained support table equals a recompute over the final
    // snapshot — and so does the derived COUNT(DISTINCT) dashboard
    val expected = graft.apply.IncrementalAgg
      .snapshotDistinct(table.snapshot, "status", "id").collect().toSet
    assert(after === expected)
    assert(graft.apply.IncrementalAgg
      .distinctView(CdcStream.readDistinct(s, dDir, StringType, LongType))
      .collect().toSet ===
      graft.apply.IncrementalAgg
        .distinctView(graft.apply.IncrementalAgg
          .snapshotDistinct(table.snapshot, "status", "id"))
        .collect().toSet)
    // crash window: re-run epoch 1 — reads versionBefore(1), reproduces
    CdcStream.applyDistinctBatch(batch2, 1L, dDir, "status", "id",
      StringType, LongType)
    assert(CdcStream.readDistinct(s, dDir, StringType, LongType)
      .collect().toSet === after)
  }

  test("streamed join view equals recompute; dangling fk drops; crashed epoch idempotent") {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val tmp = Files.createTempDirectory("cdcjoinview").toString
    val viewDir = s"$tmp/view"
    val spec = DemoWorkload.UsersSpec
    val table = DemoWorkload.replay(
      CdcTable(DemoWorkload.users(s, 0), spec), s,
      inserts = 8, updates = 4, deletes = 2)
    val rowSchema = table.snapshot.schema
    val log = table.changeLog.localCheckpoint(true)
    val batch1 = log.filter(col("cdc_id") <= 6)
    val batch2 = log.filter(col("cdc_id") > 6)

    // 'pending' deliberately missing: its rows must LEAVE the view
    import s.implicits._
    val dim = Seq(("active", "tier-A"), ("inactive", "tier-I"))
      .toDF("st", "tier").localCheckpoint(true)
    val viewSchema = StructType(rowSchema.fields :+ StructField("tier", StringType))

    CdcStream.applyJoinBatch(batch1, 0L, viewDir, spec, viewSchema, dim,
      "status", "st", Seq("tier"), numBuckets = 4)
    CdcStream.applyJoinBatch(batch2, 1L, viewDir, spec, viewSchema, dim,
      "status", "st", Seq("tier"), numBuckets = 4)
    val got = CdcStream.readTarget(s, viewDir, viewSchema).collect().toSet

    // recompute: final applied state (stream target starts empty) ⋈ dim
    val emptyBase = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], rowSchema)
    val finalState = graft.apply.ChangeApplier.applyChanges(emptyBase, log, spec)
    val expected = graft.apply.IncrementalJoin.snapshotView(
        finalState, dim, spec, "status", "st", Seq("tier"))
      .collect().toSet
    assert(got === expected)
    assert(!got.exists(_.getAs[String]("status") == "pending"),
      "dangling fk must drop")
    assert(got.nonEmpty)

    // crash window: re-run epoch 1 — reads versionBefore(1), reproduces
    CdcStream.applyJoinBatch(batch2, 1L, viewDir, spec, viewSchema, dim,
      "status", "st", Seq("tier"), numBuckets = 4)
    assert(CdcStream.readTarget(s, viewDir, viewSchema).collect().toSet === got)
  }

  test("health listener emits a report per progress event") {
    val tmp = Files.createTempDirectory("cdclisten").toString
    val table = DemoWorkload.replay(
      CdcTable(DemoWorkload.users(s, 0), DemoWorkload.UsersSpec), s)
    table.changeLog.write.mode("overwrite").parquet(s"$tmp/log")
    val rowSchema = table.snapshot.schema

    val reports = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, Any]]()
    val listener = new CdcStream.HealthListener(
      () => s.read.schema(ChangeLog.schema(rowSchema)).parquet(s"$tmp/log"),
      emit = r => { reports.add(r); () })
    s.streams.addListener(listener)
    try {
      CdcStream.drain(s, s"$tmp/log", s"$tmp/target", s"$tmp/chk",
        DemoWorkload.UsersSpec, rowSchema)
      // listener events are delivered asynchronously — poll briefly
      val deadline = System.nanoTime() + 15_000_000_000L
      while (reports.isEmpty && System.nanoTime() < deadline) Thread.sleep(200)
      assert(!reports.isEmpty, "no health report within 15s of drain")
      val r = reports.peek()
      assert(r("total_changes").asInstanceOf[Long] === 17L)
      assert(r("health") === "healthy")
    } finally {
      s.streams.removeListener(listener)
      listener.close()
    }
  }

  test("change log streamed into a TxTable target: ACID epochs, time travel, replay no-op") {
    import graft.sources.TxTable
    val tmp = Files.createTempDirectory("cdctx").toString
    val logDir = s"$tmp/log"
    val tableDir = s"$tmp/txtarget"
    val ckpt = s"$tmp/chk"

    val table = DemoWorkload.replay(
      CdcTable(DemoWorkload.users(s, 0), DemoWorkload.UsersSpec),
      s, inserts = 10, updates = 5, deletes = 2)
    table.changeLog.write.mode("overwrite").parquet(logDir)
    val rowSchema = table.snapshot.schema

    CdcStream.drainTxTable(s, logDir, tableDir, ckpt,
      DemoWorkload.UsersSpec, rowSchema)

    // target ≡ source snapshot, read through the table format
    assert(ReplicationVerifier.fullyReplicated(table.snapshot,
      TxTable.read(s, tableDir)))
    assert(TxTable.read(s, tableDir).count() === 8)
    // epoch stamps present, strictly increasing
    val epochs = TxTable.versions(tableDir)
      .map(TxTable.snapshot(tableDir, _)).flatMap(_.epoch)
    assert(epochs.nonEmpty && epochs === epochs.sorted)

    // replay on the same checkpoint: no new version
    val before = TxTable.versions(tableDir)
    CdcStream.drainTxTable(s, logDir, tableDir, ckpt,
      DemoWorkload.UsersSpec, rowSchema)
    assert(TxTable.versions(tableDir) === before, "replay must be a no-op")

    // a late batch of inserts lands as ONE CoW merge version; the prior
    // state stays time-travelable
    table.insert(DemoWorkload.users(s, 3, startId = 100L))
    table.changeLog.filter(col("record_id") >= 100L)
      .write.mode("append").parquet(logDir)
    CdcStream.drainTxTable(s, logDir, tableDir, ckpt,
      DemoWorkload.UsersSpec, rowSchema)
    assert(TxTable.read(s, tableDir).count() === 11)
    assert(ReplicationVerifier.fullyReplicated(table.snapshot,
      TxTable.read(s, tableDir)))
    val latestV = TxTable.versions(tableDir).last
    assert(TxTable.read(s, tableDir, Some(latestV - 1)).count() === 8,
      "the pre-catch-up state must remain readable by version")
    // merge carried untouched files forward by reference (CoW, not rewrite)
    val prevFiles = TxTable.snapshot(tableDir, latestV - 1).files.toSet
    val nowFiles = TxTable.snapshot(tableDir, latestV).files.toSet
    assert((prevFiles & nowFiles).nonEmpty,
      "untouched files must carry forward by reference across the merge")
  }

  test("streamed MoR target ≡ streamed CoW target; folds on cadence, zero rewrites between folds") {
    import graft.sources.TxTable
    val tmp = Files.createTempDirectory("cdctxmor").toString
    val table = DemoWorkload.replay(
      CdcTable(DemoWorkload.users(s, 0), DemoWorkload.UsersSpec),
      s, inserts = 10, updates = 5, deletes = 2)
    table.changeLog.write.mode("overwrite").parquet(s"$tmp/log")
    val rowSchema = table.snapshot.schema

    // same log drained into both write modes
    CdcStream.drainTxTable(s, s"$tmp/log", s"$tmp/cow", s"$tmp/chk_cow",
      DemoWorkload.UsersSpec, rowSchema)
    CdcStream.drainTxTable(s, s"$tmp/log", s"$tmp/mor", s"$tmp/chk_mor",
      DemoWorkload.UsersSpec, rowSchema, writeMode = "mor")
    assertSameRows(TxTable.read(s, s"$tmp/mor"), TxTable.read(s, s"$tmp/cow"),
      "mor stream ≡ cow stream")
    assert(ReplicationVerifier.fullyReplicated(table.snapshot,
      TxTable.read(s, s"$tmp/mor")))

    // between folds, a MoR epoch rewrites NO base files: drain a second
    // change batch and check every pre-batch file carried forward
    val lastLogged = table.changeLog.agg(max(col("cdc_id"))).first().getLong(0)
    // mutate keys that EXIST in the snapshot (ids are workload-assigned)
    val liveIds = table.snapshot.select(DemoWorkload.UsersSpec.pkCol)
      .orderBy(DemoWorkload.UsersSpec.pkCol).collect().map(_.getLong(0))
    table.update(col(DemoWorkload.UsersSpec.pkCol) === liveIds(0),
      Map("username" -> lit("morx")))
    table.delete(col(DemoWorkload.UsersSpec.pkCol) === liveIds(1))
    val staged = table.changeLog.filter(col("cdc_id") > lastLogged)
    assert(staged.count() === 2L, "the stage-2 mutations must hit live keys")
    staged.write.mode("append").parquet(s"$tmp/log")
    val beforeFiles = TxTable.latest(s"$tmp/mor").get.files.toSet
    CdcStream.drainTxTable(s, s"$tmp/log", s"$tmp/mor", s"$tmp/chk_mor",
      DemoWorkload.UsersSpec, rowSchema, writeMode = "mor")
    val afterSnap = TxTable.latest(s"$tmp/mor").get
    assert(beforeFiles.subsetOf(afterSnap.files.toSet),
      "a MoR epoch must not rewrite base files")
    assert(afterSnap.dvs.nonEmpty, "the epoch's deletes live as DVs")
    assert(ReplicationVerifier.fullyReplicated(table.snapshot,
      TxTable.read(s, s"$tmp/mor")))

    // foldEvery = 1: the next epoch folds the DVs right after merging —
    // bounded maintenance, value-neutral, and only dv'd files rewritten
    val logged2 = table.changeLog.agg(max(col("cdc_id"))).first().getLong(0)
    table.update(col(DemoWorkload.UsersSpec.pkCol) === liveIds(2),
      Map("username" -> lit("mory")))
    val staged3 = table.changeLog.filter(col("cdc_id") > logged2)
    assert(staged3.count() === 1L, "the stage-3 mutation must hit a live key")
    staged3.write.mode("append").parquet(s"$tmp/log")
    CdcStream.drainTxTable(s, s"$tmp/log", s"$tmp/mor", s"$tmp/chk_mor",
      DemoWorkload.UsersSpec, rowSchema, writeMode = "mor", foldEvery = 1)
    val folded = TxTable.latest(s"$tmp/mor").get
    assert(folded.dvs.isEmpty, "the cadence fold must clear the DVs")
    assert(folded.op === "fold")
    assert(ReplicationVerifier.fullyReplicated(table.snapshot,
      TxTable.read(s, s"$tmp/mor")), "fold is value-neutral")
    // the exactly-once ledger survives the fold (no epoch stamp on it):
    // a full replay of the log is still a no-op
    val beforeV = TxTable.versions(s"$tmp/mor")
    CdcStream.drainTxTable(s, s"$tmp/log", s"$tmp/mor", s"$tmp/chk_mor",
      DemoWorkload.UsersSpec, rowSchema, writeMode = "mor", foldEvery = 1)
    assert(TxTable.versions(s"$tmp/mor") === beforeV,
      "replay after a fold must skip on the high-water mark")
  }

  test("applyTxBatch merge path: updates apply and deletes key off record_id") {
    import graft.sources.TxTable
    val dir = Files.createTempDirectory("cdctxm").toString
    val table = DemoWorkload.replay(
      CdcTable(DemoWorkload.users(s, 0), DemoWorkload.UsersSpec),
      s, inserts = 6, updates = 3, deletes = 2)
    val rowSchema = table.snapshot.schema
    val log = table.changeLog
    // batch 1: the inserts (seed branch); batch 2: updates + deletes —
    // the merge branch, incl. the DELETE rows whose pk must come from
    // record_id (their new_data image is null)
    CdcStream.applyTxBatch(log.filter(col("operation") === "INSERT"),
      dir, DemoWorkload.UsersSpec, rowSchema)
    CdcStream.applyTxBatch(log.filter(col("operation") =!= "INSERT"),
      dir, DemoWorkload.UsersSpec, rowSchema)
    assert(ReplicationVerifier.fullyReplicated(table.snapshot,
      TxTable.read(s, dir)),
      "merge path must land updates and remove deleted keys")
    assert(TxTable.read(s, dir).count() === 4) // 6 inserts − 2 deletes
    val deleted = log.filter(col("operation") === "DELETE")
      .select("record_id").collect().map(_.getLong(0)).toSet
    val remaining = TxTable.read(s, dir)
      .select(DemoWorkload.UsersSpec.pkCol).collect().map(_.getLong(0)).toSet
    assert((deleted & remaining).isEmpty, "deleted keys must be gone")
    // data-derived ledger: re-applying the SAME second batch is a no-op
    val before = TxTable.versions(dir)
    CdcStream.applyTxBatch(log.filter(col("operation") =!= "INSERT"),
      dir, DemoWorkload.UsersSpec, rowSchema)
    assert(TxTable.versions(dir) === before,
      "a replayed batch must skip on the cdc-id high-water mark")
  }

  test("concurrent writers into one TxTable: per-stream ledger applies every slice") {
    // Round-14 regression pin: N writers replicate DISJOINT key slices of
    // one change log into the SAME table; each slice carries interleaved
    // cdc_ids from the whole range, so under the old TABLE-global
    // high-water the second writer's batches all trailed the first's
    // committed max and were silently skipped (24/32 batches dropped in
    // the round-13 contended bench). The ledger is now scoped per writer
    // stream (checkpoint-derived streamId stamped into each commit).
    import graft.sources.TxTable
    val tmp = Files.createTempDirectory("cdctxcont").toString
    val table = DemoWorkload.replay(
      CdcTable(DemoWorkload.users(s, 0), DemoWorkload.UsersSpec),
      s, inserts = 12, updates = 6, deletes = 3)
    val rowSchema = table.snapshot.schema
    val log = table.changeLog
    // ground truth: the full log drained by a single writer
    log.write.mode("overwrite").parquet(s"$tmp/log_full")
    CdcStream.drainTxTable(s, s"$tmp/log_full", s"$tmp/single",
      s"$tmp/chk_single", DemoWorkload.UsersSpec, rowSchema)
    // two writers: key-parity slices, each split into 2 files of
    // CONTIGUOUS cdc_id ranges (per-writer in-order contract holds, but
    // writer 1's batch maxes interleave below writer 0's)
    (0 until 2).foreach { w =>
      val slice = log.filter(pmod(col("record_id"), lit(2)) === w)
      val b = slice.agg(min(col("cdc_id")), max(col("cdc_id"))).first()
      val span = math.max(1L, (b.getLong(1) - b.getLong(0)) / 2 + 1)
      (0 until 2).foreach { i =>
        slice.filter(expr(s"(cdc_id - ${b.getLong(0)}) div $span") === i)
          .repartition(1).write.mode("append").parquet(s"$tmp/log_$w")
        ()
      }
    }
    val skipped0 = CdcStream.skippedBatchCount.get()
    // writer 0 drains FIRST (commits the higher interleaved cdc_ids),
    // then writer 1 — the exact ordering the table-global mark corrupted
    CdcStream.drainTxTable(s, s"$tmp/log_0", s"$tmp/contended",
      s"$tmp/chk_w0", DemoWorkload.UsersSpec, rowSchema,
      maxFilesPerTrigger = 1)
    CdcStream.drainTxTable(s, s"$tmp/log_1", s"$tmp/contended",
      s"$tmp/chk_w1", DemoWorkload.UsersSpec, rowSchema,
      maxFilesPerTrigger = 1)
    assert(CdcStream.skippedBatchCount.get() === skipped0,
      "no batch may be dropped as a phantom replay")
    assertSameRows(TxTable.read(s, s"$tmp/contended"),
      TxTable.read(s, s"$tmp/single"),
      "two-writer slices must converge to the single-writer table")
    assert(ReplicationVerifier.fullyReplicated(table.snapshot,
      TxTable.read(s, s"$tmp/contended")))
    // and a genuine replay still skips: writer 1 re-drains on a FRESH
    // checkpoint (checkpoint loss) — same streamId derivation would
    // differ, but its own committed cdc_ids are stamped per stream, so
    // only the TABLE-global regression matters here; re-drain on the
    // SAME checkpoint must be a version no-op
    val before = TxTable.versions(s"$tmp/contended")
    CdcStream.drainTxTable(s, s"$tmp/log_1", s"$tmp/contended",
      s"$tmp/chk_w1", DemoWorkload.UsersSpec, rowSchema,
      maxFilesPerTrigger = 1)
    assert(TxTable.versions(s"$tmp/contended") === before,
      "same-checkpoint replay must remain a no-op")
  }
}

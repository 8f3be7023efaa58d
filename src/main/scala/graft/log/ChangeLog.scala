package graft.log

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The append-only ordered change log — the central abstraction of the
  * engine (reference: cdc_system.py:115-126 creates it as `{table}_cdc`).
  *
  * Spark representation: a DataFrame/parquet directory with the canonical
  * schema below, partitioned by `change_date` at scale so pending scans and
  * retention prune files. Row images are native structs (`old_data`,
  * `new_data`) rather than JSON text — the JSON round-trip the reference
  * pays on every row (reference: cdc_system.py:145,225-227) only happens at
  * the interop boundary via [[graft.capture.ChangeCapture.withJsonImages]].
  */
object ChangeLog {

  val CdcId = "cdc_id"
  val Operation = "operation"
  val RecordId = "record_id"
  val OldData = "old_data"
  val NewData = "new_data"
  val ChangedAt = "changed_at"
  val Synced = "synced"
  val SyncTimestamp = "sync_timestamp"

  /** Canonical log schema for a tracked row type `rowSchema`
    * (reference: cdc_system.py:115-126).
    */
  def schema(rowSchema: StructType): StructType = StructType(Seq(
    StructField(CdcId, LongType, nullable = false),
    StructField(Operation, StringType, nullable = false),
    StructField(RecordId, LongType, nullable = false),
    StructField(OldData, rowSchema, nullable = true),
    StructField(NewData, rowSchema, nullable = true),
    StructField(ChangedAt, TimestampType, nullable = false),
    StructField(Synced, IntegerType, nullable = false),
    StructField(SyncTimestamp, TimestampType, nullable = true)))

  /** Assign `cdc_id` sequence numbers to freshly captured changes.
    *
    * The reference gets a gap-free global AUTOINCREMENT from SQLite
    * (reference: cdc_system.py:117); a distributed engine has no cheap
    * equivalent. What correctness actually requires is a total order that
    * is consistent PER KEY (see [[graft.apply.ChangeApplier.dedupToLatest]]),
    * so we expose two modes:
    *
    *  - `global = true` (test/golden-parity mode): `row_number()` over a
    *    single global window — single-partition sort, only acceptable for
    *    small batches / test fixtures.
    *  - `global = false` (scale mode): ids pack `changed_at` into the high
    *    bits so id order IS `changed_at`-major order across batches —
    *    `unix_millis(changed_at) << 22 | partitionId << 12 | rowInPartition`.
    *    No shuffle. Per-key last-write-wins over these ids therefore agrees
    *    with wall-clock capture order at millisecond granularity, which is
    *    the cross-batch ordering [[graft.apply.ChangeApplier.dedupToLatest]]
    *    needs. The packing envelope — < 1024 partitions and < 4096 rows
    *    per partition per capture batch — is ENFORCED at runtime: a row
    *    outside it raises an error at evaluation time instead of silently
    *    producing duplicate ids (which would make dedupToLatest pick
    *    arbitrary images and markSynced over-mark). The guard is
    *    deliberately CONSERVATIVE: it bounds rows per partition over the
    *    whole batch, not per distinct `changed_at` millisecond — a batch
    *    with >4096 rows/partition spread across many milliseconds could
    *    be collision-free, but write-through capture stamps one
    *    `changed_at` per batch, so the per-millisecond refinement would
    *    only legalize batches this engine never produces. Batches beyond the
    *    envelope should split the capture (more/coarser batches), or use
    *    the streaming path where the micro-batch epoch disambiguates
    *    (see [[graft.streaming.CdcStream]]). Two changes to the SAME key
    *    in the same millisecond still tie-break arbitrarily. Valid
    *    `changed_at` range: 1970-01-01 .. 2039-09 (41 millis bits before
    *    the packed id would reach the sign bit); pre-1970 timestamps are
    *    clamped to epoch 0 rather than producing sign-flipped
    *    (order-inverting) ids.
    */
  def assignCdcIds(
      changes: DataFrame,
      base: Long = 0L,
      global: Boolean = false): DataFrame = {
    if (global) {
      // partitionBy(constant): semantically identical to an empty partition
      // spec (all rows hash to one partition) but DECLARED, so WindowExec
      // doesn't log its move-everything-to-one-partition warning on every
      // fixture derivation — the single partition is this mode's contract,
      // not an accident. pmod(record_id, 1) rather than lit(0): Spark 4's
      // optimizer strips FOLDABLE partition expressions, which would
      // resurrect the empty spec. coalesce: a NULL record_id (schema says
      // non-nullable, but this boundary doesn't enforce the incoming
      // frame's values) must not split off a second window partition and
      // restart the id sequence.
      val w = Window.partitionBy(pmod(coalesce(col(RecordId), lit(0L)), lit(1)))
        .orderBy(col(ChangedAt), col(RecordId), col(Operation))
      changes.withColumn(CdcId, row_number().over(w).cast(LongType) + lit(base))
    } else {
      // monotonically_increasing_id() = partitionId << 33 | rowInPartition.
      val mid = monotonically_increasing_id()
      val pidRaw = shiftrightunsigned(mid, 33)
      val rowRaw = mid.bitwiseAND(lit((1L << 33) - 1))
      val pid = pidRaw.bitwiseAND(lit(0x3ffL))
      val rowInPart = rowRaw.bitwiseAND(lit(0xfffL))
      val millis41 = greatest(unix_millis(col(ChangedAt)), lit(0L))
        .bitwiseAND(lit((1L << 41) - 1))
      val packed = shiftleft(millis41, 22)
        .bitwiseOR(shiftleft(pid, 12)).bitwiseOR(rowInPart) + lit(base)
      // Fail fast on envelope violations: two long compares per row on
      // the happy path, an error (never a silently duplicated id) beyond.
      changes.withColumn(CdcId,
        when(pidRaw > 0x3ffL || rowRaw > 0xfffL,
          raise_error(concat(
            lit("assignCdcIds scale mode: packing envelope exceeded (partition "),
            pidRaw.cast("string"), lit(" > 1023 or row-in-partition "),
            rowRaw.cast("string"),
            lit(" > 4095); split the capture batch or use the streaming path")))
            .cast(LongType))
          .otherwise(packed))
    }
  }

  /** Pending (unsynced) changes in commit order, optionally capped.
    *
    * Mirrors `get_pending_changes` (reference: cdc_system.py:199-231):
    * `SELECT * WHERE synced = 0 ORDER BY cdc_id [LIMIT n]`. Catalyst plans
    * the orderBy+limit as TakeOrderedAndProject (top-k, no global sort);
    * the `synced = 0` predicate is pushed into the parquet scan. In the
    * streaming path this operator is superseded by checkpoint offsets
    * (see [[graft.streaming.CdcStream]]).
    */
  def pendingChanges(log: DataFrame, limit: Option[Int] = None): DataFrame = {
    val pending = log.filter(col(Synced) === 0).orderBy(col(CdcId))
    limit.fold(pending)(pending.limit)
  }

  /** Mark a batch of changes as synced.
    *
    * Mirrors `mark_as_synced` (reference: cdc_system.py:233-246):
    * `UPDATE ... SET synced=1, sync_timestamp=now WHERE cdc_id IN (...)`.
    * Implemented as a join-based membership test rather than an IN-list
    * literal — an IN-list of 10^6 ids would not compile/plan; a join
    * scales to arbitrarily large batches. The join strategy is left to
    * AQE: a normal-sized batch converts to broadcast-hash at runtime from
    * actual shuffle stats, while a huge backlog replay (where a forced
    * broadcast would OOM the driver) stays sort-merge.
    */
  def markSynced(log: DataFrame, syncedIds: DataFrame, at: Column = current_timestamp()): DataFrame = {
    val ids = syncedIds.select(col(CdcId).as("__synced_id")).distinct()
    log
      .join(ids, col(CdcId) === col("__synced_id"), "left_outer")
      .withColumn(Synced, when(col("__synced_id").isNotNull, lit(1)).otherwise(col(Synced)))
      .withColumn(SyncTimestamp,
        when(col("__synced_id").isNotNull && col(SyncTimestamp).isNull, at)
          .otherwise(col(SyncTimestamp)))
      .drop("__synced_id")
  }

  /** Persist a change-log batch partitioned by `change_date` =
    * date(changed_at) — the scale layout (SURVEY §1.3): retention drops
    * whole partitions, and time-bounded scans prune files instead of
    * reading the full log (the Spark equivalent of the reference's
    * covering index, cdc_system.py:129-132 / SURVEY S3).
    */
  def writePartitioned(log: DataFrame, path: String, mode: String = "append"): Unit =
    log.withColumn("change_date", to_date(col(ChangedAt)))
      .write.partitionBy("change_date").mode(mode).parquet(path)

  /** Read a partitioned log; `since` prunes partitions at planning time. */
  def readPartitioned(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      since: Option[java.time.LocalDate] = None): DataFrame = {
    val log = spark.read.parquet(path)
    since.fold(log)(d => log.filter(col("change_date") >= lit(java.sql.Date.valueOf(d))))
  }

  /** Typed view of a canonical (struct-image) change log as
    * `Dataset[ChangeRecord]` — the F8 surface: row images are rendered to
    * JSON text at this boundary, matching the reference's wire format
    * (reference: cdc_system.py:145,221-228), while the engine internals
    * keep native structs.
    */
  def asRecords(log: DataFrame): org.apache.spark.sql.Dataset[graft.model.ChangeRecord] = {
    val spark = log.sparkSession
    import spark.implicits._
    def asJson(c: String): Column = log.schema(c).dataType match {
      case _: StructType => when(col(c).isNotNull, to_json(col(c)))
      case _             => col(c).cast(StringType)
    }
    log.select(
      col(CdcId).as("cdcId"),
      col(Operation).as("operation"),
      col(RecordId).as("recordId"),
      asJson(OldData).as("oldData"),
      asJson(NewData).as("newData"),
      col(ChangedAt).as("changedAt"),
      col(Synced).as("synced"),
      col(SyncTimestamp).as("syncTimestamp")).as[graft.model.ChangeRecord]
  }

  /** Convenience: mark by a Scala id collection (small batches only). */
  def markSyncedIds(log: DataFrame, ids: Seq[Long], at: Column = current_timestamp()): DataFrame = {
    val spark = log.sparkSession
    import spark.implicits._
    markSynced(log, ids.toDF(CdcId), at)
  }
}

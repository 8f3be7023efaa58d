package graft.capture

import graft.log.ChangeLog._
import graft.model.CdcTableSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Change capture.
  *
  * The reference captures via SQLite DML triggers that fire inside the
  * writing transaction (reference: cdc_system.py:105-197). Spark has no
  * trigger hook, so capture is re-expressed two ways, both declarative:
  *
  *  1. '''Snapshot diff''' ([[captureChanges]]): given `before` and `after`
  *     snapshots of a table, emit INSERT / UPDATE / DELETE events with full
  *     row images — this also realizes the reference's declared-but-
  *     unimplemented "timestamp" capture strategy (reference: config.py:47,
  *     cdc_system.py:92-98).
  *  2. '''Write-through''' ([[graft.capture.CdcTable]]): the write API
  *     itself emits change rows atomically with the snapshot update, the
  *     moral equivalent of the trigger being transactional with the DML.
  *
  * All three diff legs are single-shuffle joins on the PK; at scale the
  * snapshots should be bucketed/co-partitioned on the PK so the diff is a
  * zero-shuffle sort-merge join.
  */
object ChangeCapture {

  /** True when any tracked non-key column differs between the NEW and OLD
    * images (null-safe, matching SQL trigger semantics where an UPDATE
    * fires regardless — we additionally suppress no-op updates, which the
    * reference would record; callers wanting strict parity pass
    * `suppressNoOps = false`).
    */
  private def anyColDiffers(cols: Seq[String], l: String, r: String): Column =
    cols.map(c => !(col(s"$l.$c") <=> col(s"$r.$c"))).reduce(_ || _)

  /** Snapshot-diff capture: emits the change set that transforms `before`
    * into `after`, keyed on `spec.pkCol` (reference semantics:
    * cdc_system.py:143-197, S4-S6 in SURVEY §2.1).
    *
    * Output schema: operation, record_id, old_data struct, new_data struct,
    * changed_at — i.e. a change log without cdc_id/synced bookkeeping; feed
    * through [[graft.log.ChangeLog.assignCdcIds]] + [[finishLogSchema]] to
    * get the canonical log.
    */
  def captureChanges(
      before: DataFrame,
      after: DataFrame,
      spec: CdcTableSpec,
      changedAt: Column = current_timestamp(),
      suppressNoOps: Boolean = true): DataFrame = {
    val pk = spec.pkCol
    val cols = spec.columns
    val b = before.select(cols.map(col): _*).alias("b")
    val a = after.select(cols.map(col): _*).alias("a")

    val rowStruct = (side: String) => struct(cols.map(c => col(s"$side.$c")): _*)

    // One full-outer join on the PK classifies every key into
    // INSERT (right-only), DELETE (left-only), UPDATE (both + any diff).
    // Single shuffle; Catalyst plans broadcast or sort-merge by size.
    val joined = b.join(a, col(s"b.$pk") === col(s"a.$pk"), "full_outer")

    val op = when(col(s"b.$pk").isNull, lit("INSERT"))
      .when(col(s"a.$pk").isNull, lit("DELETE"))
      .otherwise(lit("UPDATE"))

    val diffs = joined
      .withColumn(Operation, op)
      .filter(
        col(Operation) =!= "UPDATE" ||
          (if (suppressNoOps) anyColDiffers(spec.nonKeyColumns, "b", "a") else lit(true)))

    diffs.select(
      col(Operation),
      coalesce(col(s"a.$pk"), col(s"b.$pk")).cast(LongType).as(RecordId),
      // Null pattern per reference (cdc_system.py:147-196):
      // INSERT -> new only; UPDATE -> both; DELETE -> old only.
      when(col(Operation) =!= "INSERT", rowStruct("b")).as(OldData),
      when(col(Operation) =!= "DELETE", rowStruct("a")).as(NewData),
      changedAt.as(ChangedAt))
  }

  /** Timestamp-strategy capture (reference: config.py:47 declares it,
    * never implements it): treat rows with `tsCol > lastSyncTs` as the
    * "after" delta and classify against the target. Inserts/updates only —
    * timestamp capture cannot see deletes, which is the documented
    * limitation of the strategy.
    */
  def captureByTimestamp(
      source: DataFrame,
      target: DataFrame,
      spec: CdcTableSpec,
      tsCol: String,
      lastSyncTs: Column): DataFrame = {
    val delta = source.filter(col(tsCol) > lastSyncTs)
    captureChanges(target, delta.unionByName(
      // keep unchanged target rows so the diff only reports the delta keys
      target.join(delta.select(spec.pkCol), Seq(spec.pkCol), "left_anti")
    ), spec)
  }

  /** Version-strategy capture — the third of the reference's declared
    * strategies (reference: config.py:47 lists trigger|timestamp|version;
    * only trigger is implemented there, cdc_system.py:92-98). Rows whose
    * monotonically increasing `versionCol` exceeds `lastVersion` form the
    * delta; classification against the target is identical to the
    * timestamp strategy, including its blindness to deletes.
    */
  def captureByVersion(
      source: DataFrame,
      target: DataFrame,
      spec: CdcTableSpec,
      versionCol: String,
      lastVersion: Long): DataFrame = {
    val delta = source.filter(col(versionCol) > lastVersion)
    captureChanges(target, delta.unionByName(
      target.join(delta.select(spec.pkCol), Seq(spec.pkCol), "left_anti")
    ), spec)
  }

  /** Add `synced`/`sync_timestamp` bookkeeping columns so a captured diff
    * becomes a canonical change-log batch (reference: cdc_system.py:123-124).
    */
  def finishLogSchema(captured: DataFrame): DataFrame =
    captured
      .withColumn(Synced, lit(0))
      .withColumn(SyncTimestamp, lit(null).cast("timestamp"))

  /** Encode row-image structs as JSON text for wire parity with the
    * reference's `json_object(...)` trigger output
    * (reference: cdc_system.py:145,163-164,183). Only for the interop
    * boundary — internal operators consume the structs directly.
    */
  def withJsonImages(log: DataFrame): DataFrame =
    log
      .withColumn(OldData, when(col(OldData).isNotNull, to_json(col(OldData))))
      .withColumn(NewData, when(col(NewData).isNotNull, to_json(col(NewData))))

  /** Decode JSON row images back to structs (reference: cdc_system.py:225-227
    * does this per row with `json.loads`; here it is one vectorized
    * `from_json`, null-guarded like the reference's None checks).
    */
  def parseJsonImages(log: DataFrame, rowSchema: StructType): DataFrame =
    log
      .withColumn(OldData, when(col(OldData).isNotNull, from_json(col(OldData).cast("string"), rowSchema)))
      .withColumn(NewData, when(col(NewData).isNotNull, from_json(col(NewData).cast("string"), rowSchema)))
}

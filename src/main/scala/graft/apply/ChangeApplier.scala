package graft.apply

import graft.log.ChangeLog._
import graft.model.{CdcTableSpec, ConflictStrategy}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Apply a batch of changes to a target snapshot — the replicator
  * (reference: cdc_system.py:271-350).
  *
  * The reference applies changes one-by-one in `cdc_id` order with per-row
  * SQL (`INSERT OR REPLACE` / `UPDATE` / `DELETE`,
  * reference: cdc_system.py:320-350). The Spark-first re-expression is the
  * standard streaming-merge shape:
  *
  *   1. [[dedupToLatest]] — collapse each key to its final image
  *      (last-write-wins, which is exactly what replaying in order produces,
  *      reference: cdc_system.py:212,297-304);
  *   2. one set-oriented merge: drop changed keys from the target, then
  *      union the surviving INSERT/UPDATE images.
  *
  * Two shuffles total per batch (window by key; merge join), independent of
  * batch size — vs the reference's O(rows) round-trips. The merge is
  * idempotent: applying the same batch twice yields the same target
  * (mirrors `INSERT OR REPLACE`, reference: cdc_system.py:327, and fixes
  * the reference's non-idempotent plain UPDATE which silently misses absent
  * rows, reference: cdc_system.py:331-343 — our upsert semantics apply an
  * UPDATE image even when the target row is missing).
  */
object ChangeApplier {

  /** Collapse multiple changes per key to a single final change
    * (W2 in SURVEY §2.5). DELETE→INSERT sequences on one key collapse to
    * the final state, not to a "matched update" — the op of the surviving
    * row is the final op.
    */
  def dedupToLatest(
      changes: DataFrame,
      strategy: ConflictStrategy = ConflictStrategy.LastWriteWins): DataFrame = strategy match {
    case ConflictStrategy.LastWriteWins | ConflictStrategy.FirstWriteWins =>
      val ordered = strategy match {
        case ConflictStrategy.FirstWriteWins => col(CdcId).asc
        case _                               => col(CdcId).desc
      }
      val w = Window.partitionBy(col(RecordId)).orderBy(ordered)
      changes
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")

    case ConflictStrategy.Manual =>
      // Manual strategy resolves NOTHING automatically: only singleton
      // keys pass through; conflicting keys must be fetched via
      // [[splitConflicts]] and resolved out of band. Same single
      // count-window shuffle as the rank dedup.
      splitConflicts(changes)._1

    case ConflictStrategy.Merge =>
      // Newest-first per-column coalesce of the new images (see
      // [[graft.model.ConflictStrategy.Merge]]). Both windows partition
      // by the key, so parallelism and per-task memory are bounded by
      // per-key change counts — the same scale envelope as the
      // row_number dedup; no extra shuffle (one exchange feeds both).
      val newType = changes.schema(NewData).dataType match {
        case s: org.apache.spark.sql.types.StructType => s
        case t => throw new IllegalArgumentException(
          s"Merge strategy needs a struct '$NewData' column, got ${t.simpleString}")
      }
      val wOrd = Window.partitionBy(col(RecordId)).orderBy(col(CdcId).desc)
      val wAll = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val mergedStruct = struct(newType.fieldNames.toSeq.map(f =>
        first(col(s"$NewData.$f"), ignoreNulls = true).over(wAll).as(f)): _*)
      changes
        .withColumn("__rn", row_number().over(wOrd))
        .withColumn("__merged", mergedStruct)
        .filter(col("__rn") === 1)
        .withColumn(NewData,
          when(col(Operation) === "DELETE", lit(null).cast(newType))
            .otherwise(col("__merged")))
        .drop("__rn", "__merged")
  }

  /** Merge-apply: returns the new target snapshot.
    *
    * `target` columns must equal `spec.columns`; `changes` is a canonical
    * change-log batch (see [[graft.log.ChangeLog.schema]]).
    *
    * Scale notes: `latest` is small relative to the target in steady
    * state, and AQE converts the anti-join to broadcast-hash at runtime
    * from actual shuffle stats — deliberately NOT a forced `broadcast()`
    * hint, because a backlog replay with millions of pending changes
    * would OOM a forced broadcast; AQE keeps that case sort-merge. The
    * anti-join and the union are the only wide operations. With a
    * date-partitioned target the anti-join prunes to the partitions
    * containing changed keys.
    */
  def applyChanges(
      target: DataFrame,
      changes: DataFrame,
      spec: CdcTableSpec,
      strategy: ConflictStrategy = ConflictStrategy.LastWriteWins): DataFrame = {
    val latest = dedupToLatest(changes, strategy)
      .select(col(RecordId), col(Operation), col(NewData))

    // Upserted images: final op INSERT or UPDATE -> take the NEW image.
    val upserts = latest
      .filter(col(Operation) =!= "DELETE")
      .select(spec.columns.map(c => col(s"$NewData.$c").as(c)): _*)

    // Every changed key leaves the old target state (replaced or deleted).
    val changedKeys = latest.select(col(RecordId).as(spec.pkCol))
    val untouched = target.join(changedKeys, Seq(spec.pkCol), "left_anti")

    untouched.unionByName(upserts)
  }

  /** Split a change batch into (non-conflicting, conflicting) by key
    * multiplicity — the Manual conflict strategy's primitive: a key with
    * a single change is unambiguous and flows through; a key with
    * several changes in one batch is surfaced (in cdc_id order) for
    * out-of-band resolution. One window shuffle, partitioned by key.
    */
  def splitConflicts(changes: DataFrame): (DataFrame, DataFrame) = {
    val w = Window.partitionBy(col(RecordId))
    val counted = changes.withColumn("__n", count(lit(1)).over(w))
    (counted.filter(col("__n") === 1).drop("__n"),
      counted.filter(col("__n") > 1).drop("__n"))
  }

  /** Split a change batch into (valid, quarantined) by the reference's
    * null-pattern contract (cdc_system.py:147-196: INSERT needs a new
    * image, DELETE an old image, UPDATE both; record_id always set).
    *
    * The reference wraps each row apply in try/except and silently skips
    * failures (cdc_system.py:308-310) — which can reorder one key's
    * changes across batches (SURVEY §7.4-3). The set-oriented form
    * instead diverts malformed rows to a quarantine view BEFORE apply,
    * so the applied set is clean and nothing is dropped silently.
    */
  def partitionValid(changes: DataFrame): (DataFrame, DataFrame) = {
    val valid =
      col(RecordId).isNotNull &&
        col(Operation).isin("INSERT", "UPDATE", "DELETE") &&
        (col(Operation) =!= "INSERT" || col(NewData).isNotNull) &&
        (col(Operation) =!= "DELETE" || col(OldData).isNotNull) &&
        (col(Operation) =!= "UPDATE" || (col(OldData).isNotNull && col(NewData).isNotNull))
    (changes.filter(valid), changes.filter(!coalesce(valid, lit(false))))
  }

  /** Replicate pending changes end-to-end, mirroring
    * `CDCReplicator.replicate_changes(batch_size)`
    * (reference: cdc_system.py:279-318): read pending in order, cap at
    * `batchSize`, apply, and return (new target, log with the batch marked
    * synced, applied count).
    *
    * The reference's per-row try/except "skip bad row" policy
    * (reference: cdc_system.py:308-310) can reorder one key's changes
    * across batches; set-oriented apply has no per-row failure mode, so the
    * quirk is intentionally not reproduced (SURVEY §7.4-3).
    */
  def replicateChanges(
      target: DataFrame,
      log: DataFrame,
      spec: CdcTableSpec,
      batchSize: Int = 100): (DataFrame, DataFrame, Long) = {
    val batch = graft.log.ChangeLog.pendingChanges(log, Some(batchSize)).cache()
    val applied = batch.count()
    val newTarget = applyChanges(target, batch, spec)
    val newLog = graft.log.ChangeLog.markSynced(log, batch.select(col(CdcId)))
    (newTarget, newLog, applied)
  }
}

package graft.capture

import graft.log.ChangeLog._
import graft.model.CdcTableSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-through captured table — the Spark equivalent of the reference's
  * trigger-instrumented source table (reference: cdc_system.py:105-197).
  *
  * SQLite triggers fire inside the writing transaction, so capture is
  * atomic with the DML. Spark has no triggers; instead the write API itself
  * computes the change rows and the new snapshot from one declarative plan,
  * so they cannot diverge (the same input DataFrame feeds both). At scale
  * both outputs land in one job; with a transactional table format (Delta /
  * Iceberg) snapshot + log commit atomically — here (plain parquet test
  * env) atomicity is per-directory write, documented as the deployment
  * difference.
  *
  * State is held as DataFrames; `checkpointEvery` caches materialize the
  * lineage so repeated mutations don't grow an unbounded plan tree.
  */
final class CdcTable private (
    val spec: CdcTableSpec,
    initial: DataFrame) {

  private var snapshotDf: DataFrame = initial
  private var logDf: DataFrame = emptyLog(initial.sparkSession)
  private var nextCdcId: Long = 1L
  private var mutationsSinceCache = 0
  private val checkpointEvery = 8

  private def emptyLog(spark: SparkSession): DataFrame = {
    val rowSchema = initial.select(spec.columns.map(col): _*).schema
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.log.ChangeLog.schema(rowSchema))
  }

  def snapshot: DataFrame = snapshotDf
  def changeLog: DataFrame = logDf

  /** Append captured events (diff output of [[ChangeCapture.captureChanges]])
    * to the log with sequential cdc_ids, and swap in the new snapshot.
    */
  private def commit(after: DataFrame, captured: DataFrame): Unit = {
    val spark = initial.sparkSession
    // Small per-mutation batches: global ids are exact here (test mode);
    // the streaming path uses offsets instead (SURVEY §7.4-1).
    val withIds = ChangeCapture.finishLogSchema(
      graft.log.ChangeLog.assignCdcIds(captured, base = nextCdcId - 1, global = true))
    val n = withIds.count()
    logDf = logDf.unionByName(withIds)
    snapshotDf = after
    nextCdcId += n
    mutationsSinceCache += 1
    if (mutationsSinceCache >= checkpointEvery) {
      snapshotDf = snapshotDf.localCheckpoint(true)
      logDf = logDf.localCheckpoint(true)
      mutationsSinceCache = 0
    }
  }

  /** Mutation timestamp, captured EAGERLY per mutation as a literal so the
    * lazy log plan re-evaluates to the same value on every action (a lazy
    * `current_timestamp()` would re-stamp `changed_at` per read until the
    * next localCheckpoint).
    */
  private def nowLit: org.apache.spark.sql.Column =
    lit(java.sql.Timestamp.from(java.time.Instant.now()))

  /** INSERT: append rows; capture op=INSERT with new images
    * (reference trigger: cdc_system.py:143-159).
    */
  def insert(rows: DataFrame): Unit = {
    val after = snapshotDf.unionByName(rows.select(spec.columns.map(col): _*))
    commit(after, ChangeCapture.captureChanges(snapshotDf, after, spec, changedAt = nowLit))
  }

  /** UPDATE: `set` maps column -> expression applied where `cond` holds;
    * capture op=UPDATE with old+new images
    * (reference trigger: cdc_system.py:161-179).
    */
  def update(cond: org.apache.spark.sql.Column, set: Map[String, org.apache.spark.sql.Column]): Unit = {
    val after = spec.columns.foldLeft(snapshotDf) { (df, c) =>
      set.get(c).fold(df)(e => df.withColumn(c, when(cond, e).otherwise(col(c))))
    }
    commit(after, ChangeCapture.captureChanges(snapshotDf, after, spec, changedAt = nowLit))
  }

  /** DELETE rows matching `cond`; capture op=DELETE with old images
    * (reference trigger: cdc_system.py:181-197).
    */
  def delete(cond: org.apache.spark.sql.Column): Unit = {
    val after = snapshotDf.filter(!coalesce(cond, lit(false)))
    commit(after, ChangeCapture.captureChanges(snapshotDf, after, spec, changedAt = nowLit))
  }
}

object CdcTable {
  /** Set up capture on a table — the analogue of
    * `setup_trigger_based_cdc(columns)` (reference: cdc_system.py:105-134).
    */
  def apply(initial: DataFrame, spec: CdcTableSpec): CdcTable =
    new CdcTable(spec, initial.select(spec.columns.map(col): _*).localCheckpoint(true))
}

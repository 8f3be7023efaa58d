package graft.monitor

import graft.log.ChangeLog._
import graft.model.CdcConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Monitoring / statistics over the change log — the analytics surface of
  * the reference (`CDCMonitor`, reference: cdc_system.py:353-393).
  */
object CdcMonitor {

  /** Per-operation counts with conditional pending/synced sums — A1 in
    * SURVEY §2.4 (reference: cdc_system.py:248-258):
    *
    * {{{
    * SELECT operation, COUNT(*) total,
    *        SUM(CASE WHEN synced=0 THEN 1 ELSE 0 END) pending,
    *        SUM(CASE WHEN synced=1 THEN 1 ELSE 0 END) synced
    * FROM {t}_cdc GROUP BY operation
    * }}}
    *
    * One hash aggregate; Catalyst does the partial (map-side) combine so
    * the shuffle carries one row per (partition, operation).
    */
  def statistics(log: DataFrame): DataFrame =
    log.groupBy(col(Operation)).agg(
      count(lit(1)).as("total"),
      sum(when(col(Synced) === 0, 1).otherwise(0)).as("pending"),
      sum(when(col(Synced) === 1, 1).otherwise(0)).as("synced"))

  /** Health report — A3 + A5 (reference: cdc_system.py:359-376): totals
    * across operations plus the `pending < threshold ? healthy : warning`
    * classification (threshold 1000 hardcoded at cdc_system.py:373; here a
    * [[CdcConfig]] knob with the same default).
    *
    * Single row out; computed as a second aggregate over [[statistics]]
    * output (tiny) rather than a rollup so both views share one scan.
    */
  def healthReport(log: DataFrame, config: CdcConfig = CdcConfig()): DataFrame =
    statistics(log)
      .agg(
        sum("total").as("total_changes"),
        sum("pending").as("pending_changes"),
        sum("synced").as("synced_changes"))
      .withColumn("health",
        when(col("pending_changes") < config.healthPendingThreshold, lit("healthy"))
          .otherwise(lit("warning")))

  /** Pivot of [[statistics]] to one wide row — the reference renders its
    * stats as a nested dict keyed by operation with total/pending/synced
    * per op (reference: cdc_system.py:260-267); the relational analogue is
    * a pivot carrying all three aggregates. Operations are an enumerated
    * domain so the pivot needs no extra pass to discover keys. Columns:
    * {INSERT,UPDATE,DELETE}_{total,pending,synced}.
    */
  def statisticsWide(log: DataFrame): DataFrame =
    log.groupBy()
      .pivot(Operation, Seq("INSERT", "UPDATE", "DELETE"))
      .agg(
        count(lit(1)).as("total"),
        sum(when(col(Synced) === 0, 1).otherwise(0)).as("pending"),
        sum(when(col(Synced) === 1, 1).otherwise(0)).as("synced"))
      .na.fill(0L)

  /** Driver-side report object, the only place log data crosses to the
    * driver (reference prints a formatted report, cdc_system.py:378-393).
    */
  def healthReportRow(log: DataFrame, config: CdcConfig = CdcConfig()): Map[String, Any] = {
    val r = healthReport(log, config).collect().head
    Map(
      "total_changes" -> r.getAs[Long]("total_changes"),
      "pending_changes" -> r.getAs[Long]("pending_changes"),
      "synced_changes" -> r.getAs[Long]("synced_changes"),
      "health" -> r.getAs[String]("health"),
      "timestamp" -> java.time.Instant.now().toString)
  }
}

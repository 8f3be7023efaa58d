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
    *
    * The sums coalesce to 0 on an empty log: SQL `SUM` over zero rows is
    * NULL, `NULL < threshold` is NULL, and the classification would fall
    * through to 'warning' — the reference's `0 < 1000` comparison on an
    * empty table reports healthy (cdc_system.py:372-373), so must we.
    */
  def healthReport(log: DataFrame, config: CdcConfig = CdcConfig()): DataFrame =
    statistics(log)
      .agg(
        coalesce(sum("total"), lit(0L)).as("total_changes"),
        coalesce(sum("pending"), lit(0L)).as("pending_changes"),
        coalesce(sum("synced"), lit(0L)).as("synced_changes"))
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

  /** Human-formatted health report — the renderer twin of the reference's
    * `print_report` (cdc_system.py:378-393): banner, table name, upper-cased
    * status, totals, and a `  {op}: {total} total, {pending} pending` line
    * per operation present in the log. Operations render in the enum's
    * declaration order (INSERT, UPDATE, DELETE — cdc_system.py:25-29);
    * absent operations are omitted, matching the reference's dict of
    * present-only keys. Driver-side cost is one [[statistics]] collect
    * (≤ 3 rows, the operation domain) — log data itself never leaves the
    * executors. `now` is injectable so tests can pin the timestamp.
    */
  def formatReport(
      log: DataFrame,
      table: String,
      config: CdcConfig = CdcConfig(),
      now: () => String = () => java.time.Instant.now().toString): String = {
    val ops = statistics(log).collect()
      .map(r => r.getAs[String](Operation) ->
        (r.getAs[Long]("total"), r.getAs[Long]("pending")))
      .toMap
    // totals + classification come from healthReport — ONE definition of
    // the health rule (the reference layers print_report over
    // get_health_report the same way, cdc_system.py:380)
    val hr = healthReport(log, config).collect().head
    val total = hr.getAs[Long]("total_changes")
    val pending = hr.getAs[Long]("pending_changes")
    val status = hr.getAs[String]("health").toUpperCase
    val bar = "=" * 60
    val opLines = Seq("INSERT", "UPDATE", "DELETE").flatMap(op =>
      ops.get(op).map { case (t, p) => s"  $op: $t total, $p pending" })
    (Seq(
      bar,
      s"CDC HEALTH REPORT - ${now()}",
      bar,
      s"Table: $table",
      s"Status: $status",
      "",
      s"Total Changes: $total",
      s"Pending: $pending",
      s"Synced: ${total - pending}",
      "",
      "By Operation:") ++ opLines :+ bar).mkString("\n")
  }

  /** Print [[formatReport]] — the side-effecting form matching the
    * reference's API shape (cdc_system.py:378).
    */
  def printReport(log: DataFrame, table: String, config: CdcConfig = CdcConfig()): Unit =
    // scalastyle:off println
    println("\n" + formatReport(log, table, config) + "\n")
    // scalastyle:on println
}

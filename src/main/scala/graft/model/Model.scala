package graft.model

import java.sql.Timestamp

/** CDC operation kinds.
  *
  * Mirrors the reference's `CDCOperation` enum
  * (reference: cdc_system.py:25-29) as a Scala sealed ADT so pattern
  * matches are exhaustiveness-checked at compile time.
  */
sealed abstract class CdcOperation(val name: String)
object CdcOperation {
  case object Insert extends CdcOperation("INSERT")
  case object Update extends CdcOperation("UPDATE")
  case object Delete extends CdcOperation("DELETE")
  val all: Seq[CdcOperation] = Seq(Insert, Update, Delete)
  def fromString(s: String): CdcOperation = all
    .find(_.name == s)
    .getOrElse(throw new IllegalArgumentException(s"unknown CDC operation: $s"))
}

/** One change event in the change log.
  *
  * Typed view of the reference's `{table}_cdc` row
  * (reference: cdc_system.py:115-126). Row images are kept as JSON text at
  * this boundary for wire parity with the reference's `json_object(...)`
  * trigger output (reference: cdc_system.py:145-156); inside the engine the
  * preferred representation is native structs (see
  * [[graft.capture.ChangeCapture]]).
  *
  * Null pattern (reference: cdc_system.py:147-196):
  * INSERT => newData only; UPDATE => both; DELETE => oldData only.
  */
final case class ChangeRecord(
    cdcId: Long,
    operation: String,
    recordId: Long,
    oldData: Option[String],
    newData: Option[String],
    changedAt: Timestamp,
    synced: Int,
    syncTimestamp: Option[Timestamp])

/** Declared spec for a tracked table.
  *
  * Replaces the reference's positional convention where the first element of
  * the tracked column list is silently assumed to be the primary key
  * (reference: cdc_system.py:105,154). Here the PK is explicit and used
  * uniformly by capture AND apply — the reference diverges by hardcoding
  * 'id' in `_apply_update` (reference: cdc_system.py:334-337); we document
  * and fix that divergence.
  */
final case class CdcTableSpec(
    table: String,
    columns: Seq[String],
    pkCol: String) {
  require(columns.contains(pkCol), s"pk $pkCol must be a tracked column")
  def nonKeyColumns: Seq[String] = columns.filterNot(_ == pkCol)
  def changeLogTable: String = s"${table}_cdc"
}

/** Conflict-resolution strategy when one key changes multiple times in a
  * batch (reference: example_usage.py:236-252 documents these as stubs; we
  * implement the two well-defined ones).
  */
sealed trait ConflictStrategy
object ConflictStrategy {
  /** Keep the change with the highest (cdcId) per key — the reference's
    * effective behavior since it applies changes in cdc_id order
    * (reference: cdc_system.py:212,297-304).
    */
  case object LastWriteWins extends ConflictStrategy
  /** Keep the change with the lowest (cdcId) per key. */
  case object FirstWriteWins extends ConflictStrategy
  /** Manual resolution: conflicting keys (more than one change in the
    * batch) are NOT auto-resolved — [[graft.apply.ChangeApplier.splitConflicts]]
    * diverts them to a conflicts view for human/workflow resolution and
    * applies only the unambiguous singletons. Completes the reference's
    * declared strategy quadruple (reference: example_usage.py:236-252,
    * where "manual" is a printed stub).
    */
  case object Manual extends ConflictStrategy
  /** Column-level merge: the surviving change per key carries, for each
    * `new_data` field, the NEWEST NON-NULL value across the key's change
    * images (newest-first coalesce) — so a later partial update (only
    * some fields set) composes with an earlier full image instead of
    * nulling the untouched columns. Operation/bookkeeping come from the
    * latest change; a final DELETE wins entirely (null image). The
    * reference lists "merge" as a strategy but stubs it
    * (reference: example_usage.py:236-252) — this is the well-defined
    * version of that stub.
    */
  case object Merge extends ConflictStrategy
}

/** Engine configuration.
  *
  * Defaults mirror the reference's `CDCConfig` env-var defaults
  * (reference: config.py:33-47) so a reference user can carry over their
  * deployment constants unchanged.
  */
final case class CdcConfig(
    batchSize: Int = 100,
    syncIntervalSeconds: Int = 5,
    maxRetries: Int = 3,
    retryDelaySeconds: Int = 10,
    cdcStrategy: String = "trigger", // trigger | timestamp | version (all implemented)
    enableMetrics: Boolean = true,
    metricsIntervalSeconds: Int = 60,
    /** pending < threshold => "healthy" (reference: cdc_system.py:373). */
    healthPendingThreshold: Long = 1000L)

object CdcConfig {
  /** Load from environment variables with the reference's names and
    * defaults (reference: config.py:50-62). Unset/malformed vars fall back
    * to the default, matching `os.getenv(..., default)` + int() behavior
    * for the sane cases.
    */
  def fromEnv(env: Map[String, String] = sys.env): CdcConfig = {
    def intVar(name: String, dflt: Int): Int =
      env.get(name).flatMap(_.toIntOption).getOrElse(dflt)
    def boolVar(name: String, dflt: Boolean): Boolean =
      env.get(name).map(_.equalsIgnoreCase("true")).getOrElse(dflt)
    val d = CdcConfig()
    CdcConfig(
      batchSize = intVar("CDC_BATCH_SIZE", d.batchSize),
      syncIntervalSeconds = intVar("CDC_SYNC_INTERVAL", d.syncIntervalSeconds),
      maxRetries = intVar("CDC_MAX_RETRIES", d.maxRetries),
      retryDelaySeconds = intVar("CDC_RETRY_DELAY", d.retryDelaySeconds),
      cdcStrategy = env.getOrElse("CDC_STRATEGY", d.cdcStrategy),
      enableMetrics = boolVar("CDC_ENABLE_METRICS", d.enableMetrics),
      metricsIntervalSeconds = intVar("CDC_METRICS_INTERVAL", d.metricsIntervalSeconds),
      healthPendingThreshold = d.healthPendingThreshold)
  }
}

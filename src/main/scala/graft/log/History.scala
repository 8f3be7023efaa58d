package graft.log

import graft.apply.ChangeApplier
import graft.log.ChangeLog._
import graft.model.{CdcTableSpec, ConflictStrategy}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** History-preserving views over the ordered change log — the operations a
  * warehouse derives FROM a CDC feed once it has one: versioned history
  * (SCD Type 2), point-in-time reconstruction, and net-effect log
  * compaction.
  *
  * The reference applies changes destructively (its target holds only the
  * latest image — reference: cdc_system.py:293-321) and keeps history only
  * implicitly, as unpurged log rows. These operators make that implicit
  * history first-class, purely as declarative plans over the same log:
  * nothing here introduces new state or mutates anything.
  */
object History {

  /** SCD Type 2 version history: one row per VERSION a key ever had, with
    * `[valid_from, valid_to)` expressed in log positions (`cdc_id`) and an
    * `is_current` flag. The base snapshot is version 0 (`valid_from = 0`)
    * for every key present in it; each INSERT/UPDATE in the log opens a
    * new version at its `cdc_id`; a DELETE closes the current version
    * without opening one (the key then has NO current row).
    *
    * Formulation: union the base (as position-0 pseudo-events) with the
    * log's image stream, take `lead(cdc_id)` per key in log order as each
    * version's close position, then drop DELETE tombstones — they exist
    * only to close their predecessor. One union and ONE shuffle (the
    * per-key window); state per task is the single lookahead row. At
    * 100 TB the window key is the table's primary key, so parallelism is
    * full key cardinality — no global sort, no driver state.
    *
    * Contract: `cdc_id` 0 is reserved for the base snapshot (capture
    * assigns real ids from 1 / from a positive packed envelope); per-key
    * `cdc_id` ties are impossible by the log's id contract.
    */
  def scd2(base: DataFrame, log: DataFrame, spec: CdcTableSpec): DataFrame = {
    val baseEvents = base.select(
      lit(0L).as(CdcId),
      col(spec.pkCol).cast(LongType).as(RecordId),
      struct(spec.columns.map(col): _*).as("__img"))
    val logEvents = log.select(
      col(CdcId),
      col(RecordId),
      when(col(Operation) === "DELETE", lit(null)).otherwise(col(NewData)).as("__img"))
    val w = Window.partitionBy(col(RecordId)).orderBy(col(CdcId))
    baseEvents.unionByName(logEvents)
      .withColumn("valid_to", lead(col(CdcId), 1).over(w))
      .filter(col("__img").isNotNull) // tombstones only close predecessors
      .select(
        col(RecordId) +:
          spec.columns.map(c => col(s"__img.$c").as(c)) :+
          col(CdcId).as("valid_from") :+
          col("valid_to") :+
          when(col("valid_to").isNull, lit(1)).otherwise(lit(0)).as("is_current"): _*)
  }

  /** Net-effect compaction of a change log: collapse each key's change
    * sequence to the single change that takes a downstream replica from
    * the pre-log state to the post-log state (the log-compaction semantics
    * of a keyed changelog topic). Per key:
    *
    *   - first op INSERT and last op DELETE → the key never existed for a
    *     consumer that applies the compacted log: emitted NOWHERE;
    *   - last op DELETE (key pre-existed) → a single DELETE;
    *   - first op INSERT (still live) → a single INSERT with the LAST image;
    *   - otherwise → a single UPDATE with the last image.
    *
    * Output: (record_id, operation, new_data, n_changes, first_id,
    * last_id) — the audit columns record what was collapsed.
    *
    * Shape: ONE hash aggregate, fully map-side combinable (`min_by` /
    * `max_by` partial state is one (id, value) pair each) — shuffle volume
    * is O(distinct keys), never O(log rows). This is the operation that
    * keeps a 100 TB log replayable: a backlog of months compacts to at
    * most one row per live key before apply. The last image is taken with
    * `max_by` over only non-DELETE positions: whenever the net op needs an
    * image, the latest non-delete IS the latest change, and skipping
    * null-image DELETE rows keeps the aggregate's null semantics identical
    * across engines.
    */
  def compactLog(log: DataFrame): DataFrame =
    log.groupBy(col(RecordId))
      .agg(
        min_by(col(Operation), col(CdcId)).as("__first_op"),
        max_by(col(Operation), col(CdcId)).as("__last_op"),
        max_by(col(NewData),
          when(col(Operation) =!= "DELETE", col(CdcId))).as("__last_img"),
        count(lit(1)).as("n_changes"),
        min(col(CdcId)).as("first_id"),
        max(col(CdcId)).as("last_id"))
      .filter(!(col("__first_op") === "INSERT" && col("__last_op") === "DELETE"))
      .select(
        col(RecordId),
        when(col("__last_op") === "DELETE", lit("DELETE"))
          .when(col("__first_op") === "INSERT", lit("INSERT"))
          .otherwise(lit("UPDATE")).as(Operation),
        when(col("__last_op") === "DELETE", lit(null)).otherwise(col("__last_img"))
          .as(NewData),
        col("n_changes"), col("first_id"), col("last_id"))

  /** Point-in-time reconstruction: the table state as of log position
    * `asOfId` (inclusive) — time travel over base + log, without any
    * stored snapshots. Changes past the position are simply not applied;
    * the plan is the standard apply (dedup-to-latest + anti-join + union)
    * over the filtered log, so it inherits [[ChangeApplier.applyChanges]]'
    * scale shape, with the `cdc_id` filter pushed to the log scan (and at
    * scale, pruning the log's date partitions).
    */
  def snapshotAsOf(
      base: DataFrame,
      log: DataFrame,
      spec: CdcTableSpec,
      asOfId: Long): DataFrame =
    ChangeApplier.applyChanges(
      base, log.filter(col(CdcId) <= asOfId), spec, ConflictStrategy.LastWriteWins)

  /** The consumer-side SCD2 lookup: each key's version valid AT log
    * position `pos` — `valid_from <= pos < valid_to` with open (current)
    * intervals passing, keys deleted before `pos` absent. Where
    * [[snapshotAsOf]] RECONSTRUCTS state from base + log, this READS an
    * already-materialized history — a narrow filter, no join, no
    * shuffle; on a history laid out by `valid_from` (date/range
    * partitions at scale) both bounds push into the scan and prune it.
    */
  def versionAt(history: DataFrame, pos: Long): DataFrame =
    history.filter(col("valid_from") <= pos &&
      (col("valid_to").isNull || col("valid_to") > pos))

  /** Point-in-time LOOKUP JOIN: each probe row `(key, pos)` matched to
    * the history version valid AT that position — the per-row
    * generalization of [[versionAt]]'s single global position, and the
    * enrichment join every "join facts to the dimension as it was THEN"
    * pipeline needs against an SCD2 table.
    *
    * Formulation: the naive join condition (`valid_from <= pos AND
    * (valid_to IS NULL OR valid_to > pos)`) is an inequality join Spark
    * can only plan as a nested loop. But versions are per-key
    * non-overlapping, so "the version valid at pos" IS "the LATEST
    * version opened at or before pos" — an as-of join. This reuses
    * [[graft.ext.EventAnalytics.asOfJoin]]'s linear union+window plan:
    * ONE shuffle on the key, O(1) carried state, no pair enumeration —
    * then nulls out the match when that version closed before the probe
    * (`valid_to <= pos`: the key was deleted and the probe falls in the
    * gap).
    *
    * Output: struct columns `l` (the probe row) and `r` (the matched
    * version, NULL when no version covers the position). `probes` must
    * expose `keyCol` and `posCol`; `history` is [[scd2]] output (exposes
    * `keyCol`, `valid_from`, `valid_to`).
    */
  def pitLookup(
      history: DataFrame,
      probes: DataFrame,
      keyCol: String,
      posCol: String): DataFrame = {
    val h = history.withColumn(posCol, col("valid_from"))
    graft.ext.EventAnalytics.asOfJoin(probes, h, keyCol, posCol, posCol)
      .withColumn("r",
        when(col("r.valid_to").isNull || col("r.valid_to") > col(s"l.$posCol"),
          col("r")))
  }

  /** Open-interval sentinel: `valid_to IS NULL` (current version) ordered
    * after every real close position. Interval arithmetic on
    * `coalesce(valid_to, Inf)` with a final `nullif` is portable across
    * engines where aggregate null-skipping semantics (max_by over null
    * values) are not.
    */
  private val Inf = Long.MaxValue

  /** Temporal COALESCING: collapse adjacent versions whose projection on
    * `cols` is unchanged — the attribute-timeline view of an SCD2 table
    * ("when did the STATUS change", ignoring versions opened by other
    * columns' churn). Classic temporal-database normalization: without
    * it, every downstream interval join pays the full version count of
    * the most-churning column.
    *
    * Islands per key: a version starts a new island when its `cols`
    * values differ (null-safely) from its predecessor's, OR when it is
    * not contiguous with it (`valid_from ≠` predecessor's `valid_to` —
    * a DELETE/re-INSERT gap must never merge, even with equal values).
    * One shuffle (per-key window), then a per-island aggregate on the
    * same key — island count ≤ version count, so state is bounded by
    * per-key churn.
    *
    * Output: `record_id`, `cols`, `[valid_from, valid_to)`, `is_current`
    * — the same shape as [[scd2]] restricted to `cols`.
    */
  def coalesceVersions(history: DataFrame, cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(RecordId)).orderBy(col("valid_from"))
    val valueChanged = cols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    val gap = !(lag(col("valid_to"), 1).over(w) <=> col("valid_from"))
    history
      .select(col(RecordId) +: cols.map(col) :+ col("valid_from") :+
        col("valid_to") :+ col("is_current"): _*)
      .withColumn("__island",
        sum(when(row_number().over(w) === 1 || valueChanged || gap, 1).otherwise(0))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(RecordId), col("__island"))
      .agg(
        first(col(cols.head)).as(cols.head),
        cols.tail.map(c => first(col(c)).as(c)) ++ Seq(
          min(col("valid_from")).as("valid_from"),
          max(coalesce(col("valid_to"), lit(Inf))).as("__to"),
          max(col("is_current")).as("is_current")): _*)
      .select(col(RecordId) +: cols.map(col) :+ col("valid_from") :+
        nullif(col("__to"), lit(Inf)).as("valid_to") :+ col("is_current"): _*)
  }

  /** Temporal (duration-weighted) AGGREGATE: how long the table's keys
    * dwell in each state — `sum/count` of version interval lengths
    * grouped by the version's attribute values. THE question an SCD2
    * table exists to answer ("average time an order spends in each
    * status") that the latest-state target cannot. Open intervals are
    * closed at `horizon` (the read position — pass the current max log
    * position, or a pinned audit point).
    *
    * ONE map-side-combined hash aggregate over the history; shuffle is
    * O(distinct attribute values).
    */
  def dwell(history: DataFrame, cols: Seq[String], horizon: Long): DataFrame =
    history.groupBy(cols.map(col): _*)
      .agg(
        count(lit(1)).as("n_versions"),
        // DECIMAL(38,0) accumulator, not BIGINT: each open interval dwells
        // ~horizon (2^41 for the packed-id envelope), so a long sum
        // overflows past ~2^22 open rows — the sf10 sweep hit exactly
        // this (15 M orders × 2^41 ≈ 2^64.8). Per-row differences still
        // fit a long; only the accumulator needs the headroom. Exact
        // integer arithmetic either way — oracle twins cast identically.
        sum((coalesce(col("valid_to"), lit(horizon)) - col("valid_from"))
          .cast("decimal(38,0)"))
          .as("total_dwell"))

  /** Temporal ALIGN join: intersect two version histories of the same key
    * space — each output row is a maximal interval over which BOTH sides'
    * attributes were simultaneously valid, carrying both projections
    * (TSQL2's temporal inner join). Aligning the per-attribute timelines
    * produced by [[coalesceVersions]] reconstructs the combined history:
    * `align(coalesce(H, a), coalesce(H, b)) = H` projected on `a ∪ b`.
    *
    * Formulation: per-key versions are non-overlapping and few (bounded
    * by the key's change count, never by table size), so the plan is a
    * plain hash equi-join on the key with the interval-intersection
    * predicate applied as a filter — per-key fanout is
    * `versions_a × versions_b`, pruned to the intersecting pairs. For
    * pathological churn (thousands of versions on one key), pre-bucket
    * both sides by position range first (the [[graft.ext.RangeJoin]]
    * grid), same contract.
    *
    * `aCols`/`bCols` must be disjoint; both inputs need `record_id`,
    * `valid_from`, `valid_to`, `is_current`.
    */
  def alignHistories(
      a: DataFrame,
      b: DataFrame,
      aCols: Seq[String],
      bCols: Seq[String]): DataFrame = {
    val l = a.select(col(RecordId) +: aCols.map(col) :+
      col("valid_from").as("__af") :+
      coalesce(col("valid_to"), lit(Inf)).as("__at"): _*)
    val r = b.select(col(RecordId).as("__rid") +: bCols.map(col) :+
      col("valid_from").as("__bf") :+
      coalesce(col("valid_to"), lit(Inf)).as("__bt"): _*)
    l.join(r, col(RecordId) === col("__rid") &&
        greatest(col("__af"), col("__bf")) < least(col("__at"), col("__bt")))
      .select(col(RecordId) +: (aCols ++ bCols).map(col) :+
        greatest(col("__af"), col("__bf")).as("valid_from") :+
        nullif(least(col("__at"), col("__bt")), lit(Inf)).as("valid_to") :+
        when(least(col("__at"), col("__bt")) === Inf, lit(1)).otherwise(lit(0))
          .as("is_current"): _*)
  }
}

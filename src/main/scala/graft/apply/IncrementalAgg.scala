package graft.apply

import graft.log.ChangeLog._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental maintenance of a grouped aggregate from a change log —
  * the materialized-view side of a CDC system.
  *
  * The reference recomputes its statistics view from the full audit table
  * on every call (reference: cdc_system.py:248-268, a fresh `GROUP BY`
  * over `{table}_cdc`). That is O(log) per refresh; at 100 TB the
  * equivalent "recompute the dashboard aggregate from the base table" is
  * O(base) — unrunnable per micro-batch. The standard incremental-view
  * answer (self-maintainable SPJ+count/sum views) maintains the aggregate
  * from the *changes alone*:
  *
  *   - every change row contributes ±(count, value) deltas: the old image
  *     retracts from its group, the new image asserts into its group (an
  *     UPDATE whose group key changed thus moves mass between groups);
  *   - deltas aggregate with map-side partial combine — the shuffle is
  *     O(groups), never O(changes);
  *   - one outer merge join against the stored aggregate (O(groups), tiny,
  *     broadcast-able) produces the refreshed view; groups whose count
  *     reaches zero disappear, matching a full recompute exactly.
  *
  * COUNT and SUM are self-maintainable under insert/update/delete; MIN/MAX
  * are not (a delete of the current max needs base data) — callers needing
  * those must fall back to recompute, which is why this operator exposes
  * exactly the count+sum family.
  *
  * Sums are carried as `DECIMAL` so that base + delta − retraction is
  * EXACT arithmetic: the maintained view is bit-identical to a recompute,
  * not merely close (double sums would drift by association order).
  */
object IncrementalAgg {

  /** `groupBy(key).agg(count(*), sum(value))` over a base snapshot, in the
    * exact decimal shape [[maintain]] preserves. `cnt` is BIGINT; `total`
    * is DECIMAL(28,4) (Spark's sum-of-DECIMAL(18,4) result type).
    */
  def snapshotAgg(base: DataFrame, keyCol: String, valueCol: String): DataFrame =
    base.groupBy(col(keyCol).as("g_key"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col(valueCol).cast(DecimalType(18, 4))).as("total"))

  /** Per-group ±deltas contributed by a change batch. One scan of the
    * changes: each row explodes into a retraction (old image) and/or an
    * assertion (new image); nulls (absent images) are filtered before the
    * aggregate, and the aggregate itself is a plain hash-agg with partial
    * combine.
    */
  def deltas(changes: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val oldImg = col(OldData)
    val newImg = col(NewData)
    val contrib = array(
      when(oldImg.isNotNull, struct(
        oldImg.getField(keyCol).as("g_key"),
        lit(-1L).as("d_cnt"),
        (-oldImg.getField(valueCol).cast(DecimalType(18, 4))).as("d_total"))),
      when(newImg.isNotNull, struct(
        newImg.getField(keyCol).as("g_key"),
        lit(1L).as("d_cnt"),
        newImg.getField(valueCol).cast(DecimalType(18, 4)).as("d_total"))))
    changes
      .select(explode(contrib).as("c"))
      .filter(col("c").isNotNull)
      .select(col("c.g_key"), col("c.d_cnt"), col("c.d_total"))
      .groupBy("g_key")
      .agg(sum(col("d_cnt")).as("d_cnt"), sum(col("d_total")).as("d_total"))
  }

  /** Merge a stored aggregate with a change batch: the refreshed view,
    * equal (exactly — decimal arithmetic) to recomputing [[snapshotAgg]]
    * on the post-change snapshot. The join is on the group key: O(groups)
    * on both sides regardless of base/batch size.
    */
  def maintain(storedAgg: DataFrame, changes: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val d = deltas(changes, keyCol, valueCol)
    val b = storedAgg.select(col("g_key"), col("cnt"), col("total"))
    // null-safe equality: a NULL group key must merge with its delta row,
    // not emit stale-base + standalone-delta duplicates
    b.join(d.withColumnRenamed("g_key", "d_key"),
        col("g_key") <=> col("d_key"), "full_outer")
      .select(
        coalesce(col("g_key"), col("d_key")).as("g_key"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L))).as("cnt"),
        // decimal addition widens to (29,4); clamp back to the stored
        // view's (28,4) so maintain(view) round-trips through parquet
        // with a stable schema (values are far below either bound)
        (coalesce(col("total"), lit(0).cast(DecimalType(28, 4))) +
          coalesce(col("d_total"), lit(0).cast(DecimalType(28, 4))))
          .cast(DecimalType(28, 4)).as("total"))
      .filter(col("cnt") > 0)
  }

  /** `groupBy(key).agg(count, sum, sum-of-squares)` over a base snapshot
    * — the second-moment extension of [[snapshotAgg]], from which a
    * mean/variance/stddev dashboard derives at read time. Squares are
    * exact decimals ((18,4)² = (37,8), clamped to the stable (38,8)
    * storage type), so the maintained moments are bit-identical to a
    * recompute. COUNT/SUM/SUMSQ are all self-maintainable — variance
    * views need no dirty-group fallback, unlike MIN/MAX.
    */
  def snapshotMoments(base: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast(DecimalType(18, 4))
    base.groupBy(col(keyCol).as("g_key"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(v).as("total"),
        sum((v * v).cast(DecimalType(38, 8))).as("total_sq"))
  }

  /** Merge stored moments with a change batch — [[maintain]]'s recipe
    * with the squared term riding the same ±delta explosion and the
    * same O(groups) outer merge. Exactly equal to recomputing
    * [[snapshotMoments]] on the post-change snapshot.
    */
  def maintainMoments(storedMoments: DataFrame, changes: DataFrame,
                      keyCol: String, valueCol: String): DataFrame = {
    val oldImg = col(OldData)
    val newImg = col(NewData)
    def sq(img: org.apache.spark.sql.Column) = {
      val v = img.getField(valueCol).cast(DecimalType(18, 4))
      (v * v).cast(DecimalType(38, 8))
    }
    val contrib = array(
      when(oldImg.isNotNull, struct(
        oldImg.getField(keyCol).as("g_key"),
        lit(-1L).as("d_cnt"),
        (-oldImg.getField(valueCol).cast(DecimalType(18, 4))).as("d_total"),
        (-sq(oldImg)).as("d_total_sq"))),
      when(newImg.isNotNull, struct(
        newImg.getField(keyCol).as("g_key"),
        lit(1L).as("d_cnt"),
        newImg.getField(valueCol).cast(DecimalType(18, 4)).as("d_total"),
        sq(newImg).as("d_total_sq"))))
    val d = changes
      .select(explode(contrib).as("c"))
      .filter(col("c").isNotNull)
      .select(col("c.g_key"), col("c.d_cnt"), col("c.d_total"), col("c.d_total_sq"))
      .groupBy("g_key")
      .agg(sum(col("d_cnt")).as("d_cnt"), sum(col("d_total")).as("d_total"),
        sum(col("d_total_sq")).as("d_total_sq"))
    storedMoments.select(col("g_key"), col("cnt"), col("total"), col("total_sq"))
      .join(d.withColumnRenamed("g_key", "d_key"),
        col("g_key") <=> col("d_key"), "full_outer")
      .select(
        coalesce(col("g_key"), col("d_key")).as("g_key"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L))).as("cnt"),
        (coalesce(col("total"), lit(0).cast(DecimalType(28, 4))) +
          coalesce(col("d_total"), lit(0).cast(DecimalType(28, 4))))
          .cast(DecimalType(28, 4)).as("total"),
        (coalesce(col("total_sq"), lit(0).cast(DecimalType(38, 8))) +
          coalesce(col("d_total_sq"), lit(0).cast(DecimalType(38, 8))))
          .cast(DecimalType(38, 8)).as("total_sq"))
      .filter(col("cnt") > 0)
  }

  /** Per-(group, value) multiplicity support table — the auxiliary state
    * that makes COUNT(DISTINCT) self-maintainable. COUNT DISTINCT is NOT
    * self-maintainable from the view alone (a delete of a value's last
    * row must drop it from the distinct set, but the view doesn't know
    * it was the last) — the textbook fix is to store value
    * MULTIPLICITIES: then every change is a ±1 on its (group, value)
    * cell, a cell reaching 0 leaves the set, and the distinct count is
    * the cell count. State is O(groups × distinct values) — far below
    * the base at any realistic key cardinality, and partitioned by the
    * same group key as every other maintained view.
    */
  def snapshotDistinct(base: DataFrame, keyCol: String, valueCol: String): DataFrame =
    base.groupBy(col(keyCol).as("g_key"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("vcnt"))

  /** Merge the stored support table with a change batch: [[maintain]]'s
    * ±delta explosion keyed on (group, value), one O(support ∩ batch)
    * null-safe outer merge, cells at 0 dropped. Exactly equal to
    * recomputing [[snapshotDistinct]] on the post-change snapshot.
    */
  def maintainDistinct(storedSupport: DataFrame, changes: DataFrame,
                       keyCol: String, valueCol: String): DataFrame = {
    val oldImg = col(OldData)
    val newImg = col(NewData)
    val contrib = array(
      when(oldImg.isNotNull, struct(
        oldImg.getField(keyCol).as("g_key"),
        oldImg.getField(valueCol).as("v"),
        lit(-1L).as("d"))),
      when(newImg.isNotNull, struct(
        newImg.getField(keyCol).as("g_key"),
        newImg.getField(valueCol).as("v"),
        lit(1L).as("d"))))
    val d = changes
      .select(explode(contrib).as("c"))
      .filter(col("c").isNotNull)
      .select(col("c.g_key"), col("c.v"), col("c.d"))
      .groupBy("g_key", "v")
      .agg(sum(col("d")).as("d"))
    storedSupport.select(col("g_key"), col("v"), col("vcnt"))
      .join(d.withColumnRenamed("g_key", "d_key").withColumnRenamed("v", "d_v"),
        col("g_key") <=> col("d_key") && col("v") <=> col("d_v"), "full_outer")
      .select(
        coalesce(col("g_key"), col("d_key")).as("g_key"),
        coalesce(col("v"), col("d_v")).as("v"),
        (coalesce(col("vcnt"), lit(0L)) + coalesce(col("d"), lit(0L))).as("vcnt"))
      .filter(col("vcnt") > 0)
  }

  /** The COUNT(DISTINCT) dashboard read off a [[snapshotDistinct]]-shaped
    * support table: distinct values (NULL excluded — SQL COUNT(DISTINCT)
    * semantics) and total rows per group. O(support) — never touches
    * base data.
    */
  def distinctView(support: DataFrame): DataFrame =
    support.groupBy(col("g_key"))
      .agg(count(col("v")).as("n_distinct"), sum(col("vcnt")).as("n_rows"))

  /** `groupBy(key).agg(min(value), max(value))` over a base snapshot, in
    * the exact decimal shape [[maintainMinMax]] preserves.
    */
  def snapshotMinMax(base: DataFrame, keyCol: String, valueCol: String): DataFrame =
    base.groupBy(col(keyCol).as("g_key"))
      .agg(
        min(col(valueCol).cast(DecimalType(18, 4))).as("min_val"),
        max(col(valueCol).cast(DecimalType(18, 4))).as("max_val"))

  /** Incremental maintenance of a MIN/MAX view — the NON-self-maintainable
    * aggregate family [[maintain]]'s scaladoc excludes: a delete of the
    * current max cannot be undone from the change alone (the runner-up
    * lives only in base data). The standard answer is DIRTY-GROUP
    * recompute:
    *
    *   - the change batch names the affected groups — both images' keys,
    *     so an UPDATE that moves a row between groups dirties both sides;
    *     O(batch) work, distinct-collapsed to O(dirty groups);
    *   - ONLY dirty groups are recomputed, from the post-change target the
    *     CDC apply step maintains anyway ([[ChangeApplier.applyChanges]]):
    *     the dirty-key semi-join (broadcast at batch scale) means only
    *     those groups' rows flow into the aggregate — with the target
    *     partitioned/z-ordered by the group key this is a partition-pruned
    *     scan, never O(target);
    *   - unchanged groups are carried from the stored view byte-identically
    *     (anti-join on the dirty set, O(groups)); a group whose rows all
    *     died recomputes to empty and correctly disappears.
    *
    * Null-safe on the group key throughout (`<=>`): a NULL-keyed group
    * dirties and recomputes like any other. Equal to recomputing
    * [[snapshotMinMax]] on the post-change snapshot — exactly, decimal
    * arithmetic end to end.
    */
  def maintainMinMax(
      storedView: DataFrame,
      changes: DataFrame,
      postChangeBase: DataFrame,
      keyCol: String,
      valueCol: String): DataFrame = {
    // absent images (INSERT's old / DELETE's new) must NOT dirty anything,
    // while a PRESENT image whose group key is genuinely NULL must dirty
    // the NULL group — so presence is carried as the struct's own
    // nullability, not the key's
    val dirty = changes
      .select(explode(array(
        when(col(OldData).isNotNull,
          struct(col(OldData).getField(keyCol).as("k"))),
        when(col(NewData).isNotNull,
          struct(col(NewData).getField(keyCol).as("k"))))).as("c"))
      .filter(col("c").isNotNull)
      .select(col("c.k").as("d_key"))
      .distinct()
    val recomputed = snapshotMinMax(
      postChangeBase.join(dirty, col(keyCol) <=> col("d_key"), "left_semi"),
      keyCol, valueCol)
    storedView
      .join(dirty, col("g_key") <=> col("d_key"), "left_anti")
      .unionByName(recomputed)
  }
}

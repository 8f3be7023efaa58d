package graft.apply

import graft.log.ChangeLog._
import graft.model.{CdcTableSpec, ConflictStrategy}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a JOIN view from a change log — the second
  * member (after [[IncrementalAgg]]) of the materialized-view family a CDC
  * deployment feeds.
  *
  * The view is `V = fact ⋈ dim` (equi-join of the replicated fact table
  * against a dimension, keeping a projection of dim columns — the
  * "enriched orders" shape every reporting layer builds). The reference
  * recomputes such views from scratch on every read (reference:
  * cdc_system.py:248-268 rebuilds its reporting aggregate from the full
  * audit table); at 100 TB a recompute rescans and reshuffles the whole
  * fact table per refresh. The standard delta-propagation answer
  * (self-maintainable SPJ views): only CHANGED fact rows re-enter the
  * join —
  *
  *   1. collapse the batch to one final image per key
  *      ([[ChangeApplier.dedupToLatest]] — last-write-wins);
  *   2. join the surviving new images (an O(batch)-row frame) against the
  *      dimension — AQE broadcasts the small side at runtime, so the fact
  *      table's bulk NEVER shuffles;
  *   3. merge: changed keys leave the stored view (anti-join on the fact
  *      pk — with a bucketed/partitioned view layout this prunes to the
  *      touched buckets, the same layout contract as
  *      [[ChangeApplier.applyChangesBucketed]]), surviving enriched
  *      images union back in.
  *
  * Work per refresh is O(batch ⋈ dim) + O(view-merge), never O(fact ⋈
  * dim). The result is EXACTLY a recompute of the view over the
  * post-change snapshot (inner-join semantics: an upserted row whose fk
  * has no dim match drops out of the view, as a recompute would drop it).
  *
  * DIM-SIDE changes are out of scope by design: a changed dim row
  * invalidates every fact row referencing it, which is a fact-side scan
  * unless the view is co-clustered on the fk — the standard warehouse
  * answer is to historize the dimension instead (SCD2,
  * [[graft.log.History.scd2]]) and enrich point-in-time via
  * [[graft.log.History.pitLookup]]; this operator covers the
  * static-or-slowly-snapshotted dim refresh in between.
  */
object IncrementalJoin {

  /** The view over a base snapshot: `fact ⋈ dim` on `fkCol = dimKey`,
    * carrying all of `spec.columns` plus `dimCols` (pre-aliased columns
    * of `dim`). The shape [[maintain]] preserves.
    */
  def snapshotView(
      fact: DataFrame,
      dim: DataFrame,
      spec: CdcTableSpec,
      fkCol: String,
      dimKey: String,
      dimCols: Seq[String]): DataFrame =
    fact.select(spec.columns.map(col): _*)
      .join(dim.select((dimKey +: dimCols).distinct.map(col): _*),
        col(fkCol) === col(dimKey))
      .select((spec.columns ++ dimCols).map(col): _*)

  /** Refresh a stored join view from a change batch on the fact side.
    * Returns the new view, equal to [[snapshotView]] over the post-change
    * fact snapshot.
    */
  def maintain(
      storedView: DataFrame,
      changes: DataFrame,
      dim: DataFrame,
      spec: CdcTableSpec,
      fkCol: String,
      dimKey: String,
      dimCols: Seq[String],
      strategy: ConflictStrategy = ConflictStrategy.LastWriteWins): DataFrame = {
    val latest = ChangeApplier.dedupToLatest(changes, strategy)
      .select(col(RecordId), col(Operation), col(NewData))

    // O(batch) new images, enriched against the dim. Inner join: images
    // with no dim match vanish from the view — recompute parity.
    val upserts = latest
      .filter(col(Operation) =!= "DELETE")
      .select(spec.columns.map(c => col(s"$NewData.$c").as(c)): _*)
    val enriched = upserts
      .join(dim.select((dimKey +: dimCols).distinct.map(col): _*),
        col(fkCol) === col(dimKey))
      .select((spec.columns ++ dimCols).map(col): _*)

    // Every changed key's old view rows leave (replaced or deleted).
    val changedKeys = latest.select(col(RecordId).as(spec.pkCol))
    storedView.join(changedKeys, Seq(spec.pkCol), "left_anti")
      .unionByName(enriched)
  }
}

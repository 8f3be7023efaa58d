package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment (range) join. Spark plans a raw
  * `lo <= p AND p <= hi` join as a broadcast-nested-loop — O(|points| ×
  * |intervals|) compares, a scale-killer once the interval side outgrows
  * a broadcast. The standard fix is BUCKETING: quantize the number line
  * into `bucketWidth` cells, replicate each interval into every cell it
  * overlaps, give each point its single cell, and the containment join
  * becomes a hash EQUI-join on the cell id + a residual range filter.
  */
object RangeJoin {

  /** All (point, interval) pairs with `lo <= point <= hi`.
    *
    * `points` keeps its columns; matched interval columns are appended.
    * Shuffle structure: one hash-partitioned equi-join on the bucket id.
    * Replication cost is `ceil(span / bucketWidth) + 1` rows per interval
    * — linear in total interval span, NOT in |points| × |intervals|.
    * Pick `bucketWidth` near the typical interval span: each interval
    * then lands in 1-2 buckets while point buckets stay selective. A
    * point matches an interval in exactly ONE bucket (its own), so no
    * post-join dedup is needed. Works for any numeric axis (price bands,
    * IP ranges, time windows, genomic intervals).
    */
  def bandJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    // the output is points' columns ++ intervals' columns — that contract
    // (and unambiguous resolution of the residual filter) needs the two
    // sides' names disjoint and the internal bucket name free
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
    require(clash.isEmpty,
      s"points and intervals must not share column names: ${clash.mkString(", ")}")
    require(!points.columns.contains("__bucket") && !intervals.columns.contains("__bucket"),
      "'__bucket' is reserved by bandJoin")
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val iv = intervals
      .withColumn("__bucket",
        explode(sequence(
          floor(col(loCol) / bucketWidth).cast("long"),
          floor(col(hiCol) / bucketWidth).cast("long"))))
      // an inverted interval (hi < lo) matches nothing, and sequence()
      // would walk backwards — drop such rows up front
      .where(col(loCol) <= col(hiCol))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** All (left, right) pairs of CLOSED intervals that overlap:
    * `loA <= hiB AND loB <= hiA` — interval × interval, where [[bandJoin]]
    * is point × interval. Same bucketing discipline: both sides replicate
    * into every `bucketWidth` cell they span, the join is a hash
    * EQUI-join on the cell id, and a pair is EMITTED ONLY IN THE CELL
    * CONTAINING `max(loA, loB)` (the leftmost cell where both intervals
    * are present) — the classic one-cell ownership rule that makes the
    * output duplicate-free without a distinct. Replication stays linear
    * in total interval span on each side; no all-pairs compare ever
    * happens, which is what lets two 100 TB interval sets (sessions ×
    * incident windows, reservations × maintenance, reads × genes) join
    * on a time axis.
    *
    * Inverted intervals (hi < lo) match nothing and are dropped up front.
    * Output: left's columns ++ right's columns (names must be disjoint).
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      loA: String,
      hiA: String,
      loB: String,
      hiB: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty,
      s"left and right must not share column names: ${clash.mkString(", ")}")
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "'__bucket' is reserved by overlapJoin")
    def spanned(df: DataFrame, lo: String, hi: String) = df
      .where(col(lo) <= col(hi))
      .withColumn("__bucket",
        explode(sequence(
          floor(col(lo) / bucketWidth).cast("long"),
          floor(col(hi) / bucketWidth).cast("long"))))
    spanned(left, loA, hiA).join(spanned(right, loB, hiB), Seq("__bucket"))
      .filter(col(loA) <= col(hiB) && col(loB) <= col(hiA))
      .filter(floor(greatest(col(loA), col(loB)) / bucketWidth).cast("long") ===
        col("__bucket"))
      .drop("__bucket")
  }
}

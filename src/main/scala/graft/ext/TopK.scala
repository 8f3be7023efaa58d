package graft.ext

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One (score, id) candidate flowing through [[TopKAggregator]]. */
final case class ScoredId(score: Double, id: Long)

/** Bounded top-k typed aggregator: keeps the k best (score desc, id asc)
  * candidates seen so far in a sorted buffer of size <= k.
  *
  * This is the scale-correct replacement for
  * `row_number().over(Window.partitionBy("query_id"))` top-k: a window
  * routes EVERY scored row for a query into one task (parallelism collapses
  * to #queries, each task holds a corpus-sized partition), whereas an
  * Aggregator participates in partial aggregation — each map task reduces
  * its partition to <= k rows per query BEFORE the shuffle, so shuffle
  * traffic is k x maps x queries regardless of corpus size, and no task
  * ever holds more than k candidates per group.
  *
  * Ties break on ascending id, making the survivor SET deterministic under
  * any partitioning / merge order (ids are assumed distinct per group).
  */
final class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"k must be positive, got $k")

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: List[ScoredId] = Nil

  override def reduce(buf: List[ScoredId], x: ScoredId): List[ScoredId] =
    mergeSorted(buf, x :: Nil)

  override def merge(b1: List[ScoredId], b2: List[ScoredId]): List[ScoredId] =
    mergeSorted(b1, b2.sortWith(better))

  /** Merge two sorted-descending lists, truncated at k. */
  private def mergeSorted(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] = {
    val out = List.newBuilder[ScoredId]
    var (xs, ys, n) = (a, b, 0)
    while (n < k && (xs.nonEmpty || ys.nonEmpty)) {
      if (ys.isEmpty || (xs.nonEmpty && better(xs.head, ys.head))) {
        out += xs.head; xs = xs.tail
      } else {
        out += ys.head; ys = ys.tail
      }
      n += 1
    }
    out.result()
  }

  override def finish(r: List[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: Encoder[List[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}

object TopK {

  /** `df.groupBy(groupCols).agg(top-k of (scoreCol, idCol))`, exploded back
    * to one output row per kept candidate with a dense 1-based `rnk`.
    *
    * Output columns: groupCols ++ (idAlias, scoreAlias, "rnk").
    */
  def perGroup(
      df: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String],
      scoreCol: Column,
      idCol: Column,
      k: Int,
      idAlias: String = "neighbor_id",
      scoreAlias: String = "score"): org.apache.spark.sql.DataFrame = {
    val topk = udaf(new TopKAggregator(k))
    // NULL scores (ragged vectors, null elements) are dropped up front:
    // the aggregator's primitive Double input would NPE on them, and a
    // null-scored candidate can never belong to a top-k anyway.
    df.filter(scoreCol.isNotNull && idCol.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(topk(scoreCol, idCol).as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")).as(Seq("__pos", "__e")): _*)
      .select(
        groupCols.map(col) ++ Seq(
          col("__e.id").as(idAlias),
          col("__e.score").as(scoreAlias),
          (col("__pos") + 1).cast("int").as("rnk")): _*)
  }
}

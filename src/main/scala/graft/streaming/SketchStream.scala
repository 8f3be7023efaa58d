package graft.streaming

import graft.ext.Sketches
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming maintenance of a count-min frequency sketch — the "running
  * heavy-hitters over an unbounded stream" operation: every micro-batch
  * folds its rows into a persisted d×w counter table whose estimates are
  * always available without revisiting any history.
  *
  * State layout: one parquet dir per epoch holding that batch's SPARSE
  * (cell, count) frame ([[Sketches.countMinCells]]), overwritten whole on
  * replay — so a crashed epoch lands exactly-once, the same idempotence
  * rule as the CDC streaming target. Because count-min cells are
  * ADDITIVE and the hash family is fixed literal constants, summing the
  * per-epoch frames cell-wise reproduces the batch sketch over the total
  * stream bit-for-bit: streamed ≡ batch by construction, and the merge
  * is commutative, so epoch dirs can be compacted offline in any
  * grouping.
  *
  * Scale shape: per batch, the only data-sized work is the map-side-
  * combined cell aggregate (shuffle bounded by d×w occupied cells, never
  * key cardinality); each epoch dir is at most d×w rows; the read-side
  * merge aggregates #epochs × d×w sparse rows — independent of stream
  * volume, the whole point versus an exact per-key count whose state
  * grows with distinct keys.
  */
object SketchStream {

  /** Fold one micro-batch into the sketch dir (exactly-once per epoch:
    * whole-epoch-dir overwrite).
    */
  def applySketchBatch(
      batch: DataFrame,
      epoch: Long,
      sketchDir: String,
      keyStr: Column,
      d: Int,
      w: Int): Unit =
    Sketches.countMinCells(batch, keyStr, d, w)
      .write.mode("overwrite").parquet(s"$sketchDir/epoch=$epoch")

  /** The merged dense d×w table over every landed epoch (cell-wise sum —
    * the count-min merge). Driver-side array, same structurally-small
    * class as [[Sketches.countMinTable]]'s result.
    */
  def readTable(spark: SparkSession, sketchDir: String, d: Int, w: Int): Array[Long] = {
    val cells = spark.read
      .schema("__cell LONG, __n LONG")
      .option("recursiveFileLookup", "true")
      .parquet(sketchDir)
      .groupBy(col("__cell")).agg(sum(col("__n")).as("__n"))
      .collect()
    val arr = new Array[Long](d * w)
    cells.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Stream a source directory of parquet files through the sketch
    * maintainer.
    */
  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      sketchDir: String,
      checkpointDir: String,
      keyStr: Column,
      d: Int,
      w: Int,
      trigger: Option[Trigger] = None,
      maxFilesPerTrigger: Int = 100): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .queryName("graft-sketch")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger.getOrElse(Trigger.ProcessingTime("5 seconds")))
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        applySketchBatch(batch, epoch, sketchDir, keyStr, d, w)
      }
      .start()

  /** Drain all pending files once and stop (AvailableNow). */
  def drain(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      sketchDir: String,
      checkpointDir: String,
      keyStr: Column,
      d: Int,
      w: Int,
      maxFilesPerTrigger: Int = 100): Unit = {
    val q = start(spark, srcDir, schema, sketchDir, checkpointDir, keyStr, d, w,
      trigger = Some(Trigger.AvailableNow()),
      maxFilesPerTrigger = maxFilesPerTrigger)
    q.awaitTermination()
  }
}

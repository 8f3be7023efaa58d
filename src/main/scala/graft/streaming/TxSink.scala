package graft.streaming

import graft.sources.TxTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming sink into a [[TxTable]] — every micro-batch
  * becomes one ATOMIC table version stamped with its checkpoint epoch,
  * so a crash-replayed epoch finds its stamp and re-commits nothing
  * ([[TxTable.commitStreaming]]): exactly-once end to end, with readers
  * getting snapshot isolation and time travel ACROSS micro-batches for
  * free (version history = batch history). The epoch-dir convention
  * gives idempotence per directory; this gives one queryable, vacuumable
  * table.
  *
  * `statsColumns` flow through to the manifest, so manifest-level file
  * skipping ([[TxTable.readPruned]]) works on streamed tables too.
  */
object TxSink {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      tableDir: String,
      checkpointDir: String,
      mode: String = "append",
      statsColumns: Seq[String] = Nil,
      trigger: Option[Trigger] = None,
      maxFilesPerTrigger: Int = 100): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .queryName("graft-tx-sink")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger.getOrElse(Trigger.ProcessingTime("5 seconds")))
      .foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
          if (!batch.isEmpty) {
            TxTable.commitStreaming(batch, tableDir, epoch, mode, statsColumns)
            ()
          }
      }
      .start()

  /** Drain all pending files once and stop (AvailableNow). */
  def drain(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      tableDir: String,
      checkpointDir: String,
      mode: String = "append",
      statsColumns: Seq[String] = Nil,
      maxFilesPerTrigger: Int = 100): Unit = {
    val q = start(spark, srcDir, schema, tableDir, checkpointDir, mode,
      statsColumns, trigger = Some(Trigger.AvailableNow()),
      maxFilesPerTrigger = maxFilesPerTrigger)
    q.awaitTermination()
  }
}

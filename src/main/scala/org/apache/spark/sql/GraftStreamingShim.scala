package org.apache.spark.sql

/** Bridge for V1 streaming sources ([[org.apache.spark.sql.execution
  * .streaming.Source]]): `getBatch` must return a DataFrame whose
  * logical plan carries `isStreaming = true` (MicroBatchExecution
  * asserts it), and the only public-enough constructor for that flag —
  * `internalCreateDataFrame(rdd, schema, isStreaming)` — is
  * `private[sql]`. This one-method object lives in the `sql` package to
  * cross that boundary; it is the same seam Delta Lake's `DeltaSource`
  * uses for its change-data-feed stream. No Spark internals are
  * modified — the batch plan is simply re-rooted under a streaming
  * `LogicalRDD` leaf.
  */
object GraftStreamingShim {

  /** Re-root `df`'s (lazy) physical RDD as a streaming-flagged frame. */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val session = df.sparkSession.asInstanceOf[classic.SparkSession]
    val qe = df.asInstanceOf[classic.Dataset[Row]].queryExecution
    session.internalCreateDataFrame(qe.toRdd, df.schema, isStreaming = true)
  }
}

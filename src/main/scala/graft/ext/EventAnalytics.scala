package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table — windowed aggregation
  * and gap-based sessionization (the watermark/window surface of SURVEY
  * §2.9 T6, exercised as first-class operators).
  */
object EventAnalytics {

  /** Gap-based sessionization: within each user's timeline, a new session
    * starts when the gap to the previous event exceeds `maxGapMinutes`.
    * Adds `session_seq` (1-based per user).
    *
    * Scale shape: one window partitioned BY USER — parallelism is the
    * number of users, each task holds one user's events (bounded), never
    * a global sort. Ordering ties broken on `orderCol` so the session
    * numbering is deterministic.
    */
  def sessionize(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      orderCol: String,
      maxGapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(orderCol))
    val gapUs = maxGapMinutes * 60L * 1000000L
    val prevTs = lag(unix_micros(col(tsCol)), 1).over(w)
    events
      .withColumn("__new_session",
        when(prevTs.isNull || unix_micros(col(tsCol)) - prevTs > gapUs, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("__new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** Per-session statistics: event count, start (unix micros), duration
    * (micros), value sum. Exact-integer times keep the output
    * oracle-comparable.
    */
  def sessionStats(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      orderCol: String,
      valueCol: String,
      maxGapMinutes: Int = 30): DataFrame =
    sessionize(events, userCol, tsCol, orderCol, maxGapMinutes)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol)))).as("duration_us"),
        round(sum(col(valueCol)), 3).as("sum_value"))

  /** Streaming hourly counts with a watermark — the T6 surface: late rows
    * beyond `watermarkDelay` are dropped, state for closed windows is
    * evicted. Feed with `spark.readStream`; aggregate matches the batch
    * `window()` group-by exactly for in-order data.
    */
  def streamingHourlyCounts(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      watermarkDelay: String = "2 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), "1 hour").as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hour_start"), col(keyCol), col("n"))
}

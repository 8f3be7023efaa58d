package graft

import org.apache.spark.sql.functions._

/** All three physical encodings `Fixtures.events` must survive — the
  * driver has already regenerated the testdata with a new encoding once
  * (round 6→7: INT64 TIMESTAMP(NANOS) → INT64 MICROS NTZ), so every
  * branch gets a synthetic parquet here and must yield the SAME
  * wall-clock timestamps under the UTC session.
  */
class EventsEncodingSpec extends SparkSpecBase {

  private lazy val s = spark
  import s.implicits._

  // 2026-01-01T00:00:01Z and +1h, as epoch micros
  private val us = Seq(1767225601000000L, 1767229201000000L)

  private def expectMicros(dir: String): Unit = {
    val got = Fixtures.events(spark, dir)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
    assert(got.sameElements(us.sorted), s"got ${got.toSeq} want $us")
    assert(Fixtures.events(spark, dir).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("legacy raw int64-nanos encoding converts via div 1000") {
    val dir = java.nio.file.Files.createTempDirectory("ev_ns").toString
    us.map(u => (1L, u * 1000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    expectMicros(dir)
  }

  test("TIMESTAMP_NTZ (current testdata encoding) casts under the UTC session") {
    val dir = java.nio.file.Files.createTempDirectory("ev_ntz").toString
    us.map(u => (1L, java.time.LocalDateTime.ofEpochSecond(
        u / 1000000L, ((u % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    expectMicros(dir)
  }

  test("session-TZ TIMESTAMP passes through unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("ev_ts").toString
    us.map(u => (1L, new java.sql.Timestamp(u / 1000L)))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    expectMicros(dir)
  }

  test("an unsupported ts type fails fast naming the type") {
    val dir = java.nio.file.Files.createTempDirectory("ev_bad").toString
    Seq((1L, "not a timestamp")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Fixtures.events(spark, dir))
    assert(e.getMessage.contains("unsupported physical type"), e.getMessage)
  }
}

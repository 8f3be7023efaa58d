package graft

import graft.capture.ChangeCapture
import graft.model.CdcTableSpec
import org.apache.spark.sql.functions._

/** Proves the S4-S6 scale claim from SCALE.md: with both snapshots
  * BUCKETED on the PK (the layout a production deployment would use),
  * the snapshot-diff capture plans as a sort-merge join with ZERO
  * exchanges — the diff of two 100 TB snapshots shuffles nothing.
  */
class CaptureScaleSpec extends SparkSpecBase {

  private lazy val s = spark
  import s.implicits._

  test("captureChanges over bucketed snapshots plans without a shuffle") {
    val spec = CdcTableSpec("bt", Seq("id", "v"), "id")
    val before = s.range(0, 10000).select(col("id"), (col("id") % 7).as("v"))
    val after = s.range(5000, 15000).select(col("id"), (col("id") % 5).as("v"))
    s.sql("DROP TABLE IF EXISTS cap_before")
    s.sql("DROP TABLE IF EXISTS cap_after")
    before.write.bucketBy(8, "id").sortBy("id").saveAsTable("cap_before")
    after.write.bucketBy(8, "id").sortBy("id").saveAsTable("cap_after")
    try {
      val diff = ChangeCapture.captureChanges(
        s.table("cap_before"), s.table("cap_after"), spec)
      val counts = diff.groupBy("operation").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts("INSERT") === 5000)
      assert(counts("DELETE") === 5000)
      // ids 5000-9999 exist in both; v differs unless id%7 == id%5 (i.e. id%35 < 5)
      assert(counts("UPDATE") === 5000 - (5000 / 35 * 5 + 5))
      val plan = diff.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"bucketed capture must be shuffle-free:\n${plan.take(1200)}")
    } finally {
      s.sql("DROP TABLE IF EXISTS cap_before")
      s.sql("DROP TABLE IF EXISTS cap_after")
    }
  }

  test("scale-mode cdc_ids: unique inside the packing envelope, raise beyond it") {
    import graft.log.ChangeLog
    val inEnvelope = s.range(0, 4000).repartition(4)
      .select(col("id").as(ChangeLog.RecordId),
        lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).as(ChangeLog.ChangedAt))
    val ids = ChangeLog.assignCdcIds(inEnvelope).select(ChangeLog.CdcId)
    assert(ids.distinct().count() === 4000)

    // > 4096 rows in a single partition with one shared changed_at would
    // silently collide — the guard must raise instead.
    val hot = s.range(0, 5000).coalesce(1)
      .select(col("id").as(ChangeLog.RecordId),
        lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).as(ChangeLog.ChangedAt))
    val e = intercept[Exception] {
      // an aggregate that READS cdc_id — a bare count() would let the
      // optimizer prune the guarded projection away entirely
      ChangeLog.assignCdcIds(hot).agg(max(col(ChangeLog.CdcId))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("packing envelope")))
  }
}

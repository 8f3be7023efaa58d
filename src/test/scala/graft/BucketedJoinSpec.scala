package graft

import graft.ext.Layout
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Co-located bucketed join: two tables pre-bucketed on the join key must
  * join with ZERO Exchange in the physical plan (the scan's bucketed
  * HashPartitioning satisfies the join's distribution requirement), and
  * the result must equal the plain shuffled join.
  */
class BucketedJoinSpec extends SparkSpecBase {

  private lazy val s = spark
  import s.implicits._

  test("bucketed fact/dim join plans no shuffle and matches the plain join") {
    val tmp = Files.createTempDirectory("buck").toString
    val facts = (0L until 10000L).map(i => (i % 500, i, (i % 97).toDouble))
      .toDF("k", "seq", "v")
    val dims = (0L until 500L).map(i => (i, s"dim_$i")).toDF("k", "name")

    Layout.writeBucketedTable(facts, "buck_facts", "k", 8, s"$tmp/facts")
    Layout.writeBucketedTable(dims, "buck_dims", "k", 8, s"$tmp/dims")
    try {
      val joined = s.table("buck_facts").join(s.table("buck_dims"), "k")
        .groupBy(col("k"), col("name")).agg(sum(col("v")).as("sv"))
      // forbid broadcast so the co-location (not broadcast) removes shuffles
      val plan = s.sessionState.conf
      val prev = plan.getConfString("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        joined.collect() // materialize so AQE finalizes the plan
        val finalPlan = joined.queryExecution.executedPlan.toString()
        assert(!finalPlan.contains("Exchange"),
          s"bucketed join should plan zero shuffles:\n$finalPlan")
        // the same join over the raw frames must agree
        val expected = facts.join(dims, "k")
          .groupBy(col("k"), col("name")).agg(sum(col("v")).as("sv"))
        assertSameRows(joined, expected, "bucketed vs plain join")
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      s.sql("DROP TABLE IF EXISTS buck_facts")
      s.sql("DROP TABLE IF EXISTS buck_dims")
    }
  }
}

package graft

import graft.sources.{CdcSource, JdbcSink, JdbcSource}
import org.apache.spark.sql.functions._

/** End-to-end exercise of the JDBC adapters against a REAL database —
  * in-process Derby (`jdbc:derby:memory:`), which ships in Spark's jar
  * dir, so the test needs no egress and no external server. The
  * reference declares postgresql/mysql support without implementing it
  * (reference: config.py:14-16); these adapters are wired to Spark's
  * production JDBC source, and this spec makes that claim concrete:
  * write via [[JdbcSink]], read back via [[JdbcSource]] and the
  * config-driven [[CdcSource.forConfig]] door, values and schema intact.
  */
class JdbcRoundtripSpec extends SparkSpecBase {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val driverOpt = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  test("JdbcSink writes and JdbcSource reads back a table through a real JDBC database") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "alpha", 10.5),
      (2L, "beta", -3.25),
      (3L, null.asInstanceOf[String], 0.0)
    ).toDF("id", "name", "score")

    JdbcSink(url, "roundtrip", mode = "overwrite", options = driverOpt).save(rows)
    val back = JdbcSource(url, "roundtrip", options = driverOpt).load(spark)

    assert(back.columns.map(_.toLowerCase).sorted.sameElements(Array("id", "name", "score")))
    assertSameRows(
      back.select(col("ID").as("id"), col("NAME").as("name"), col("SCORE").as("score")),
      rows, "jdbc roundtrip")
  }

  test("forConfig('jdbc') resolves to a working JdbcSource; pushed filter returns the right subset") {
    val s = spark
    import s.implicits._
    val rows = (1L to 100L).map(i => (i, i * 2.0)).toDF("k", "v")
    JdbcSink(url, "pushdown", mode = "overwrite", options = driverOpt).save(rows)

    val src = CdcSource.forConfig("jdbc", url, table = "pushdown")
    // Derby autoloads in-JVM, so the config door needs no driver option.
    val filtered = src.load(spark).filter(col("K") > 90)
    // The filter is pushed into the JDBC scan (PushedFilters), not
    // applied post-read — at warehouse scale that is the difference
    // between shipping 10 rows and shipping the table.
    val scanText = filtered.queryExecution.executedPlan.toString
    assert(scanText.contains("PushedFilters") &&
        scanText.toLowerCase.contains("greaterthan(k,90)"),
      s"expected pushed JDBC filter in plan:\n$scanText")
    assert(filtered.count() == 10)
    assert(filtered.agg(sum(col("V"))).as[Double].head() == (91 to 100).map(_ * 2.0).sum)
  }
}

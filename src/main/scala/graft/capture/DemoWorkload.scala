package graft.capture

import graft.model.CdcTableSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Demo fixture generator + replay — parity with the reference's demo
  * workload (reference: example_usage.py:19-27 `users` schema;
  * :49-69 random user generator; :141-143 10 inserts, 5 updates,
  * 2 deletes). Deterministic: all randomness is seeded `rand()`/mod
  * arithmetic so every run (and every cluster size) produces the same
  * rows — a requirement for golden tests the reference's
  * `random.randint` workload doesn't meet.
  */
object DemoWorkload {

  val UsersSpec: CdcTableSpec =
    CdcTableSpec("users", Seq("id", "username", "email", "status", "created_at"), "id")

  private val Statuses = Seq("active", "inactive", "pending")

  /** `n` users shaped like the reference demo's
    * (reference: example_usage.py:49-56): user_<rand4>, derived email,
    * random status. Ids are `startId until startId+n`.
    */
  def users(spark: SparkSession, n: Int, startId: Long = 1L): DataFrame = {
    import spark.implicits._
    val statusArr = array(Statuses.map(lit): _*)
    spark.range(startId, startId + n).toDF("id")
      .withColumn("suffix", (pmod(col("id") * 2654435761L, lit(9000)) + 1000).cast("int"))
      .withColumn("username", concat(lit("user_"), col("suffix")))
      .withColumn("email", concat(lit("user_"), col("suffix"), lit("@example.com")))
      .withColumn("status", element_at(statusArr, (pmod(col("id"), lit(3)) + 1).cast("int")))
      .withColumn("created_at", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .drop("suffix")
      .select(UsersSpec.columns.map(col): _*)
  }

  /** Replay the reference demo against a write-through captured table:
    * `inserts` new users, `updates` status flips on the lowest ids,
    * `deletes` of the highest ids (reference: example_usage.py:141-143
    * with its random victim choice made deterministic). Returns the table
    * for chaining.
    */
  def replay(
      table: CdcTable,
      spark: SparkSession,
      inserts: Int = 10,
      updates: Int = 5,
      deletes: Int = 2,
      startId: Long = 1L): CdcTable = {
    table.insert(users(spark, inserts, startId))
    val updateIds = (startId until startId + updates).toSeq
    table.update(col("id").isin(updateIds: _*), Map("status" -> lit("updated")))
    val deleteIds = ((startId + inserts - deletes) until (startId + inserts)).toSeq
    table.delete(col("id").isin(deleteIds: _*))
    table
  }
}

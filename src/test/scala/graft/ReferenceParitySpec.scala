package graft

import graft.apply.ChangeApplier
import graft.model.CdcTableSpec
import graft.verify.ReplicationVerifier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden parity against the reference's SHIPPED run artifacts: the
  * reference repo commits `source.db` / `target.db` from a real demo run
  * (17 change rows: 10 INSERT, 5 UPDATE, 2 DELETE; 8 final rows). Those
  * tables are extracted verbatim into jsonl files under
  * `src/test/resources/`.
  *
  * The decisive check: replaying the REFERENCE'S OWN captured change log
  * through OUR set-oriented applier reproduces the REFERENCE'S final
  * replica exactly — cross-system correctness on real artifacts, not
  * synthetic fixtures (reference: committed source.db::users_cdc and
  * target.db::users_replica).
  */
class ReferenceParitySpec extends SparkSpecBase {

  private lazy val s = spark

  private val userSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("username", StringType),
    StructField("email", StringType),
    StructField("status", StringType),
    StructField("created_at", StringType)))

  private val cdcSchema = StructType(Seq(
    StructField("cdc_id", LongType),
    StructField("operation", StringType),
    StructField("record_id", LongType),
    StructField("old_data", StringType),
    StructField("new_data", StringType),
    StructField("changed_at", StringType),
    StructField("synced", LongType),
    StructField("sync_timestamp", StringType)))

  private def resource(name: String): String =
    getClass.getClassLoader.getResource(name).getPath

  private def refLog: DataFrame =
    s.read.schema(cdcSchema).json(resource("reference_users_cdc.jsonl"))
      .withColumn("old_data", from_json(col("old_data"), userSchema))
      .withColumn("new_data", from_json(col("new_data"), userSchema))

  private def refUsers(name: String): DataFrame =
    s.read.schema(userSchema).json(resource(name))

  private val spec = CdcTableSpec("users",
    Seq("id", "username", "email", "status", "created_at"), "id")

  test("reference artifact shape: 17 changes = 10 INSERT + 5 UPDATE + 2 DELETE") {
    val ops = refLog.groupBy("operation").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops === Map("INSERT" -> 10L, "UPDATE" -> 5L, "DELETE" -> 2L))
  }

  test("the reference's log satisfies our null-image contract (zero quarantined)") {
    val (valid, quarantined) = ChangeApplier.partitionValid(refLog)
    assert(valid.count() === 17)
    assert(quarantined.count() === 0)
  }

  test("replaying the reference's captured log reproduces its shipped replica") {
    val empty = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], userSchema)
    val applied = ChangeApplier.applyChanges(empty, refLog, spec)
    val replica = refUsers("reference_users_replica.jsonl")
    assert(ReplicationVerifier.fullyReplicated(applied, replica),
      "our apply over the reference's log must equal the reference's replica")
    // and the reference's own invariant held: source ≡ replica
    assert(ReplicationVerifier.fullyReplicated(
      refUsers("reference_users.jsonl"), replica))
  }

  test("re-applying the reference's already-applied log is a no-op (idempotence)") {
    val replica = refUsers("reference_users_replica.jsonl")
    val again = ChangeApplier.applyChanges(replica, refLog, spec)
    assert(ReplicationVerifier.fullyReplicated(again, replica))
  }

  test("our JSON image codec round-trips the reference's wire format") {
    val rt = graft.capture.ChangeCapture.withJsonImages(refLog)
    val back = graft.capture.ChangeCapture.parseJsonImages(rt, userSchema)
    // parsed structs equal the original parse of the reference's strings
    val a = refLog.select(col("cdc_id"), col("old_data"), col("new_data"))
    val b = back.select(col("cdc_id"), col("old_data"), col("new_data"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}

package graft

import graft.apply.IncrementalJoin
import graft.capture.ChangeCapture
import graft.log.ChangeLog
import org.apache.spark.sql.functions._

/** [[graft.apply.IncrementalJoin]] — join-view maintenance from the change
  * log alone must equal a recompute of the view over the post-change
  * snapshot, in every op mix (insert/update/delete, fk retarget, dangling
  * fk), and re-applying a batch must be a no-op (idempotence).
  */
class IncrementalJoinSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"
  private val dimCols = Seq("c_name", "c_nationkey")

  private def view(fact: org.apache.spark.sql.DataFrame) =
    IncrementalJoin.snapshotView(
      fact, Fixtures.customer(spark, dir), Fixtures.OrdersSpec,
      "o_custkey", "c_custkey", dimCols)

  test("maintained join view equals full recompute on the fixture log") {
    val base = Fixtures.orders(spark, dir)
    val maintained = IncrementalJoin.maintain(
      view(base), Fixtures.changeLog(spark, dir), Fixtures.customer(spark, dir),
      Fixtures.OrdersSpec, "o_custkey", "c_custkey", dimCols)
    val recomputed = view(Fixtures.after(base.select(Fixtures.OrdersSpec.columns.map(col): _*)))
    assertSameRows(maintained, recomputed, "incremental join vs recompute")
  }

  test("maintenance is idempotent: re-applying the batch changes nothing") {
    val base = Fixtures.orders(spark, dir)
    val log = Fixtures.changeLog(spark, dir)
    val cust = Fixtures.customer(spark, dir)
    val once = IncrementalJoin.maintain(view(base), log, cust,
      Fixtures.OrdersSpec, "o_custkey", "c_custkey", dimCols)
    val twice = IncrementalJoin.maintain(once, log, cust,
      Fixtures.OrdersSpec, "o_custkey", "c_custkey", dimCols)
    assertSameRows(once, twice, "re-apply")
  }

  test("fk retarget moves the row's dim columns; dangling fk drops it; delete removes it") {
    import spark.implicits._
    val before = Seq(
      (1L, 10L, "A"), (2L, 20L, "B"), (3L, 10L, "C"), (4L, 20L, "D")
    ).toDF("id", "fk", "payload")
    // 1: fk retargeted 10->20; 2: fk now dangling (99 has no dim row);
    // 3: deleted; 4: untouched; 5: inserted
    val after = Seq(
      (1L, 20L, "A"), (2L, 99L, "B"), (4L, 20L, "D"), (5L, 10L, "E")
    ).toDF("id", "fk", "payload")
    val dim = Seq((10L, "ten"), (20L, "twenty")).toDF("dk", "dname")
    val spec = graft.model.CdcTableSpec("t", Seq("id", "fk", "payload"), "id")
    val log = ChangeLog.assignCdcIds(
      ChangeCapture.finishLogSchema(
        ChangeCapture.captureChanges(before, after, spec)), global = true)

    val stored = IncrementalJoin.snapshotView(before, dim, spec, "fk", "dk", Seq("dname"))
    val maintained = IncrementalJoin.maintain(stored, log, dim, spec, "fk", "dk", Seq("dname"))
    val recomputed = IncrementalJoin.snapshotView(after, dim, spec, "fk", "dk", Seq("dname"))
    assertSameRows(maintained, recomputed, "synthetic op-mix")

    val rows = maintained.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 4L, 5L), "surviving view keys")
    assert(rows.head.getString(3) == "twenty", "retargeted fk must re-enrich")
    assert(maintained.filter(col("id") === 2L).count() == 0, "dangling fk leaves the view")
  }

  test("plan: stored view never joins the dimension — only the batch does") {
    // the stored-view side participates ONLY in the key anti-join; the
    // dim join must sit under the union on the (small) upsert branch.
    val base = Fixtures.orders(spark, dir)
    val maintained = IncrementalJoin.maintain(
      view(base).localCheckpoint(true), Fixtures.changeLog(spark, dir),
      Fixtures.customer(spark, dir), Fixtures.OrdersSpec,
      "o_custkey", "c_custkey", dimCols)
    val plan = maintained.queryExecution.optimizedPlan.toString
    // exactly one equi-join against c_custkey (the delta enrich), not two
    val dimJoins =
      "o_custkey#\\d+L? = c_custkey#\\d+L?|c_custkey#\\d+L? = o_custkey#\\d+L?".r
        .findAllIn(plan).length
    assert(dimJoins == 1, s"expected 1 dim join, got $dimJoins in:\n$plan")
  }
}

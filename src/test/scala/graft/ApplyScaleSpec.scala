package graft

import graft.apply.ChangeApplier
import graft.model.CdcTableSpec
import org.apache.spark.sql.functions._

/** Large-batch robustness: a backlog replay-sized change batch (1M
  * pending changes) must apply without a forced-broadcast OOM path —
  * the join strategy is AQE's choice, not a `broadcast()` hint
  * (see ChangeApplier scale notes).
  */
class ApplyScaleSpec extends SparkSpecBase {

  private lazy val s = spark

  test("1M-change batch applies; join strategy left to AQE") {
    val spec = CdcTableSpec("big", Seq("id", "value"), "id")
    val n = 1000000L
    val changes = s.range(n).select(
      col("id").as("record_id"),
      lit("INSERT").as("operation"),
      (col("id") + 1).as("cdc_id"),
      struct(col("id").as("id"), (col("id") % 97).as("value")).as("new_data"))
    // target shares 500k keys with the batch (they get replaced) and has
    // 100k keys above the batch range (untouched)
    val target = s.range(500000).union(s.range(n, n + 100000))
      .select(col("id"), lit(-1L).as("value"))

    val applied = ChangeApplier.applyChanges(target, changes, spec)
    assert(applied.count() === n + 100000)
    // replaced keys carry the batch image, untouched keys the old one
    assert(applied.filter(col("id") < 500000 && col("value") === -1L).count() === 0)
    assert(applied.filter(col("id") >= n).filter(col("value") =!= -1L).count() === 0)
    // the plan must not hard-code a broadcast hint
    val logical = applied.queryExecution.logical.toString()
    assert(!logical.contains("UnresolvedHint"), logical.take(500))
  }

  test("sql function surface is registered via GraftExtensions") {
    val r = s.sql(
      """SELECT graft_fingerprint('a  b') AS fp,
        |       graft_token_count('  x y  ') AS tc,
        |       graft_lang_id('the of and to is') AS lang,
        |       graft_jaccard(array('a','b'), array('b','c')) AS jac,
        |       graft_rolling_hash('a b') <> graft_rolling_hash('b a') AS ordered
        |""".stripMargin).head()
    assert(r.getString(0).length === 32)
    assert(r.getInt(1) === 2)
    assert(r.getString(2) === "en")
    assert(math.abs(r.getDouble(3) - 1.0 / 3.0) < 1e-9)
    assert(r.getBoolean(4))
    // duplicate elements: SQL surface uses the general (distinct-ifying)
    // form — {'a','a'} vs {'a'} is identical as a set
    val dup = s.sql("SELECT graft_jaccard(array('a','a'), array('a')) AS j").head()
    assert(dup.getDouble(0) === 1.0)
  }
}

package graft

import graft.apply.ChangeApplier
import graft.capture.CdcTable
import graft.model.CdcTableSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** The two fundamental CDC invariants as properties (SURVEY §5):
  *
  *  1. apply(changeLog) over the initial snapshot ≡ the final snapshot,
  *     for ANY sequence of insert/update/delete operations;
  *  2. applying the same batch twice ≡ applying it once (idempotence —
  *     the reference's `INSERT OR REPLACE` semantics, cdc_system.py:327).
  *
  * Spark actions are expensive, so the search space is kept small
  * (sequences of ≤ 10 ops over ≤ 6 keys, few cases) — the point is the
  * invariant, not volume.
  */
class CdcPropertiesSpec extends SparkSpecBase {

  /** Run a ScalaCheck property inline (scalatest-scalacheck bridge is not
    * on the offline resolver; raw ScalaCheck is).
    */
  private def checkProp(prop: Prop, minSuccessful: Int): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private lazy val s = spark
  import s.implicits._

  private val spec = CdcTableSpec("prop_table", Seq("id", "name", "value"), "id")

  sealed private trait Op
  private case class Ins(id: Long, v: Long) extends Op
  private case class Upd(id: Long, v: Long) extends Op
  private case class Del(id: Long) extends Op

  private val genOp: Gen[Op] = for {
    id <- Gen.choose(1L, 6L)
    v <- Gen.choose(0L, 99L)
    op <- Gen.oneOf[Op](Ins(id, v), Upd(id, v), Del(id))
  } yield op

  private val genOps: Gen[List[Op]] = Gen.listOfN(8, genOp)

  /** Replay ops through the write-through table; returns it. Inserts of an
    * existing key and updates/deletes of a missing key are no-ops at the
    * snapshot level (insert-existing would violate PK uniqueness), so we
    * guard them like an application would.
    */
  private def replay(ops: List[Op]): CdcTable = {
    val t = CdcTable(Seq.empty[(Long, String, Long)].toDF("id", "name", "value"), spec)
    var present = Set.empty[Long]
    ops.foreach {
      case Ins(id, v) if !present(id) =>
        t.insert(Seq((id, s"n$id", v)).toDF("id", "name", "value"))
        present += id
      case Upd(id, v) if present(id) =>
        t.update(col("id") === id, Map("value" -> lit(v)))
      case Del(id) if present(id) =>
        t.delete(col("id") === id)
        present -= id
      case _ => ()
    }
    t
  }

  private def sameRows(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("property: applying the change log to the initial snapshot yields the final snapshot") {
    checkProp(Prop.forAll(genOps) { ops =>
      val t = replay(ops)
      val initial = Seq.empty[(Long, String, Long)].toDF("id", "name", "value")
      val applied = ChangeApplier.applyChanges(initial, t.changeLog, spec)
      sameRows(applied, t.snapshot)
    }, minSuccessful = 6)
  }

  test("property: re-applying the same batch is idempotent") {
    checkProp(Prop.forAll(genOps) { ops =>
      val t = replay(ops)
      val initial = Seq.empty[(Long, String, Long)].toDF("id", "name", "value")
      val once = ChangeApplier.applyChanges(initial, t.changeLog, spec)
      val twice = ChangeApplier.applyChanges(once, t.changeLog, spec)
      sameRows(once, twice)
    }, minSuccessful = 4)
  }

  test("property: grid-quantile bucket always contains the exact order statistic") {
    val genData = for {
      n <- Gen.choose(1, 60)
      ticks <- Gen.listOfN(n, Gen.choose(-5000L, 5000L))
      width <- Gen.choose(1L, 700L)
      pct <- Gen.choose(1, 100)
    } yield (ticks, width, pct)
    checkProp(Prop.forAll(genData) { case (ticks, width, pct) =>
      val df = ticks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val res = graft.ext.Sketches.gridQuantiles(
          df, Seq.empty, col("t"), width, Seq(pct))
        .collect()
      val sorted = ticks.sorted
      val target = (pct.toLong * ticks.length + 99) / 100
      val exact = sorted((target - 1).toInt)
      res.length == 1 && {
        val r = res(0)
        val bucket = r.getAs[Long]("bucket")
        val upper = r.getAs[Long]("upper_tick")
        r.getAs[Long]("target_rank") == target &&
          exact >= bucket * width && exact < upper
      }
    }, minSuccessful = 8)
  }

  test("property: bloom and count-min kernels match their columnar twins on random strings") {
    val genKeys: Gen[List[String]] = Gen.listOfN(24,
      Gen.oneOf(
        Gen.alphaNumStr.map(_.take(12)),
        Gen.listOfN(6, Gen.choose(32.toChar, 0x2FF.toChar)).map(_.mkString),
        Gen.const(""), Gen.const(" "), Gen.const("héllo wörld é")))
    checkProp(Prop.forAll(genKeys) { keys =>
      val df = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
      val words = graft.ext.BloomFilter.build(
        df.filter(col("id") % 2 === 0), col("k"), 1 << 10, 4)
      val bloomAgree = df.filter(
        !(graft.ext.BloomFilter.mightContain(words.toSeq, col("k"), 1 << 10, 4) <=>
          graft.ext.BloomFilter.mightContainColumnar(words.toSeq, col("k"), 1 << 10, 4)))
        .count() == 0
      // CMS cells kernel vs columnar cell arithmetic
      val ab = graft.ext.PortableHash.minhashAB(3)
      val P = graft.ext.PortableHash.P
      val x = pmod(graft.ext.PortableHash.hash32(col("k")), lit(P))
      val columnarCells = array(ab.zipWithIndex.map { case ((a, b), i) =>
        lit(i.toLong) * 64 + pmod(x * a + b, lit(P)) % 64
      }: _*)
      val kernelCells = org.apache.spark.sql.GraftSqlBridge.column(
        graft.expr.CmsCells(
          org.apache.spark.sql.GraftSqlBridge.expression(col("k")), ab, 64))
      val cmsAgree = df.filter(!(kernelCells <=> columnarCells)).count() == 0
      bloomAgree && cmsAgree
    }, minSuccessful = 6)
  }

  test("dedupToLatest collapses DELETE→INSERT on one key to the final state") {
    val t = CdcTable(Seq((1L, "a", 1L)).toDF("id", "name", "value"), spec)
    t.delete(col("id") === 1)
    t.insert(Seq((1L, "reborn", 2L)).toDF("id", "name", "value"))
    val applied = ChangeApplier.applyChanges(
      Seq((1L, "a", 1L)).toDF("id", "name", "value"), t.changeLog, spec)
    val r = applied.collect()
    assert(r.length === 1)
    assert(r.head.getString(1) === "reborn")
  }
}

package graft

import graft.apply.{IncrementalAgg, IncrementalJoin}
import graft.log.{ChangeLog, History}
import graft.capture.ChangeCapture
import graft.model.CdcTableSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** The round-6 view/temporal invariants as properties:
  *
  *  1. incremental JOIN-view maintenance ≡ recompute over the
  *     post-change snapshot, for ANY op sequence — including fk
  *     retargets and fks dangling out of the dimension;
  *  2. the temporal-align law: aligning the per-attribute coalesced
  *     timelines equals coalescing the combined history on both
  *     attributes — even when versions are opened by the churn of an
  *     UNTRACKED column (the case the fixture query cannot reach,
  *     because every fixture change touches a tracked attribute).
  *
  * Small search spaces (Spark actions are expensive); forAllNoShrink
  * because shrinking breaks the generators' sequencing invariants.
  */
class ViewMaintenancePropertiesSpec extends SparkSpecBase {

  private def checkProp(prop: Prop, minSuccessful: Int): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private lazy val s = spark
  import s.implicits._

  // --------------------------------------------- incremental join view

  private val jSpec = CdcTableSpec("jt", Seq("id", "fk", "payload"), "id")

  sealed private trait Op
  private case class Ins(id: Long, fk: Long) extends Op
  private case class Upd(id: Long, fk: Long) extends Op
  private case class Del(id: Long) extends Op

  private val genOp: Gen[Op] = for {
    id <- Gen.choose(1L, 5L)
    fk <- Gen.choose(1L, 6L) // dim holds only 1,2,3 -> 4..6 dangle
    op <- Gen.oneOf[Op](Ins(id, fk), Upd(id, fk), Del(id))
  } yield op

  /** Apply ops sequentially to an in-memory snapshot (guarding illegal
    * ones), return (before, after) snapshots as rows.
    */
  private def play(ops: List[Op]): (Seq[(Long, Long, String)], Seq[(Long, Long, String)]) = {
    // start with keys 1,2 present (fk 1 and 4: one joined, one dangling)
    val init = Map(1L -> (1L, "p1"), 2L -> (4L, "p2"))
    var st = init
    ops.foreach {
      case Ins(id, fk) if !st.contains(id) => st += id -> (fk, s"p$id")
      case Upd(id, fk) if st.contains(id)  => st += id -> (fk, st(id)._2)
      case Del(id) if st.contains(id)      => st -= id
      case _                               => ()
    }
    (init.toSeq.map { case (id, (fk, p)) => (id, fk, p) },
      st.toSeq.map { case (id, (fk, p)) => (id, fk, p) })
  }

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("property: incremental join view equals recompute for any op sequence") {
    val dim = Seq((1L, "d1"), (2L, "d2"), (3L, "d3")).toDF("dk", "dname")
      .localCheckpoint(true)
    checkProp(Prop.forAllNoShrink(Gen.listOfN(7, genOp)) { ops =>
      val (beforeRows, afterRows) = play(ops)
      val before = beforeRows.toDF("id", "fk", "payload")
      val after = afterRows.toDF("id", "fk", "payload")
      val log = ChangeLog.assignCdcIds(
        ChangeCapture.finishLogSchema(
          ChangeCapture.captureChanges(before, after, jSpec)), global = true)
      val stored = IncrementalJoin.snapshotView(before, dim, jSpec, "fk", "dk", Seq("dname"))
      val maintained = IncrementalJoin.maintain(stored, log, dim, jSpec, "fk", "dk", Seq("dname"))
      val recomputed = IncrementalJoin.snapshotView(after, dim, jSpec, "fk", "dk", Seq("dname"))
      sameRows(maintained, recomputed)
    }, minSuccessful = 6)
  }

  // ------------------------------------- incremental COUNT(DISTINCT) view

  private val dSpec = CdcTableSpec("dt", Seq("id", "g", "v"), "id")

  sealed private trait DOp
  private case class DIns(id: Long, g: Long, v: Long) extends DOp
  private case class DUpd(id: Long, g: Long, v: Long) extends DOp
  private case class DDel(id: Long) extends DOp

  private val genDOp: Gen[DOp] = for {
    id <- Gen.choose(1L, 6L)
    g <- Gen.choose(1L, 3L) // few groups → group-moving updates frequent
    v <- Gen.choose(1L, 4L) // few values → last-copy deletes frequent
    op <- Gen.oneOf[DOp](DIns(id, g, v), DUpd(id, g, v), DDel(id))
  } yield op

  private def playD(ops: List[DOp]): (Seq[(Long, Long, Long)], Seq[(Long, Long, Long)]) = {
    val init = Map(1L -> (1L, 1L), 2L -> (1L, 2L), 3L -> (2L, 2L))
    var st = init
    ops.foreach {
      case DIns(id, g, v) if !st.contains(id) => st += id -> (g, v)
      case DUpd(id, g, v) if st.contains(id) && st(id) != ((g, v)) =>
        st += id -> (g, v)
      case DDel(id) if st.contains(id) => st -= id
      case _                           => ()
    }
    (init.toSeq.map { case (id, (g, v)) => (id, g, v) },
      st.toSeq.map { case (id, (g, v)) => (id, g, v) })
  }

  test("property: maintained COUNT(DISTINCT) support table equals recompute for any op sequence") {
    checkProp(Prop.forAllNoShrink(Gen.listOfN(8, genDOp)) { ops =>
      val (beforeRows, afterRows) = playD(ops)
      val before = beforeRows.toDF("id", "g", "v")
      val after = afterRows.toDF("id", "g", "v")
      val log = ChangeLog.assignCdcIds(
        ChangeCapture.finishLogSchema(
          ChangeCapture.captureChanges(before, after, dSpec)), global = true)
      val stored = IncrementalAgg.snapshotDistinct(before, "g", "v")
      val maintained = IncrementalAgg.maintainDistinct(stored, log, "g", "v")
      val recomputed = IncrementalAgg.snapshotDistinct(after, "g", "v")
      // support tables equal cell-for-cell AND the derived views agree
      sameRows(maintained, recomputed) &&
        sameRows(IncrementalAgg.distinctView(maintained),
          IncrementalAgg.distinctView(recomputed))
    }, minSuccessful = 6)
  }

  // ------------------------------------------------- temporal align law

  private val hSpec = CdcTableSpec("ht", Seq("id", "x", "y", "z"), "id")

  sealed private trait HOp
  private case class HIns(id: Long, x: Long, y: Long, z: Long) extends HOp
  private case class HUpd(id: Long, which: Int, v: Long) extends HOp // 0=x 1=y 2=z
  private case class HDel(id: Long) extends HOp

  private val genHOp: Gen[HOp] = for {
    id <- Gen.choose(1L, 3L)
    v <- Gen.choose(0L, 4L)
    which <- Gen.choose(0, 2)
    op <- Gen.frequency[HOp](
      (2, HIns(id, v, v + 1, v + 2)),
      (5, HUpd(id, which, v)),
      (1, HDel(id)))
  } yield op

  /** Build a canonical log from the op sequence (cdc_id = position+1). */
  private def mkHistory(ops: List[HOp]): DataFrame = {
    var st = Map.empty[Long, (Long, Long, Long)]
    val rows = scala.collection.mutable.Buffer[(Long, Long, String, Option[(Long, Long, Long)])]()
    var id = 0L
    ops.foreach { op =>
      id += 1
      op match {
        case HIns(k, x, y, z) if !st.contains(k) =>
          st += k -> (x, y, z); rows += ((id, k, "INSERT", Some((x, y, z))))
        case HUpd(k, w, v) if st.contains(k) =>
          val (x, y, z) = st(k)
          val nv = w match {
            case 0 => (v, y, z); case 1 => (x, v, z); case _ => (x, y, v)
          }
          // an update that changes nothing would not be captured; skip it
          if (nv != ((x, y, z))) {
            st += k -> nv; rows += ((id, k, "UPDATE", Some(nv)))
          }
        case HDel(k) if st.contains(k) =>
          st -= k; rows += ((id, k, "DELETE", None))
        case _ => ()
      }
    }
    val df = rows.toSeq
      .map { case (c, r, o, img) =>
        (c, r, o, img.map(_._1), img.map(_._2), img.map(_._3))
      }.toDF("cdc_id", "record_id", "operation", "nx", "ny", "nz")
    val log = df.select(
      col("cdc_id"), col("operation"), col("record_id"),
      lit(null).cast("struct<id:bigint,x:bigint,y:bigint,z:bigint>").as("old_data"),
      when(col("operation") === "DELETE", lit(null))
        .otherwise(struct(col("record_id").as("id"), col("nx").as("x"),
          col("ny").as("y"), col("nz").as("z"))).as("new_data"),
      lit(Fixtures.T0).as("changed_at"), lit(0).as("synced"),
      lit(null).cast("timestamp").as("sync_timestamp"))
    val base = Seq.empty[(Long, Long, Long, Long)].toDF("id", "x", "y", "z")
    History.scd2(base, log, hSpec)
  }

  test("property: align(x-track, y-track) == coalesce(history, {x,y}) under z churn") {
    checkProp(Prop.forAllNoShrink(Gen.listOfN(10, genHOp)) { ops =>
      val h = mkHistory(ops).localCheckpoint(true)
      val xt = History.coalesceVersions(h, Seq("x"))
      val yt = History.coalesceVersions(h, Seq("y"))
      val aligned = History.alignHistories(xt, yt, Seq("x"), Seq("y"))
        .select("record_id", "x", "y", "valid_from", "valid_to", "is_current")
      val rhs = History.coalesceVersions(h, Seq("x", "y"))
        .select("record_id", "x", "y", "valid_from", "valid_to", "is_current")
      sameRows(aligned, rhs)
    }, minSuccessful = 6)
  }

  // --------------------------------------------- min/max view maintenance

  private val mmSpec = CdcTableSpec("mm", Seq("id", "g", "v"), "id")

  sealed private trait MOp
  private case class MIns(id: Long, g: Option[String], v: Long) extends MOp
  private case class MUpd(id: Long, g: Option[String], v: Long) extends MOp
  private case class MDel(id: Long) extends MOp

  private val genMOp: Gen[MOp] = for {
    id <- Gen.choose(1L, 5L)
    g <- Gen.oneOf(Some("a"), Some("b"), None) // NULL group key in play
    v <- Gen.choose(0L, 9L)
    op <- Gen.oneOf[MOp](MIns(id, g, v), MUpd(id, g, v), MDel(id))
  } yield op

  test("property: min/max view equals recompute for any op sequence incl null keys") {
    checkProp(Prop.forAllNoShrink(Gen.listOfN(7, genMOp)) { ops =>
      // start with a max that can be deleted and a NULL-keyed group
      val init = Map(1L -> (Option("a"), 9L), 2L -> (Option.empty[String], 3L))
      var st = init
      ops.foreach {
        case MIns(id, g, v) if !st.contains(id) => st += id -> (g, v)
        case MUpd(id, g, v) if st.contains(id)  => st += id -> (g, v)
        case MDel(id) if st.contains(id)        => st -= id
        case _                                  => ()
      }
      val before = init.toSeq.map { case (id, (g, v)) => (id, g, v) }
        .toDF("id", "g", "v")
      val after = st.toSeq.map { case (id, (g, v)) => (id, g, v) }
        .toDF("id", "g", "v")
      val log = ChangeLog.assignCdcIds(
        ChangeCapture.finishLogSchema(
          ChangeCapture.captureChanges(before, after, mmSpec)), global = true)
      val stored = IncrementalAgg.snapshotMinMax(before, "g", "v")
      val maintained = IncrementalAgg.maintainMinMax(stored, log, after, "g", "v")
      sameRows(maintained, IncrementalAgg.snapshotMinMax(after, "g", "v"))
    }, minSuccessful = 6)
  }

  test("property: second-moment view equals recompute for any op sequence incl null keys and group moves") {
    checkProp(Prop.forAllNoShrink(Gen.listOfN(7, genMOp)) { ops =>
      // same op alphabet as the min/max property: NULL group keys in
      // play, updates that move rows between groups, deletes that can
      // empty a group entirely — the cases where a sign error in the
      // retraction/assertion deltas would survive a happy-path test
      val init = Map(1L -> (Option("a"), 9L), 2L -> (Option.empty[String], 3L))
      var st = init
      ops.foreach {
        case MIns(id, g, v) if !st.contains(id) => st += id -> (g, v)
        case MUpd(id, g, v) if st.contains(id)  => st += id -> (g, v)
        case MDel(id) if st.contains(id)        => st -= id
        case _                                  => ()
      }
      val before = init.toSeq.map { case (id, (g, v)) => (id, g, v) }
        .toDF("id", "g", "v")
      val after = st.toSeq.map { case (id, (g, v)) => (id, g, v) }
        .toDF("id", "g", "v")
      val log = ChangeLog.assignCdcIds(
        ChangeCapture.finishLogSchema(
          ChangeCapture.captureChanges(before, after, mmSpec)), global = true)
      val stored = IncrementalAgg.snapshotMoments(before, "g", "v")
      val maintained = IncrementalAgg.maintainMoments(stored, log, "g", "v")
      sameRows(maintained, IncrementalAgg.snapshotMoments(after, "g", "v"))
    }, minSuccessful = 6)
  }
}

package graft

import graft.sources.TxTable
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Randomized N-writer × M-commit serialization stress (round-11
  * directive #3): many concurrent writers issue sequential merge batches
  * (a MoR/CoW mix) over disjoint key slices while a maintenance thread
  * races folds and small-file compactions against them, and EVERY
  * committed version is then checked to be a legal serial history —
  * either value-neutral maintenance or exactly one writer advancing by
  * exactly its next batch, with per-writer progress monotone and the
  * final state equal to every writer fully applied. This is the
  * scaled-up form of the 2-writer races in `CommitArbiterSpec`/
  * `TxMorSpec`, matching the reference's "capture is transactional with
  * the DML" guarantee (reference: cdc_system.py:143-197) under real
  * contention.
  *
  * Determinism: per-writer seeded RNGs fix WHAT each writer does; the
  * OS scheduler picks the interleaving — the assertions quantify over
  * every interleaving, so the test is order-insensitive by design.
  */
class TxConcurrencySpec extends SparkSpecBase {

  private lazy val s = spark
  import s.implicits._

  private val nWriters = 8
  private val nBatches = 4 // 32 writer commits total
  private val sliceSize = 40

  /** One writer's batch j: a deterministic op set over its OWN slice,
    * each key touched by at most one batch (update/delete partition the
    * shuffled slice; inserts mint fresh negative keys), so prefix states
    * compose by simple map union regardless of in-batch order.
    */
  private final case class Batch(
      updates: Seq[(Long, String)], deletes: Seq[Long],
      inserts: Seq[(Long, String)])

  private def plan(w: Int): Seq[Batch] = {
    val rng = new scala.util.Random(42 + w)
    val slice = (w * sliceSize until (w + 1) * sliceSize).map(_.toLong)
    val shuffled = rng.shuffle(slice)
    val perBatch = sliceSize / nBatches
    (0 until nBatches).map { j =>
      val mine = shuffled.slice(j * perBatch, (j + 1) * perBatch)
      val (del, upd) = mine.splitAt(2) // 2 deletes, rest updates
      Batch(
        updates = upd.map(k => k -> s"w$w-b$j-k$k"),
        deletes = del,
        inserts = (0 until 3).map(i =>
          (-(w * 1000L + j * 100L + i + 1)) -> s"w$w-b$j-new$i"))
    }
  }

  /** Writer w's cumulative expected state after its first `j` batches,
    * restricted to its own key universe.
    */
  private def prefixState(w: Int, j: Int): Map[Long, String] = {
    val seed = (w * sliceSize until (w + 1) * sliceSize)
      .map(k => k.toLong -> s"v$k").toMap
    plan(w).take(j).foldLeft(seed) { (st, b) =>
      (st ++ b.updates ++ b.inserts) -- b.deletes
    }
  }

  /** The key universe version snapshots are classified against, per
    * writer: its seed slice plus every key it will ever insert.
    */
  private def universe(w: Int): Set[Long] =
    (w * sliceSize until (w + 1) * sliceSize).map(_.toLong).toSet ++
      plan(w).flatMap(_.inserts.map(_._1))

  test("randomized writer storm + racing maintenance: every version is a legal serial history") {
    val dir = Files.createTempDirectory("txstorm").toString
    val nKeys = nWriters * sliceSize
    TxTable.commit(
      s.range(0, nKeys).select(col("id"),
        concat(lit("v"), col("id")).as("v"))
        .repartitionByRange(4, col("id")).sortWithinPartitions(col("id")),
      dir, "overwrite", statsColumns = Seq("id"))

    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writers = (0 until nWriters).map { w =>
      new Thread(() => {
        try plan(w).foreach { b =>
          val rows =
            b.updates.map { case (k, v) => (k, v, "UPDATE") } ++
              b.deletes.map(k => (k, null.asInstanceOf[String], "DELETE")) ++
              b.inserts.map { case (k, v) => (k, v, "INSERT") }
          TxTable.merge(s, dir, rows.toDF("id", "v", "operation"),
            Seq("id"), maxRetries = 500,
            writeMode = if (w % 2 == 0) "mor" else "cow")
          ()
        } catch { case t: Throwable => failures.add(t); () }
      })
    }
    val writersDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maintenance = new Thread(() => {
      val rng = new scala.util.Random(7)
      try while (!writersDone.get()) {
        Thread.sleep(150)
        if (rng.nextBoolean()) TxTable.foldDvs(s, dir, maxRetries = 500)
        else TxTable.compactSmallFiles(s, dir, minBytes = 64 * 1024,
          targetFiles = 2, maxRetries = 500)
        ()
      } catch { case t: Throwable => failures.add(t); () }
    })
    maintenance.start()
    writers.foreach(_.start())
    writers.foreach(_.join())
    writersDone.set(true)
    maintenance.join()
    assert(failures.isEmpty,
      s"no thread may die: ${failures.toArray.mkString("; ")}")

    // --- the linearization check -------------------------------------
    val versions = TxTable.versions(dir)
    assert(versions === (0L until versions.size).toSeq.map(identity),
      "versions must be a contiguous CAS chain")
    val maintOps = Set("fold", "compact-small")
    def state(v: Long): Map[Long, String] =
      TxTable.read(s, dir, Some(v)).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap

    var prev = state(0L)
    val progress = Array.fill(nWriters)(0) // batches applied per writer
    versions.drop(1).foreach { v =>
      val cur = state(v)
      val op = TxTable.snapshot(dir, v).op
      if (cur == prev) {
        // value-neutral: must be a maintenance commit, never a writer's
        assert(maintOps(op), s"v$v changed nothing but has op '$op'")
      } else {
        assert(op === "merge", s"v$v changed values under op '$op' — " +
          "only writer merges may move state")
        // exactly one writer advanced by exactly its next batch
        val changedWriters = (0 until nWriters).filter { w =>
          val u = universe(w)
          cur.view.filterKeys(u).toMap != prev.view.filterKeys(u).toMap
        }
        assert(changedWriters.size === 1,
          s"v$v must advance exactly one writer, got $changedWriters")
        val w = changedWriters.head
        val u = universe(w)
        val got = cur.view.filterKeys(u).toMap
        val expectedNext = prefixState(w, progress(w) + 1)
        assert(got === expectedNext,
          s"v$v: writer $w must advance to its next prefix " +
            s"(batch ${progress(w) + 1})")
        progress(w) += 1
        // and nobody else moved
        (0 until nWriters).filterNot(_ == w).foreach { o =>
          val uo = universe(o)
          assert(cur.view.filterKeys(uo).toMap ===
            prev.view.filterKeys(uo).toMap, s"v$v leaked into writer $o")
        }
      }
      prev = cur
    }
    assert(progress.toSeq === Seq.fill(nWriters)(nBatches),
      "every writer must land every batch exactly once")
    // final state = all writers fully applied
    val want = (0 until nWriters).map(prefixState(_, nBatches))
      .reduce(_ ++ _)
    assert(prev === want, "final state must equal the full serial result")
    // and a terminal fold is value-neutral on top of whatever DVs remain
    TxTable.foldDvs(s, dir)
    assert(state(TxTable.versions(dir).last) === want)
  }
}

package graft

import graft.sources.{CommitArbiter, LocalLinkArbiter, TxTable}
import java.nio.file.{Files, Path, Paths}

/** The commit-arbiter seam: TxTable's atomicity reduced to one
  * put-if-absent primitive, with the POSIX link(2) arm as the local
  * implementation and the conditional-put contract proven through
  * injected implementations — lost races, permanent losers, and the
  * existing concurrency specs routed through the trait.
  */
class CommitArbiterSpec extends SparkSpecBase {

  private lazy val s = spark
  import s.implicits._

  /** Delegates to the local arbiter but LOSES the first `n` attempts —
    * the deterministic object-store race injector.
    */
  private final class LossyArbiter(n: Int) extends CommitArbiter {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    override def putIfAbsent(target: Path, content: String,
        tmpTag: String): Boolean = {
      if (attempts.incrementAndGet() <= n) false
      else LocalLinkArbiter.putIfAbsent(target, content, tmpTag)
    }
  }

  test("putIfAbsent contract: one winner, loser never clobbers") {
    val dir = Files.createTempDirectory("arbiter").toString
    val target = Paths.get(dir, "v0.manifest")
    assert(LocalLinkArbiter.putIfAbsent(target, "winner", "a"))
    assert(!LocalLinkArbiter.putIfAbsent(target, "loser", "b"))
    assert(Files.readString(target) === "winner")
    // loser scratch cleaned up
    assert(!Files.exists(Paths.get(dir, ".tmp-b")))
  }

  test("commit retries through injected lost races and lands intact") {
    val dir = Files.createTempDirectory("arbiterlossy").toString
    TxTable.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    val lossy = new LossyArbiter(2)
    val v = TxTable.commit(Seq((2L, "b")).toDF("id", "v"), dir, "append",
      arbiter = lossy)
    // two injected losses + the real publish; the retry loop re-reads
    // the base each time, so the commit still lands at the next version
    assert(lossy.attempts.get() === 3)
    assert(v === 1L)
    assert(TxTable.read(s, dir).collect().map(_.getLong(0)).toSet
      === Set(1L, 2L))
  }

  test("merge gives up cleanly after maxRetries permanent losses") {
    val dir = Files.createTempDirectory("arbiterdead").toString
    TxTable.commit(Seq((1L, "a")).toDF("id", "v"), dir,
      "overwrite", statsColumns = Seq("id"))
    val never = new CommitArbiter {
      override def putIfAbsent(t: Path, c: String, tag: String) = false
    }
    val err = intercept[IllegalArgumentException] {
      TxTable.merge(s, dir, Seq((1L, "A", "UPDATE")).toDF("id", "v", "operation"),
        Seq("id"), maxRetries = 3, arbiter = never)
    }
    assert(err.getMessage.contains("lost 3 publish races"))
    // the table is untouched — losers only ever leave invisible orphans
    assert(TxTable.read(s, dir).collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq === Seq((1L, "a")))
    assert(TxTable.versions(dir) === Seq(0L))
  }

  test("concurrent merges still serialize when BOTH route through the trait") {
    val dir = Files.createTempDirectory("arbiterrace").toString
    TxTable.commit((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"), dir,
      "overwrite", statsColumns = Seq("id"))
    // each thread loses one attempt first, then contends for real
    val threads = Seq(
      (3L, "A"), (7L, "B")).map { case (k, nv) =>
      new Thread(() => {
        TxTable.merge(s, dir, Seq((k, nv, "UPDATE")).toDF("id", "v", "operation"),
          Seq("id"), arbiter = new LossyArbiter(1))
        ()
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(TxTable.versions(dir) === Seq(0L, 1L, 2L))
    val rows = TxTable.read(s, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(3L) === "A" && rows(7L) === "B" && rows.size === 10)
  }

  // ---- the Hadoop-FileSystem arm: the portable protocol object stores
  // and HDFS are reached through (write temp, rename-no-overwrite).
  // True-concurrency exclusivity belongs to the STORE (atomic on HDFS;
  // check-then-act on the raw local FS), so these tests exercise the
  // protocol deterministically rather than racing threads on localfs.

  private def hadoopArbiter = new graft.sources.HadoopFsArbiter(
    spark.sessionState.newHadoopConf())

  test("hadoop arm: one winner, loser never clobbers, temps cleaned") {
    val dir = Files.createTempDirectory("arbiterhdfs").toString
    val target = Paths.get(dir, "v0.manifest")
    val arb = hadoopArbiter
    assert(arb.putIfAbsent(target, "winner", "a"))
    assert(!arb.putIfAbsent(target, "loser", "b"),
      "occupied target must report a lost race")
    assert(Files.readString(target) === "winner",
      "the loser's content must never clobber the winner's")
    assert(!Files.exists(Paths.get(dir, ".tmp-a")) &&
      !Files.exists(Paths.get(dir, ".tmp-b")), "scratch temps cleaned")
  }

  test("hadoop arm: full commits, appends, and CAS retries land intact") {
    val dir = Files.createTempDirectory("arbiterhdfs2").toString
    val arb = hadoopArbiter
    TxTable.commit(Seq((1L, "a")).toDF("id", "v"), dir, arbiter = arb)
    TxTable.commit(Seq((2L, "b")).toDF("id", "v"), dir, "append", arbiter = arb)
    assert(TxTable.read(s, dir).collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    // a loser that re-reads and retries through the hadoop arm
    val lossy = new CommitArbiter {
      val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
      override def putIfAbsent(t: Path, c: String, tag: String): Boolean =
        if (attempts.incrementAndGet() <= 1) false
        else arb.putIfAbsent(t, c, tag)
    }
    val v = TxTable.commit(Seq((3L, "c")).toDF("id", "v"), dir, "append",
      arbiter = lossy)
    assert(v === 2L)
    assert(TxTable.read(s, dir).count() === 3L)
    // merge (the serializable CAS path) through the hadoop arm
    TxTable.merge(s, dir, Seq((2L, "B", "UPDATE")).toDF("id", "v", "operation"),
      Seq("id"), arbiter = arb)
    assert(TxTable.read(s, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap.apply(2L) === "B")
  }

  test("compact keeps its CAS discipline through the trait") {
    val dir = Files.createTempDirectory("arbitercompact").toString
    (0 until 4).foreach { i =>
      TxTable.commit(Seq((i.toLong, s"v$i")).toDF("id", "v"), dir,
        if (i == 0) "overwrite" else "append", statsColumns = Seq("id"))
    }
    val lossy = new LossyArbiter(1)
    TxTable.compact(s, dir, targetFiles = 1, arbiter = lossy)
    assert(lossy.attempts.get() === 2, "one injected loss, one real publish")
    assert(TxTable.read(s, dir).collect().map(_.getLong(0)).toSet
      === (0L until 4L).toSet)
    assert(TxTable.latest(dir).get.files.size === 1)
  }
}

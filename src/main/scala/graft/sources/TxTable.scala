package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** A minimal transactional table format over plain parquet — the
  * engine's answer to the "Structured Streaming + Delta/Iceberg" stance
  * in BASELINE.md, built from first principles because this sandbox
  * ships no table-format dependency (reference: the epoch-dir overwrite
  * convention in [[graft.streaming.CdcStream]] is idempotent but gives
  * readers no atomic multi-file commit, no snapshot isolation, and no
  * time travel — the three things a production CDC target needs first).
  *
  * ==Layout==
  * {{{
  * table/
  *   data/<commit-uuid>/part-*.parquet   // immutable, written once
  *   _txlog/v<N>.manifest                // one text file per version
  * }}}
  * A manifest is the COMPLETE snapshot description: schema (Spark's own
  * `StructType.json`) plus the full relative file list — the
  * Delta-checkpoint shape, chosen over deltas so a read is one manifest
  * parse, never a log replay.
  *
  * ==Commit protocol (ACID on a POSIX filesystem)==
  *  1. Write data files under a fresh `data/<uuid>/` dir (invisible to
  *     readers — only manifest-listed files are ever read).
  *  2. Read the current latest version V, compose the new full file
  *     list (append: V's files + new; overwrite: new only).
  *  3. Publish as `v<V+1>.manifest` via hard-link-from-temp:
  *     `Files.createLink(target, tmp)` is atomic and FAILS if the
  *     target exists (POSIX link(2)) — the put-if-absent primitive a
  *     rename cannot provide (POSIX rename silently replaces, so a lost
  *     race would clobber a committed version). A loser re-reads the
  *     new latest and retries — optimistic concurrency, appends
  *     commute, overwrite is last-writer-wins.
  * Readers see either the old or the new manifest, never a partial
  * state: data files are complete before the link, and the link is the
  * single visibility point. On an object store the link step would be
  * swapped for the store's put-if-absent; the protocol is otherwise
  * unchanged (this is exactly Delta's LogStore seam).
  *
  * ==Schema evolution==
  * Appends may ADD nullable columns (old files read as null via the
  * snapshot schema); dropping or retyping an existing column is
  * rejected on append (rewriting history's meaning) and allowed on
  * overwrite (the table is being replaced). Time travel reads each
  * version under ITS OWN schema.
  *
  * ==At 100 TB==
  * The manifest lists files, not rows — O(files) driver text, the same
  * scaling contract as Delta's checkpoint. Old versions retain their
  * files until [[vacuum]] (keep the last k versions; unreferenced data
  * files and expired manifests are deleted). Readers pin a manifest, so
  * vacuum of RETAINED versions is always safe.
  */
object TxTable {

  final case class Snapshot(version: Long, op: String, schema: StructType,
      files: Seq[String], epoch: Option[Long] = None,
      stats: Map[String, Map[String, (Long, Long)]] = Map.empty) {
    /** Files whose [min, max] for `col` overlaps [lo, hi] — files with no
      * recorded stats are KEPT (skipping must never drop data).
      */
    def filesOverlapping(col: String, lo: Long, hi: Long): Seq[String] =
      files.filter { f =>
        stats.get(f).flatMap(_.get(col)) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true
        }
      }
  }

  private def logDir(dir: String): Path = Paths.get(dir, "_txlog")

  private def manifestPath(dir: String, v: Long): Path =
    logDir(dir).resolve(s"v$v.manifest")

  /** All committed versions, ascending; empty for a non-table dir. */
  def versions(dir: String): Seq[Long] = {
    val ld = logDir(dir)
    if (!Files.isDirectory(ld)) return Seq.empty
    val it = Files.list(ld)
    try it.iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
        s.stripPrefix("v").stripSuffix(".manifest").toLong
      }
      .toSeq.sorted
    finally it.close()
  }

  /** Parse one version's manifest. Unknown line kinds are ignored —
    * newer writers may add fields old readers skip.
    */
  def snapshot(dir: String, version: Long): Snapshot = {
    val lines = Files.readAllLines(manifestPath(dir, version)).asScala
    def field(k: String): String = lines
      .collectFirst { case l if l.startsWith(s"$k=") => l.stripPrefix(s"$k=") }
      .getOrElse(throw new IllegalStateException(
        s"manifest v$version at $dir is missing '$k='"))
    val stats = lines
      .collect { case l if l.startsWith("stats=") => l.stripPrefix("stats=") }
      .map { s =>
        // <file>|<col>|<minLong>|<maxLong> — file paths contain no '|'
        val p = s.split('|')
        (p(0), p(1), (p(2).toLong, p(3).toLong))
      }
      .groupBy(_._1)
      .map { case (f, rows) => f -> rows.map(r => r._2 -> r._3).toMap }
      .toMap
    Snapshot(version, field("op"),
      DataType.fromJson(field("schema")).asInstanceOf[StructType],
      lines.collect { case l if l.startsWith("file=") => l.stripPrefix("file=") }
        .toSeq,
      lines.collectFirst { case l if l.startsWith("epoch=") =>
        l.stripPrefix("epoch=").toLong },
      stats)
  }

  /** Latest snapshot, or None for an empty/absent table. */
  def latest(dir: String): Option[Snapshot] =
    versions(dir).lastOption.map(snapshot(dir, _))

  /** Read the table at `version` (time travel) or at the latest version.
    * The read is pinned to one manifest: a concurrent commit cannot
    * change the file set mid-query, and each version reads under its
    * own schema.
    */
  def read(spark: SparkSession, dir: String, version: Option[Long] = None): DataFrame = {
    val snap = version.map(snapshot(dir, _)).orElse(latest(dir))
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $dir"))
    if (snap.files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    else
      spark.read.schema(snap.schema)
        .parquet(snap.files.map(f => s"$dir/$f"): _*)
  }

  /** Commit `df` as a new version. `mode` is "append" or "overwrite".
    * Returns the committed version number.
    *
    * `statsColumns` opts the listed integral columns into MANIFEST-LEVEL
    * file skipping: one extra aggregate over the just-written batch
    * (grouped by `input_file_name`, O(new files) output) records each
    * new file's min/max per column in the manifest; [[readPruned]] then
    * prunes whole files before Spark ever opens a footer — the
    * Iceberg/Delta data-skipping tier above parquet's own row-group
    * statistics. Append commits carry the base's stats forward, so
    * skipping survives table growth.
    *
    * `epochId` stamps the manifest for [[commitStreaming]]'s exactly-once
    * contract.
    */
  def commit(df: DataFrame, dir: String, mode: String = "append",
      statsColumns: Seq[String] = Nil, epochId: Option[Long] = None): Long = {
    require(mode == "append" || mode == "overwrite",
      s"mode must be append or overwrite, got $mode")
    Files.createDirectories(logDir(dir))
    // 1. land immutable data files under a fresh commit dir
    val uuid = java.util.UUID.randomUUID().toString
    val commitRel = s"data/$uuid"
    df.write.parquet(s"$dir/$commitRel")
    val newFiles = {
      val it = Files.list(Paths.get(dir, commitRel))
      try it.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
        .map(n => s"$commitRel/$n").toSeq.sorted
      finally it.close()
    }
    val newSchema = df.schema
    val newStats: Map[String, Map[String, (Long, Long)]] =
      if (statsColumns.isEmpty || newFiles.isEmpty) Map.empty
      else {
        import org.apache.spark.sql.functions.{col, input_file_name, max, min}
        val spark = df.sparkSession
        val aggs = statsColumns.flatMap(c => Seq(
          min(col(c).cast("long")).as(s"__mn_$c"),
          max(col(c).cast("long")).as(s"__mx_$c")))
        spark.read.parquet(s"$dir/$commitRel")
          .groupBy(input_file_name().as("__f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            val fname = r.getString(0)
            val rel = s"$commitRel/${fname.substring(fname.lastIndexOf('/') + 1)}"
            rel -> statsColumns.zipWithIndex.flatMap { case (c, i) =>
              // all-null columns in a file have no usable range
              if (r.isNullAt(1 + 2 * i)) None
              else Some(c -> (r.getLong(1 + 2 * i), r.getLong(2 + 2 * i)))
            }.toMap
          }.toMap
      }
    // 2 + 3. compose against the CURRENT latest and publish; on a lost
    // race, re-read and retry (appends commute; overwrite last-wins)
    var committed = -1L
    while (committed < 0) {
      val base = latest(dir)
      val v = base.map(_.version + 1).getOrElse(0L)
      val (files, schema, stats) = (mode, base) match {
        case ("overwrite", _) | (_, None) => (newFiles, newSchema, newStats)
        case ("append", Some(b)) =>
          (b.files ++ newFiles, mergedAppendSchema(b.schema, newSchema, dir),
            b.stats ++ newStats)
        case other => throw new MatchError(other) // unreachable
      }
      val statsLines = stats.toSeq.sortBy(_._1).flatMap { case (f, cols) =>
        cols.toSeq.sortBy(_._1).map { case (c, (mn, mx)) => s"stats=$f|$c|$mn|$mx" }
      }
      val content = (Seq(
        s"version=$v",
        s"op=$mode",
        s"schema=${schema.json}") ++
        epochId.map(e => s"epoch=$e").toSeq ++
        files.map(f => s"file=$f") ++ statsLines)
        .mkString("", "\n", "\n")
      val tmp = logDir(dir).resolve(s".tmp-$uuid-$v")
      Files.writeString(tmp, content)
      try {
        Files.createLink(manifestPath(dir, v), tmp)
        committed = v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => () // lost race; retry
      } finally Files.deleteIfExists(tmp)
    }
    committed
  }

  /** Exactly-once streaming commit: the foreachBatch body for a TxTable
    * sink. The manifest is stamped with the checkpoint's `epochId`; a
    * crash-replayed epoch finds its stamp in the log and returns the
    * already-committed version WITHOUT writing — the table-format
    * equivalent of the epoch-dir overwrite convention, but atomic and
    * multi-file. (A crash between the data write and the manifest link
    * leaves only invisible orphan files, retired by [[vacuum]].)
    * Returns the epoch's version, new or found.
    */
  def commitStreaming(df: DataFrame, dir: String, epochId: Long,
      mode: String = "append", statsColumns: Seq[String] = Nil): Long = {
    def existing: Option[Long] =
      versions(dir).map(snapshot(dir, _))
        .collectFirst { case s if s.epoch.contains(epochId) => s.version }
    existing.getOrElse(
      commit(df, dir, mode, statsColumns, epochId = Some(epochId)))
  }

  /** Read with manifest-level file skipping: only files whose recorded
    * [min, max] for `column` overlaps [lo, hi] are handed to Spark (files
    * without stats are always read — skipping never drops data), and the
    * range predicate is applied on top, so the result is EXACTLY
    * `read(...).where(lo <= column <= hi)` with fewer files opened.
    */
  def readPruned(spark: SparkSession, dir: String, column: String,
      lo: Long, hi: Long, version: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val snap = version.map(snapshot(dir, _)).orElse(latest(dir))
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $dir"))
    val keep = snap.filesOverlapping(column, lo, hi)
    val base =
      if (keep.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
      else spark.read.schema(snap.schema).parquet(keep.map(f => s"$dir/$f"): _*)
    base.where(col(column) >= lo && col(column) <= hi)
  }

  /** Rewrite the latest snapshot into `targetFiles` files — the
    * small-files compaction every append-heavy table eventually needs.
    * Data is unchanged (one read + one overwrite commit); stats columns
    * carry over so skipping survives compaction. Returns the new version.
    */
  def compact(spark: SparkSession, dir: String, targetFiles: Int): Long = {
    require(targetFiles > 0, s"targetFiles must be positive, got $targetFiles")
    val snap = latest(dir).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $dir"))
    val statsCols = snap.stats.values.flatMap(_.keys).toSeq.distinct.sorted
    commit(read(spark, dir).repartition(targetFiles), dir, "overwrite", statsCols)
  }

  /** Append-mode schema rule: additive only. Every existing column must
    * survive with its type; new columns must be nullable-representable
    * (old files surface them as null).
    */
  private def mergedAppendSchema(
      base: StructType, incoming: StructType, dir: String): StructType = {
    val inByName = incoming.fields.map(f => f.name -> f).toMap
    base.fields.foreach { f =>
      inByName.get(f.name) match {
        case Some(g) if g.dataType == f.dataType => ()
        case Some(g) => throw new IllegalArgumentException(
          s"append to $dir retypes column '${f.name}': ${f.dataType.simpleString}" +
            s" -> ${g.dataType.simpleString}; use overwrite to replace the table")
        case None => throw new IllegalArgumentException(
          s"append to $dir drops column '${f.name}'; use overwrite to replace" +
            " the table")
      }
    }
    val baseNames = base.fieldNames.toSet
    StructType(base.fields ++
      incoming.fields.filterNot(f => baseNames(f.name)).map(_.copy(nullable = true)))
  }

  /** Retire history: keep the newest `keepVersions` manifests, delete
    * older ones plus every data file no retained manifest references.
    * Never touches the latest version; safe against readers of retained
    * versions (their manifests and files survive).
    *
    * Also retires ORPHANS — commit dirs referenced by NO manifest at all
    * (a writer that crashed between the data write and the manifest
    * link; invisible to readers, but they accumulate). `orphanGraceMs`
    * spares commit dirs younger than the grace window, so an IN-FLIGHT
    * commit's files are never swept from under it (Delta's vacuum
    * retention argument).
    */
  def vacuum(dir: String, keepVersions: Int = 1,
      orphanGraceMs: Long = 3600000L): Unit = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val vs = versions(dir)
    if (vs.isEmpty) return
    val (expired, retained) = vs.splitAt(math.max(0, vs.size - keepVersions))
    val referenced = retained.flatMap(v => snapshot(dir, v).files).toSet
    val doomed = expired.flatMap(v => snapshot(dir, v).files).toSet -- referenced
    doomed.foreach { f =>
      val p = Paths.get(dir, f)
      Files.deleteIfExists(p)
      // drop the commit dir once empty
      val parent = p.getParent
      val it = Files.list(parent)
      val empty = try !it.iterator().hasNext finally it.close()
      if (empty) Files.deleteIfExists(parent)
    }
    expired.foreach(v => Files.deleteIfExists(manifestPath(dir, v)))
    // orphan sweep: data/<uuid> dirs no surviving manifest references
    val dataRoot = Paths.get(dir, "data")
    if (Files.isDirectory(dataRoot)) {
      val live = versions(dir).flatMap(v => snapshot(dir, v).files)
        .map(f => f.split('/')(1)).toSet
      val cutoff = System.currentTimeMillis() - orphanGraceMs
      val it = Files.list(dataRoot)
      val candidates =
        try it.iterator().asScala.filter(Files.isDirectory(_)).toList
        finally it.close()
      candidates
        .filterNot(d => live(d.getFileName.toString))
        .filter(d => Files.getLastModifiedTime(d).toMillis < cutoff)
        .foreach { d =>
          val fit = Files.list(d)
          try fit.iterator().asScala.foreach(Files.deleteIfExists(_))
          finally fit.close()
          Files.deleteIfExists(d)
        }
    }
  }
}

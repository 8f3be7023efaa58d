package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession, functions}
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
  *  3. Publish as `v<V+1>.manifest` via [[CommitArbiter.putIfAbsent]] —
  *     the ONE storage-specific primitive in the protocol. The default
  *     [[LocalLinkArbiter]] hard-links from a temp file (POSIX link(2)
  *     atomically fails if the target exists — the put-if-absent a
  *     rename cannot provide, since POSIX rename silently replaces and
  *     a lost race would clobber a committed version); an object store
  *     swaps in a conditional put (see [[CommitArbiter]]'s contract).
  *     A loser re-reads the new latest and retries — optimistic
  *     concurrency, appends commute, overwrite is last-writer-wins.
  * Readers see either the old or the new manifest, never a partial
  * state: data files are complete before the publish, and the publish
  * is the single visibility point (Delta's LogStore seam).
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

  /** A file's min/max for one column, AT THE COLUMN'S OWN TYPE.
    * `kind` is the ordering domain: "long" (integral columns, plus
    * date as epoch days and timestamp as epoch micros — all exact
    * canonical longs) or "string" (UTF-8 byte order — the order Spark's
    * own string comparison uses, so a pruned read equals a filtered
    * read). `min`/`max` are the repr strings (decimal digits for long,
    * the raw value for string). A query whose bound kind differs from
    * the recorded kind never skips (sound under schema history mixing).
    */
  final case class ColRange(kind: String, min: String, max: String) {
    def overlapsLong(lo: Long, hi: Long): Boolean =
      kind != "long" || (max.toLong >= lo && min.toLong <= hi)
    def overlapsString(lo: String, hi: String): Boolean =
      kind != "string" || (utf8Cmp(max, lo) >= 0 && utf8Cmp(min, hi) <= 0)
  }

  /** Unsigned lexicographic UTF-8 byte comparison — Spark's UTF8String
    * order (Java's String.compareTo diverges on supplementary planes:
    * UTF-16 surrogates sort below U+E000..U+FFFF, UTF-8 bytes above).
    */
  private[graft] def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** One file's Bloom-filter entry for one column: the filter geometry
    * plus the sidecar (relative to `_txlog/`) holding the bit words.
    * Geometry rides per-entry so mixed-knob history stays readable.
    */
  final case class BloomRef(mBits: Int, k: Int, sidecar: String)

  /** `dvs` is the merge-on-read tier: per-file DELETION VECTORS, file →
    * sidecar (relative to `_txlog/`) holding the file's deleted row
    * positions. A reader drops (file, position) pairs listed in the
    * sidecars; a file without an entry is read whole. DV'd files keep
    * their stats/Bloom entries as sound OVER-approximations (deleted
    * rows still widen ranges — skipping keeps extra files, never drops
    * rows). [[compact]] folds DVs away (rewrites survivors, publishes
    * with no dv entries).
    */
  /** `sizes` records each data file's byte length in the manifest
    * (round 10): the scan planner ([[TxFileIndex]]) then builds its
    * listing from the manifest ALONE — zero filesystem RPCs at plan
    * time, the Delta-checkpoint refinement the provider's scaladoc
    * promised. Files without a recorded size (pre-round-10 manifests)
    * fall back to one `getFileStatus` each — additive, old manifests
    * stay readable.
    */
  final case class Snapshot(version: Long, op: String, schema: StructType,
      files: Seq[String], epoch: Option[Long] = None,
      stats: Map[String, Map[String, ColRange]] = Map.empty,
      blooms: Map[String, Map[String, BloomRef]] = Map.empty,
      dvs: Map[String, String] = Map.empty,
      sizes: Map[String, Long] = Map.empty,
      rows: Map[String, Long] = Map.empty,
      commitTs: Long = 0L,
      /** Identity of the WRITER STREAM that stamped `epoch` (round 14):
        * N concurrent replicators into one table each carry their own
        * cdc-id sequence, so the exactly-once high-water must be scoped
        * per stream — a table-global max silently dropped any batch
        * whose ids trailed another writer's committed max. Absent on
        * pre-round-14 manifests and on non-streaming commits.
        */
      streamId: Option[String] = None) {
    /** Files whose [min, max] for `col` overlaps the LONG range [lo, hi]
      * — files with no recorded stats (or stats of another kind) are
      * KEPT (skipping must never drop data).
      */
    def filesOverlapping(col: String, lo: Long, hi: Long): Seq[String] =
      files.filter(f => stats.get(f).flatMap(_.get(col))
        .forall(_.overlapsLong(lo, hi)))

    /** [[filesOverlapping]] for a STRING-keyed range, UTF-8 byte order. */
    def filesOverlappingString(col: String, lo: String, hi: String): Seq[String] =
      files.filter(f => stats.get(f).flatMap(_.get(col))
        .forall(_.overlapsString(lo, hi)))
  }

  private def b64enc(s: String): String =
    java.util.Base64.getEncoder.encodeToString(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def b64dec(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s),
      java.nio.charset.StandardCharsets.UTF_8)

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
        // typed:  <file>|<col>|<kind>|<b64min>|<b64max>
        // legacy: <file>|<col>|<minLong>|<maxLong>
        // (file paths and col names contain no '|'; values are base64
        // so no repr can collide with the delimiter or a newline)
        // limit -1 keeps trailing empty fields: b64enc("") is "", so a
        // string column whose only values are "" writes `...|string||`
        // and the default split would truncate it to 3 fields
        val p = s.split("\\|", -1)
        val range =
          if (p.length >= 5) ColRange(p(2), b64dec(p(3)), b64dec(p(4)))
          else ColRange("long", p(2), p(3))
        (p(0), p(1), range)
      }
      .groupBy(_._1)
      .map { case (f, rows) => f -> rows.map(r => r._2 -> r._3).toMap }
      .toMap
    val blooms = lines
      .collect { case l if l.startsWith("bloom=") => l.stripPrefix("bloom=") }
      .map { s =>
        // <file>|<col>|<mBits>|<k>|<sidecarRel>
        val p = s.split("\\|", -1)
        (p(0), p(1), BloomRef(p(2).toInt, p(3).toInt, p(4)))
      }
      .groupBy(_._1)
      .map { case (f, rows) => f -> rows.map(r => r._2 -> r._3).toMap }
      .toMap
    val dvs = lines
      .collect { case l if l.startsWith("dv=") => l.stripPrefix("dv=") }
      .map { s =>
        // <file>|<sidecarRel> (sidecar holds the positions; the manifest
        // stays O(files) lines however many rows are deleted)
        val p = s.split("\\|", -1)
        p(0) -> p(1)
      }.toMap
    val sizes = lines
      .collect { case l if l.startsWith("fsize=") => l.stripPrefix("fsize=") }
      .map { s =>
        val p = s.split("\\|", -1)
        p(0) -> p(1).toLong
      }.toMap
    val rowCounts = lines
      .collect { case l if l.startsWith("nrows=") => l.stripPrefix("nrows=") }
      .map { s =>
        val p = s.split("\\|", -1)
        p(0) -> p(1).toLong
      }.toMap
    Snapshot(version, field("op"),
      DataType.fromJson(field("schema")).asInstanceOf[StructType],
      lines.collect { case l if l.startsWith("file=") => l.stripPrefix("file=") }
        .toSeq,
      lines.collectFirst { case l if l.startsWith("epoch=") =>
        l.stripPrefix("epoch=").toLong },
      stats, blooms, dvs, sizes, rowCounts,
      // commit wall-clock (epoch millis, round 11): 0 on older manifests
      // — readers must treat 0 as "unknown", not 1970
      lines.collectFirst { case l if l.startsWith("ts=") =>
        l.stripPrefix("ts=").toLong }.getOrElse(0L),
      lines.collectFirst { case l if l.startsWith("stream=") =>
        l.stripPrefix("stream=") })
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
      dvApply(spark, dir, snap,
        spark.read.schema(snap.schema)
          .parquet(snap.files.map(f => s"$dir/$f"): _*))
  }

  /** Read a SUBSET of a snapshot's files (file-relative manifest paths)
    * with the snapshot's deletion vectors applied — the pruned read path
    * [[TxDvRelation]] composes with [[TxPrune]] file skipping, so a
    * DV-carrying table keeps manifest-stat/Bloom skipping instead of
    * degrading to an O(table) scan between a MoR merge and the next
    * fold. Value-identical to [[read]] when `kept` covers every file
    * (DVs for pruned-away files simply find nothing to anti-join).
    */
  private[graft] def readSubset(spark: SparkSession, dir: String,
      snap: Snapshot, kept: Set[String]): DataFrame = {
    val files = snap.files.filter(kept)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    else
      dvApply(spark, dir, snap,
        spark.read.schema(snap.schema)
          .parquet(files.map(f => s"$dir/$f"): _*))
  }

  /** Parse one deletion-vector sidecar: fileRel → sorted positions. */
  private def readDvSidecar(dir: String, sidecarRel: String)
      : Map[String, Array[Long]] = {
    val p = logDir(dir).resolve(sidecarRel)
    if (!Files.isRegularFile(p)) return Map.empty
    Files.readAllLines(p).asScala.filter(_.nonEmpty).map { l =>
      val parts = l.split("\\|", -1)
      parts(0) -> parts(1).split(',').filter(_.nonEmpty).map(_.toLong)
    }.toMap
  }

  /** All deleted (fileRel → positions) of a snapshot, resolved through
    * its sidecars (each parsed once; entries for files the snapshot no
    * longer lists are ignored).
    */
  private[graft] def dvPositions(dir: String, snap: Snapshot)
      : Map[String, Array[Long]] = {
    if (snap.dvs.isEmpty) return Map.empty
    val sidecars = snap.dvs.values.toSeq.distinct
      .map(s => s -> readDvSidecar(dir, s)).toMap
    snap.dvs.flatMap { case (f, side) =>
      sidecars(side).get(f).map(f -> _)
    }
  }

  /** Apply a snapshot's deletion vectors to a frame read from (a subset
    * of) its files: broadcast anti-join on (file-relative path, parquet
    * row position) via the `_metadata` columns. No DVs → the frame
    * passes through untouched (zero plan overhead on the common path).
    *
    * Scale: the DV frame is O(deleted-since-last-compact) rows and
    * rides as a broadcast; the big side gains one codegen'd projection
    * (path suffix + row_index) and one broadcast-hash anti probe per
    * row — never a shuffle. [[compact]] restores the DV-free plan.
    */
  private def dvApply(spark: SparkSession, dir: String, snap: Snapshot,
      base: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    dvJoined(spark, dir, snap, base) match {
      case None => base
      case Some(joined) => joined.select(base.columns.map(col).toSeq: _*)
    }
  }

  /** The raw DV anti-join over `base` WITHOUT the final projection —
    * output = base's columns plus the `__dv_rel`/`__dv_pos` identity
    * columns. None when the snapshot carries no DVs. [[TxDvScanRule]]
    * consumes this form (it projects back to the relation's own output
    * attributes, which may include `_metadata`); [[dvApply]] wraps it
    * for the plain read paths.
    */
  private[graft] def dvJoined(spark: SparkSession, dir: String,
      snap: Snapshot, base: DataFrame): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{broadcast, col, concat_ws, slice, split}
    val dv = dvPositions(dir, snap)
    if (dv.isEmpty) return None
    val pairs = dv.toSeq.flatMap { case (f, ps) => ps.map(p => (f, p)) }
    val dvDf = spark.createDataFrame(pairs).toDF("__dv_rel", "__dv_pos")
    // file-relative suffix data/<uuid>/<part> — the same manifest-keyed
    // identity merge's hit scan uses
    val withId = base
      .withColumn("__dv_rel",
        concat_ws("/", slice(split(col("_metadata.file_path"), "/"), -3, 3)))
      .withColumn("__dv_pos", col("_metadata.row_index"))
    Some(withId.join(broadcast(dvDf), Seq("__dv_rel", "__dv_pos"), "left_anti"))
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
      statsColumns: Seq[String] = Nil, epochId: Option[Long] = None,
      arbiter: CommitArbiter = LocalLinkArbiter,
      bloomColumns: Seq[String] = Nil, bloomBits: Int = 1 << 13,
      bloomK: Int = 5, streamId: Option[String] = None,
      expectVersion: Option[Long] = None): Long = {
    require(mode == "append" || mode == "overwrite",
      s"mode must be append or overwrite, got $mode")
    // knob validation BEFORE the batch write — a bad knob must not cost
    // a full data write that then rots as an orphan until vacuum
    require(bloomBits > 0 && bloomBits % 32 == 0,
      s"bloomBits must be a positive multiple of 32, got $bloomBits")
    require(bloomK > 0 && bloomK <= 16, s"bloomK must be in [1, 16], got $bloomK")
    val (commitRel, newFiles, newStats, newBlooms, newSizes, newRows) =
      writeData(df, dir, statsColumns,
        bloomColumns.map(c => c -> (bloomBits, bloomK)).toMap)
    val newSchema = df.schema
    // 2 + 3. compose against the CURRENT latest and publish; on a lost
    // race, re-read and retry (appends commute; overwrite last-wins)
    var committed = -1L
    var gaveUp = false
    while (committed < 0 && !gaveUp) {
      val base = latest(dir)
      val v = base.map(_.version + 1).getOrElse(0L)
      // CAS form (round 14): `expectVersion` pins the publish to ONE
      // version — a concurrent writer taking it means the caller's
      // premise (e.g. "the table is still empty") no longer holds, so
      // return -1 instead of silently composing against the new base
      // (the contended-seed race: two first batches both saw an empty
      // table; the retry loop turned the loser into an overwrite of the
      // winner's data). The loser's data dir is an invisible orphan,
      // retired by vacuum like any lost merge race.
      if (expectVersion.exists(_ != v)) gaveUp = true
      else {
        val (files, schema, stats, blooms, dvs, sizes, rows) =
          (mode, base) match {
            case ("overwrite", _) | (_, None) =>
              (newFiles, newSchema, newStats, newBlooms,
                Map.empty[String, String], newSizes, newRows)
            case ("append", Some(b)) =>
              // deletion vectors carry forward — dropping them would
              // resurrect every row a prior merge-on-read deleted
              (b.files ++ newFiles, mergedAppendSchema(b.schema, newSchema, dir),
                b.stats ++ newStats, b.blooms ++ newBlooms, b.dvs,
                b.sizes ++ newSizes, b.rows ++ newRows)
            case other => throw new MatchError(other) // unreachable
          }
        if (publishAt(dir, v, mode, schema, files, stats, epochId,
            tmpTag = commitRel.stripPrefix("data/"), arbiter = arbiter,
            blooms = blooms, dvs = dvs, sizes = sizes, rows = rows,
            streamId = streamId))
          committed = v
        else if (expectVersion.isDefined) gaveUp = true
      }
    }
    committed
  }

  /** Land `df`'s parquet files under a fresh invisible commit dir.
    * Returns (commit-relative dir, sorted relative file list, per-file
    * min/max stats for `statsColumns`). Step 1 of the commit protocol,
    * factored out so [[merge]] can compose file lists before publishing.
    */
  private def writeData(df: DataFrame, dir: String, statsColumns: Seq[String],
      bloomSpec: Map[String, (Int, Int)] = Map.empty)
      : (String, Seq[String], Map[String, Map[String, ColRange]],
         Map[String, Map[String, BloomRef]], Map[String, Long],
         Map[String, Long]) = {
    Files.createDirectories(logDir(dir))
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
    val newStats: Map[String, Map[String, ColRange]] =
      if (statsColumns.isEmpty || newFiles.isEmpty) Map.empty
      else {
        import org.apache.spark.sql.functions.{col, input_file_name, max, min}
        val spark = df.sparkSession
        val written = spark.read.parquet(s"$dir/$commitRel")
        // min/max at each column's own type (canonicalized): a column
        // whose type has no sound ordering repr records NO stats (the
        // file is then always read — skipping never drops data)
        val typed: Seq[(String, String, DataType)] = statsColumns.flatMap { c =>
          written.schema.fields.find(_.name == c)
            .flatMap(f => statKind(f.dataType).map(k => (c, k, f.dataType)))
        }
        if (typed.isEmpty) Map.empty
        else {
          val aggs = typed.flatMap { case (c, _, dt) =>
            val e = statCanonical(col(c), dt)
            Seq(min(e).as(s"__mn_$c"), max(e).as(s"__mx_$c"))
          }
          written
            .groupBy(input_file_name().as("__f"))
            .agg(aggs.head, aggs.tail: _*)
            .collect()
            .map { r =>
              val fname = r.getString(0)
              val rel = s"$commitRel/${fname.substring(fname.lastIndexOf('/') + 1)}"
              rel -> typed.zipWithIndex.flatMap { case ((c, k, _), i) =>
                // all-null columns in a file have no usable range
                if (r.isNullAt(1 + 2 * i)) None
                else Some(c -> ColRange(k,
                  reprOf(r, 1 + 2 * i, k), reprOf(r, 2 + 2 * i, k)))
              }.toMap
            }.toMap
        }
      }
    val newBlooms = buildBlooms(df.sparkSession, dir, commitRel, uuid,
      newFiles, bloomSpec)
    // byte lengths into the manifest: the scan planner lists from the
    // manifest alone (zero FS RPCs at plan time)
    val newSizes = newFiles.map(f => f -> Files.size(Paths.get(dir, f))).toMap
    // per-file row counts from the parquet FOOTERS (metadata pages only,
    // no data read; O(new files) driver I/O like the size stat) — lets
    // [[countRows]] answer COUNT(*) from the manifest alone
    val hconf = df.sparkSession.sessionState.newHadoopConf()
    val newRows = newFiles.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$dir/$f"), hconf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try f -> r.getRecordCount finally r.close()
    }.toMap
    (commitRel, newFiles, newStats, newBlooms, newSizes, newRows)
  }

  /** Per-(file, column) Bloom filters for the just-written batch — the
    * point-lookup sibling of the min/max stats: a range tells you a file
    * COULD contain a key's neighborhood, a Bloom filter tells you it
    * almost certainly does NOT contain the key itself, which is what
    * skips files on a NON-clustered column where every range overlaps.
    *
    * Build: per column, one distributed aggregate over the batch grouped
    * by (file, word index) — map-side `bit_or` combine bounds the
    * shuffle by files × mBits/32 words, never by row count. The bit
    * layout is [[graft.ext.BloomFilter]]'s portable universal-hash
    * scheme over the canonical value STRING (long canonicals in decimal,
    * strings raw), so the driver can re-probe it without Spark. Words
    * land in ONE sidecar text file per commit under `_txlog/bloom/`
    * (manifests stay O(files) small lines; the sidecar is invisible
    * until the manifest CAS references it, so the commit protocol is
    * unchanged). Columns outside the integral/string stat domains are
    * skipped — date/timestamp reprs would be ambiguous at lookup time.
    *
    * At 100 TB: sidecars are O(files × mBits/8) bytes per commit,
    * read lazily per lookup and parsed driver-side like the manifest
    * itself; a table with millions of files shards the probe across the
    * cluster (the documented growth path — the format already stores
    * everything that scan needs).
    */
  private def buildBlooms(spark: SparkSession, dir: String, commitRel: String,
      uuid: String, newFiles: Seq[String], bloomSpec: Map[String, (Int, Int)])
      : Map[String, Map[String, BloomRef]] = {
    import org.apache.spark.sql.functions.{col, expr, explode, array, lit,
      input_file_name, pmod, struct}
    if (bloomSpec.isEmpty || newFiles.isEmpty) return Map.empty
    val written = spark.read.parquet(s"$dir/$commitRel")
    val eligible = bloomSpec.toSeq.sortBy(_._1).flatMap { case (c, (m, k)) =>
      written.schema.fields.find(_.name == c)
        .filter(f => statKind(f.dataType).isDefined &&
          f.dataType != org.apache.spark.sql.types.DateType &&
          !f.dataType.isInstanceOf[org.apache.spark.sql.types.TimestampType])
        .map(f => (c, f.dataType, m, k))
    }
    if (eligible.isEmpty) return Map.empty
    val sidecarRel = s"bloom/$uuid.bloom"
    // ONE job for every bloom column: stage each column's hash once,
    // explode (column, pos) pairs, aggregate by (file, column, word) —
    // the post-write read is paid once, not per column
    val P = graft.ext.PortableHash.P
    val staged = written.select(
      input_file_name().as("__f") +: eligible.map { case (c, dt, _, _) =>
        pmod(graft.ext.PortableHash.hash32(
          statCanonical(col(c), dt).cast("string")), lit(P)).as(s"__x_$c")
      }: _*)
    val posStructs = eligible.flatMap { case (c, _, mBits, k) =>
      graft.ext.PortableHash.minhashAB(k).map { case (a, b) =>
        struct(lit(c).as("c"),
          (pmod(col(s"__x_$c") * lit(a) + lit(b), lit(P)) % mBits).as("pos"))
      }
    }
    val words = staged
      .select(col("__f"), explode(array(posStructs: _*)).as("__cp"))
      .filter(col("__cp.pos").isNotNull) // null keys contribute no bits
      .groupBy(col("__f"), col("__cp.c").as("__c"),
        expr("__cp.pos div 32").as("__w"))
      .agg(expr(
        "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(__cp.pos % 32 AS INT)))")
        .as("__wv"))
      .collect()
    val byFileCol = words.groupBy { r =>
      val fname = r.getString(0)
      (s"$commitRel/${fname.substring(fname.lastIndexOf('/') + 1)}",
        r.getString(1))
    }
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val refs = scala.collection.mutable.Map
      .empty[String, Map[String, BloomRef]]
    eligible.foreach { case (c, _, mBits, k) =>
      newFiles.foreach { rel =>
        val arr = new Array[Long](mBits / 32)
        byFileCol.getOrElse((rel, c), Array.empty).foreach { r =>
          arr(r.getLong(2).toInt) = r.getLong(3)
        }
        lines += s"$rel|$c|${arr.mkString(",")}"
        refs(rel) = refs.getOrElse(rel, Map.empty) +
          (c -> BloomRef(mBits, k, sidecarRel))
      }
    }
    val sidecarPath = logDir(dir).resolve(sidecarRel)
    Files.createDirectories(sidecarPath.getParent)
    Files.writeString(sidecarPath, lines.mkString("", "\n", "\n"))
    refs.toMap
  }

  /** Driver-side twin of [[graft.ext.PortableHash.hash32]] (first 8 md5
    * hex digits as a long) — what lets a point lookup probe manifest
    * Bloom filters without running a Spark job.
    */
  private[graft] def hash32Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** The k bit positions `repr` probes in an (mBits, k) filter —
    * loop-invariant across files, computed once per lookup per distinct
    * geometry (the md5 and the hash-constant table are NOT re-derived
    * per file).
    */
  private def bloomPositions(mBits: Int, k: Int, repr: String): Array[Int] = {
    val P = graft.ext.PortableHash.P
    val x = math.floorMod(hash32Jvm(repr), P)
    graft.ext.PortableHash.minhashAB(k).map { case (a, b) =>
      (math.floorMod(x * a + b, P) % mBits).toInt
    }.toArray
  }

  private def bloomMightContain(words: Array[Long], positions: Array[Int])
      : Boolean =
    positions.forall(pos => ((words(pos / 32) >>> (pos % 32)) & 1L) == 1L)

  /** Parse one bloom sidecar: (file, col) -> words. Cached per lookup
    * call, not globally — sidecars are immutable but small, and a
    * lookup touches only the sidecars its snapshot references.
    */
  private def readSidecar(dir: String, sidecarRel: String)
      : Map[(String, String), Array[Long]] = {
    val p = logDir(dir).resolve(sidecarRel)
    if (!Files.isRegularFile(p)) return Map.empty
    Files.readAllLines(p).asScala.filter(_.nonEmpty).map { l =>
      val parts = l.split("\\|", -1)
      (parts(0), parts(1)) -> parts(2).split(',').map(_.toLong)
    }.toMap
  }

  /** Files of `snap` that might contain `repr` in `column` per their
    * Bloom entries; files without an entry for the column are KEPT
    * (skipping never drops data), as are files whose sidecar is missing
    * or whose stored word count disagrees with the recorded geometry.
    */
  private[graft] def filesForPoint(dir: String, snap: Snapshot,
      column: String, repr: String): Seq[String] = {
    val sideCache = scala.collection.mutable.Map
      .empty[String, Map[(String, String), Array[Long]]]
    val posCache = scala.collection.mutable.Map.empty[(Int, Int), Array[Int]]
    snap.files.filter { f =>
      snap.blooms.get(f).flatMap(_.get(column)) match {
        case None => true
        case Some(ref) =>
          val side = sideCache.getOrElseUpdate(ref.sidecar,
            readSidecar(dir, ref.sidecar))
          side.get((f, column)) match {
            case Some(words) if words.length == ref.mBits / 32 =>
              bloomMightContain(words, posCache.getOrElseUpdate(
                (ref.mBits, ref.k), bloomPositions(ref.mBits, ref.k, repr)))
            case _ => true
          }
      }
    }
  }

  /** Point-lookup read over an INTEGRAL column with Bloom-filter file
    * skipping: only files whose per-file Bloom entry might contain
    * `value` are handed to Spark (files without entries are always
    * read), and the exact equality predicate is applied on top — so the
    * result is EXACTLY `read(...).where(column = value)` with fewer
    * files opened. The complement of [[readPruned]]: ranges skip on the
    * CLUSTERED column, Blooms skip point probes on any OTHER column,
    * where every file's range overlaps.
    */
  def readPointLookupLong(spark: SparkSession, dir: String, column: String,
      value: Long, version: Option[Long] = None): DataFrame =
    readKeptPoint(spark, dir, version, column, value.toString,
      functions.lit(value), probeKind = "integral")

  /** [[readPointLookupLong]] for a STRING column. */
  def readPointLookupString(spark: SparkSession, dir: String, column: String,
      value: String, version: Option[Long] = None): DataFrame =
    readKeptPoint(spark, dir, version, column, value, functions.lit(value),
      probeKind = "string")

  /** The bloom-probe domain of a column type: integral columns and
    * strings only (what [[buildBlooms]] records entries for). A probe
    * whose kind differs from the column's must NOT prune — the equality
    * predicate COERCES (e.g. `stringCol = 37` matches a stored "037",
    * whose canonical repr "037" shares no bloom bits with "37"), so a
    * repr-based skip would silently drop coercion matches — the same
    * stance as [[pruneByKeyRange]]'s type guard.
    */
  private def bloomKind(dt: DataType): Option[String] = dt match {
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType => Some("integral")
    case org.apache.spark.sql.types.StringType => Some("string")
    case _ => None
  }

  private def readKeptPoint(spark: SparkSession, dir: String,
      version: Option[Long], column: String, repr: String,
      value: org.apache.spark.sql.Column, probeKind: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val snap = version.map(snapshot(dir, _)).orElse(latest(dir))
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $dir"))
    val colKind = snap.schema.fields.find(_.name == column)
      .flatMap(f => bloomKind(f.dataType))
    val kept =
      if (colKind.contains(probeKind)) filesForPoint(dir, snap, column, repr)
      else snap.files // kind mismatch: coercion could match what reprs miss
    val base =
      if (kept.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
      else dvApply(spark, dir, snap, spark.read.schema(snap.schema)
        .parquet(kept.map(f => s"$dir/$f"): _*))
    base.where(col(column) === value)
  }

  /** The stats ordering domain for a column type: integral, date
    * (epoch days), and timestamp (epoch micros) canonicalize to "long";
    * strings order by their own UTF-8 bytes. Anything else (double's
    * NaN order, decimal scales, binary, nested) records no stats.
    */
  private def statKind(dt: DataType): Option[String] = dt match {
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType => Some("long")
    case org.apache.spark.sql.types.DateType => Some("long")
    case _: org.apache.spark.sql.types.TimestampType => Some("long")
    case org.apache.spark.sql.types.StringType => Some("string")
    case _ => None
  }

  /** Canonical ordering expression for [[statKind]]'s domains — exact,
    * total on the column's type (unlike the historical `try_cast(long)`,
    * which nulled out non-numeric values and forced an all-files
    * fallback for string keys).
    */
  private def statCanonical(c: org.apache.spark.sql.Column, dt: DataType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{unix_date, unix_micros}
    dt match {
      case org.apache.spark.sql.types.StringType => c
      case org.apache.spark.sql.types.DateType => unix_date(c).cast("long")
      case _: org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _ => c.cast("long")
    }
  }

  private def reprOf(r: org.apache.spark.sql.Row, i: Int, kind: String): String =
    kind match {
      case "long" => r.getLong(i).toString
      case "string" => r.getString(i)
    }

  /** Files of `snap` that can contain any of `keys`' values of
    * `statKey` — ONE 1-row bounds aggregate over the key frame,
    * intersected with the manifest ranges driver-side (O(files)). Typed:
    * the bounds are computed at the snapshot column's own type, so
    * string keys prune exactly like integral ones (the historical
    * `try_cast(long)` version had to keep EVERY file once any key
    * failed the cast). Null keys match nothing in a keyed equi-join and
    * so never constrain the file set; a key type outside [[statKind]]'s
    * domains, or a key frame whose column type differs from the base's
    * (join coercion could match values the cast drops), keeps all files
    * (sound). Used by [[merge]]'s copy-on-write pre-prune and
    * [[changeFeed]]'s append-path base prune.
    */
  private def pruneByKeyRange(snap: Snapshot, keys: DataFrame,
      statKey: String): Seq[String] = {
    import org.apache.spark.sql.functions.{col, count, max, min}
    if (!snap.stats.values.exists(_.contains(statKey))) return snap.files
    val dtOpt = snap.schema.fields.find(_.name == statKey).map(_.dataType)
    // Prune ONLY when the key frame's column is the base column's exact
    // type. A mismatched batch (say STRING keys against a LONG base)
    // equi-joins under Spark's coercion — both sides to double, where
    // '5.0' DOES hit 5 — but cast('5.0' as long) is null, so bounds
    // computed through the cast would miss the file and lose the
    // DELETE/UPDATE. Keeping every file on mismatch restores the
    // round-8 guarantee without the per-row try_cast census.
    val keyDt = keys.schema.fields.find(_.name == statKey).map(_.dataType)
    if (keyDt != dtOpt) return snap.files
    dtOpt.flatMap(statKind) match {
      case None => snap.files // key type has no sound ordering repr
      case Some(kind) =>
        val e = statCanonical(col(statKey), dtOpt.get)
        val b = keys.agg(min(e), max(e), count(e)).collect()(0)
        if (b.getLong(2) == 0L) Seq.empty // no non-null key touches any file
        else if (kind == "long")
          snap.filesOverlapping(statKey, b.getLong(0), b.getLong(1))
        else
          snap.filesOverlappingString(statKey, b.getString(0), b.getString(1))
    }
  }

  /** Publish a manifest at EXACTLY version `v` via the hard-link
    * put-if-absent. Returns false if `v` was taken by a concurrent
    * writer — the compare-and-swap primitive [[merge]]'s serializable
    * read-modify-write loop needs (plain [[commit]] retries internally
    * because append/overwrite compose against ANY base; a merge's
    * output is only valid against the base version it read).
    */
  private def publishAt(dir: String, v: Long, op: String, schema: StructType,
      files: Seq[String], stats: Map[String, Map[String, ColRange]],
      epochId: Option[Long], tmpTag: String,
      arbiter: CommitArbiter = LocalLinkArbiter,
      blooms: Map[String, Map[String, BloomRef]] = Map.empty,
      dvs: Map[String, String] = Map.empty,
      sizes: Map[String, Long] = Map.empty,
      rows: Map[String, Long] = Map.empty,
      streamId: Option[String] = None): Boolean = {
    val statsLines = stats.toSeq.sortBy(_._1).flatMap { case (f, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, r) =>
        s"stats=$f|$c|${r.kind}|${b64enc(r.min)}|${b64enc(r.max)}"
      }
    }
    val bloomLines = blooms.toSeq.sortBy(_._1).flatMap { case (f, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, r) =>
        s"bloom=$f|$c|${r.mBits}|${r.k}|${r.sidecar}"
      }
    }
    // NOTE: dv= lines are NOT backward-ignorable — a reader that skipped
    // them would resurrect deleted rows. This engine's readers all parse
    // them; the manifest format carries no version negotiation because
    // there is exactly one reader implementation (unknown-line tolerance
    // remains for genuinely ADDITIVE fields like stats/bloom).
    val dvLines = dvs.toSeq.sortBy(_._1).map { case (f, side) =>
      s"dv=$f|$side"
    }
    val sizeLines = sizes.toSeq.sortBy(_._1).map { case (f, n) =>
      s"fsize=$f|$n"
    }
    val rowLines = rows.toSeq.sortBy(_._1).map { case (f, n) =>
      s"nrows=$f|$n"
    }
    val content = (Seq(
      s"version=$v",
      s"op=$op",
      s"schema=${schema.json}",
      // commit wall-clock: gives the scan planner a real mtime for
      // manifest-synthesized file statuses (ADDITIVE — old readers would
      // ignore an unknown line, old manifests parse to commitTs=0)
      s"ts=${System.currentTimeMillis()}") ++
      epochId.map(e => s"epoch=$e").toSeq ++
      // additive: old readers ignore unknown lines; scopes the epoch
      // stamp to its writer stream for the per-stream high-water ledger
      streamId.map(s => s"stream=$s").toSeq ++
      files.map(f => s"file=$f") ++ statsLines ++ bloomLines ++ dvLines ++
      sizeLines ++ rowLines)
      .mkString("", "\n", "\n")
    arbiter.putIfAbsent(manifestPath(dir, v), content, s"$tmpTag-$v")
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
      mode: String = "append", statsColumns: Seq[String] = Nil,
      arbiter: CommitArbiter = LocalLinkArbiter,
      bloomColumns: Seq[String] = Nil): Long = {
    def existing: Option[Long] =
      versions(dir).map(snapshot(dir, _))
        .collectFirst { case s if s.epoch.contains(epochId) => s.version }
    existing.getOrElse(
      commit(df, dir, mode, statsColumns, epochId = Some(epochId), arbiter,
        bloomColumns = bloomColumns))
  }

  /** A table's current Bloom geometry per column, used to re-establish
    * entries for files rewritten by [[merge]] and [[compact]]. Geometry
    * is a per-commit knob but in practice table-constant; when history
    * mixes knobs the WIDEST filter wins deterministically (max mBits,
    * then max k) — an unordered-map head would let successive rebuilds
    * flip-flop geometry and silently degrade the false-positive rate.
    */
  private def bloomSpecOf(snap: Snapshot): Map[String, (Int, Int)] =
    snap.blooms.values.flatten.groupBy(_._1)
      .map { case (c, es) =>
        c -> es.map(e => (e._2.mBits, e._2.k)).max
      }

  /** Read with manifest-level file skipping: only files whose recorded
    * [min, max] for `column` overlaps [lo, hi] are handed to Spark (files
    * without stats are always read — skipping never drops data), and the
    * range predicate is applied on top, so the result is EXACTLY
    * `read(...).where(lo <= column <= hi)` with fewer files opened.
    */
  def readPruned(spark: SparkSession, dir: String, column: String,
      lo: Long, hi: Long, version: Option[Long] = None): DataFrame =
    readKeptRange(spark, dir, version, column,
      _.filesOverlapping(column, lo, hi), functions.lit(lo), functions.lit(hi))

  /** [[readPruned]] for a STRING column: manifest stats are recorded in
    * UTF-8 byte order — the same order Spark's string comparison uses —
    * so the pruned read is exactly `read(...).where(lo <= column <= hi)`
    * with only the overlapping files opened.
    */
  def readPrunedString(spark: SparkSession, dir: String, column: String,
      lo: String, hi: String, version: Option[Long] = None): DataFrame =
    readKeptRange(spark, dir, version, column,
      _.filesOverlappingString(column, lo, hi), functions.lit(lo), functions.lit(hi))

  /** Shared body of the pruned reads: resolve the snapshot, keep only
    * the overlapping files, re-apply the exact range predicate on top.
    */
  private def readKeptRange(spark: SparkSession, dir: String,
      version: Option[Long], column: String,
      keepOf: Snapshot => Seq[String],
      lo: org.apache.spark.sql.Column, hi: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions.col
    val snap = version.map(snapshot(dir, _)).orElse(latest(dir))
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $dir"))
    val keep = keepOf(snap)
    val base =
      if (keep.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
      else dvApply(spark, dir, snap,
        spark.read.schema(snap.schema).parquet(keep.map(f => s"$dir/$f"): _*))
    base.where(col(column) >= lo && col(column) <= hi)
  }

  /** COUNT(*) from the MANIFEST alone when possible: Σ per-file `nrows`
    * minus the deletion-vector positions — zero file opens, zero Spark
    * jobs, O(manifest + dv sidecars) driver text (the metadata-only
    * count Delta/Iceberg answer from their logs). Returns None when any
    * listed file lacks a recorded count (pre-round-10 manifests) — the
    * caller falls back to a real scan ([[countRows]]).
    */
  def manifestRowCount(dir: String, version: Option[Long] = None): Option[Long] = {
    val snap = version.map(snapshot(dir, _)).orElse(latest(dir))
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $dir"))
    if (!snap.files.forall(snap.rows.contains)) None
    else {
      val live = snap.files.map(snap.rows).sum
      val deleted = dvPositions(dir, snap).values.map(_.length.toLong).sum
      Some(live - deleted)
    }
  }

  /** Exact row count: the manifest answer when complete, otherwise one
    * real `count()` over the snapshot.
    */
  def countRows(spark: SparkSession, dir: String,
      version: Option[Long] = None): Long =
    manifestRowCount(dir, version)
      .getOrElse(read(spark, dir, version).count())

  /** Fold deletion vectors WITHOUT a full compaction: rewrite ONLY the
    * dv-carrying files minus their deleted rows; every clean file (and
    * its stats/Bloom entries) carries forward by reference. Cost is
    * O(dv'd-file bytes) — the bounded maintenance step a streaming
    * merge-on-read target runs on a cadence ([[graft.streaming.CdcStream
    * .startTxTable]] `foldEvery`), where a FULL [[compact]] would
    * rewrite the whole table each time. Value-neutral (reads before ≡
    * after), CAS-published at base+1 like compact. Returns the folded
    * version, or the current version when there is nothing to fold.
    */
  def foldDvs(spark: SparkSession, dir: String, maxRetries: Int = 10,
      arbiter: CommitArbiter = LocalLinkArbiter): Long = {
    var attempt = 0
    var committed = -1L
    while (committed < 0) {
      attempt += 1
      require(attempt <= maxRetries,
        s"foldDvs at $dir lost $maxRetries publish races; giving up")
      val base = latest(dir).getOrElse(
        throw new IllegalArgumentException(s"no committed version at $dir"))
      if (base.dvs.isEmpty) return base.version
      val dvFiles = base.files.filter(base.dvs.contains)
      val survivors = dvApply(spark, dir, base,
        spark.read.schema(base.schema)
          .parquet(dvFiles.map(f => s"$dir/$f"): _*))
      val statsCols = base.stats.values.flatMap(_.keys).toSeq.distinct.sorted
      val (commitRel, newFiles, newStats, newBlooms, newSizes, newRows) =
        writeData(survivors, dir, statsCols, bloomSpecOf(base))
      val dvSet = dvFiles.toSet
      if (publishAt(dir, base.version + 1, "fold", base.schema,
          base.files.filterNot(dvSet) ++ newFiles,
          (base.stats -- dvSet) ++ newStats, epochId = None,
          tmpTag = commitRel.stripPrefix("data/"), arbiter = arbiter,
          blooms = (base.blooms -- dvSet) ++ newBlooms,
          sizes = (base.sizes -- dvSet) ++ newSizes,
          rows = (base.rows -- dvSet) ++ newRows))
        committed = base.version + 1
    }
    committed
  }

  /** THRESHOLD-triggered DV fold (round-11): rewrite only the files
    * whose deleted fraction (DV positions / manifest row count) exceeds
    * `minDeletedFraction`; lightly-deleted files keep their DVs and
    * carry forward by reference. This is the auto-compaction POLICY arm
    * of [[foldDvs]]: a long-running merge-on-read table accretes DV
    * sidecars unevenly — hot files (a reloaded partition, a churned key
    * range) cross the threshold and fold, cold files (one late delete
    * in a 10 GB file) don't pay an O(file) rewrite for an O(1) DV. A
    * file without a recorded row count cannot be evaluated and folds
    * conservatively (policy must converge, and folding is always
    * value-neutral). Cost is O(crossing-file bytes); CAS-published at
    * base+1 with op "fold". Returns the committed version, or the
    * current one when no file crosses.
    */
  def foldDvsIf(spark: SparkSession, dir: String, minDeletedFraction: Double,
      maxRetries: Int = 10, arbiter: CommitArbiter = LocalLinkArbiter): Long = {
    require(minDeletedFraction >= 0.0 && minDeletedFraction < 1.0,
      s"minDeletedFraction must be in [0, 1), got $minDeletedFraction")
    var attempt = 0
    var committed = -1L
    while (committed < 0) {
      attempt += 1
      require(attempt <= maxRetries,
        s"foldDvsIf at $dir lost $maxRetries publish races; giving up")
      val base = latest(dir).getOrElse(
        throw new IllegalArgumentException(s"no committed version at $dir"))
      if (base.dvs.isEmpty) return base.version
      val dvPos = dvPositions(dir, base)
      val hot = base.files.filter { f =>
        base.dvs.contains(f) && {
          val del = dvPos.get(f).map(_.length.toLong).getOrElse(0L)
          base.rows.get(f) match {
            case Some(n) if n > 0 => del.toDouble / n > minDeletedFraction
            case _ => true // unknown denominator: fold conservatively
          }
        }
      }
      if (hot.isEmpty) return base.version
      val survivors = dvApply(spark, dir, base,
        spark.read.schema(base.schema)
          .parquet(hot.map(f => s"$dir/$f"): _*))
      val statsCols = base.stats.values.flatMap(_.keys).toSeq.distinct.sorted
      val (commitRel, newFiles, newStats, newBlooms, newSizes, newRows) =
        writeData(survivors, dir, statsCols, bloomSpecOf(base))
      val hotSet = hot.toSet
      if (publishAt(dir, base.version + 1, "fold", base.schema,
          base.files.filterNot(hotSet) ++ newFiles,
          (base.stats -- hotSet) ++ newStats, epochId = None,
          tmpTag = commitRel.stripPrefix("data/"), arbiter = arbiter,
          blooms = (base.blooms -- hotSet) ++ newBlooms,
          dvs = base.dvs -- hotSet, // cold files KEEP their DVs
          sizes = (base.sizes -- hotSet) ++ newSizes,
          rows = (base.rows -- hotSet) ++ newRows))
        committed = base.version + 1
    }
    committed
  }

  /** INCREMENTAL small-file compaction: bin-pack only the files below
    * `minBytes` into `targetFiles` rewritten files; every file already
    * at a healthy size carries forward by reference. This is the
    * maintenance form that scales — a streaming merge-on-read target
    * accretes one small upsert file per epoch, and the full [[compact]]
    * would pay an O(table) rewrite to clean up O(epochs-worth) of
    * small files. Cost here is O(small-file bytes). Small files that
    * carry deletion vectors fold them in the rewrite (their dv entries
    * retire with the files); large dv'd files keep their DVs —
    * [[foldDvs]] is the targeted cure there. Value-neutral,
    * CAS-published at base+1. Returns the committed version (the
    * current one when fewer than 2 files qualify — rewriting a single
    * small file buys nothing).
    */
  def compactSmallFiles(spark: SparkSession, dir: String, minBytes: Long,
      targetFiles: Int = 1, maxRetries: Int = 10,
      arbiter: CommitArbiter = LocalLinkArbiter): Long = {
    require(minBytes > 0 && targetFiles > 0,
      s"minBytes and targetFiles must be positive, got $minBytes/$targetFiles")
    var attempt = 0
    var committed = -1L
    while (committed < 0) {
      attempt += 1
      require(attempt <= maxRetries,
        s"compactSmallFiles at $dir lost $maxRetries publish races; giving up")
      val base = latest(dir).getOrElse(
        throw new IllegalArgumentException(s"no committed version at $dir"))
      def sizeOf(f: String): Long =
        base.sizes.getOrElse(f, Files.size(Paths.get(dir, f)))
      val small = base.files.filter(sizeOf(_) < minBytes)
      // <= targetFiles (not just < 2): packing k files into k buckets is
      // version churn, not progress — and since the packed OUTPUT may
      // itself still be under minBytes, a k→k "pack" would make repeated
      // maintenance calls commit forever (round-11 storm-spec finding:
      // that churn starved every concurrent writer's CAS window)
      if (small.size <= math.max(targetFiles, 1) || small.size < 2)
        return base.version
      val packed = dvApply(spark, dir, base,
        spark.read.schema(base.schema)
          .parquet(small.map(f => s"$dir/$f"): _*))
        .repartition(targetFiles)
      val statsCols = base.stats.values.flatMap(_.keys).toSeq.distinct.sorted
      val (commitRel, newFiles, newStats, newBlooms, newSizes, newRows) =
        writeData(packed, dir, statsCols, bloomSpecOf(base))
      val smallSet = small.toSet
      if (publishAt(dir, base.version + 1, "compact-small", base.schema,
          base.files.filterNot(smallSet) ++ newFiles,
          (base.stats -- smallSet) ++ newStats, epochId = None,
          tmpTag = commitRel.stripPrefix("data/"), arbiter = arbiter,
          blooms = (base.blooms -- smallSet) ++ newBlooms,
          dvs = base.dvs -- smallSet,
          sizes = (base.sizes -- smallSet) ++ newSizes,
          rows = (base.rows -- smallSet) ++ newRows))
        committed = base.version + 1
    }
    committed
  }

  /** Rewrite the latest snapshot into `targetFiles` files — the
    * small-files compaction every append-heavy table eventually needs.
    * Data is unchanged (one read + one overwrite commit); stats columns
    * carry over so skipping survives compaction. Returns the new version.
    *
    * `clusterBy` additionally CLUSTERS the rewrite (the OPTIMIZE ZORDER
    * tier): one column range-sorts, 2-4 columns interleave through
    * [[graft.ext.Layout.zOrderKey]] (each normalized onto a 16-bit lane —
    * locality, not reversibility). Clustered files get tight disjoint-ish min/max
    * ranges on the cluster columns, which is what turns manifest stats
    * from "never drops data" into "actually skips most files":
    * [[readPruned]] on a clustered column opens O(matching) files
    * instead of all of them. Cluster columns join the recorded stats
    * columns automatically.
    */
  def compact(spark: SparkSession, dir: String, targetFiles: Int,
      clusterBy: Seq[String] = Nil, maxRetries: Int = 10,
      arbiter: CommitArbiter = LocalLinkArbiter): Long = {
    require(targetFiles > 0, s"targetFiles must be positive, got $targetFiles")
    require(clusterBy.size <= 4,
      s"clusterBy supports at most 4 columns (16 bits per dim in a 64-bit " +
        s"Z-key; see graft.ext.Layout.zOrderKey), got ${clusterBy.size}")
    // read-modify-write: the rewrite is only equivalent to the snapshot
    // it READ, so the publish is a compare-and-swap at exactly
    // base.version + 1 (the merge() discipline) — a plain overwrite
    // commit's retry loop would re-publish against ANY newer base,
    // silently discarding a concurrent append's rows
    var attempt = 0
    var committed = -1L
    while (committed < 0) {
      attempt += 1
      require(attempt <= maxRetries,
        s"compact at $dir lost $maxRetries publish races; giving up")
      val snap = latest(dir).getOrElse(
        throw new IllegalArgumentException(s"no committed version at $dir"))
      val arranged = compactArrange(spark, dir, snap, targetFiles, clusterBy)
      val statsCols =
        (snap.stats.values.flatMap(_.keys).toSeq ++ clusterBy).distinct.sorted
      val (commitRel, newFiles, newStats, newBlooms, newSizes, newRows) =
        writeData(arranged, dir, statsCols, bloomSpecOf(snap))
      if (publishAt(dir, snap.version + 1, "overwrite", arranged.schema,
          newFiles, newStats, epochId = None,
          tmpTag = commitRel.stripPrefix("data/"), arbiter = arbiter,
          blooms = newBlooms, sizes = newSizes, rows = newRows))
        committed = snap.version + 1
      // lost race: the rewrite is stale (new rows landed); its dir is an
      // invisible orphan (vacuum retires it) — re-derive from new latest
    }
    committed
  }

  /** The compaction layout for one pinned snapshot: plain repartition,
    * range-cluster, or 2-D z-order. Factored from [[compact]] so the
    * CAS retry loop re-derives the layout from each new base.
    */
  private def compactArrange(spark: SparkSession, dir: String, snap: Snapshot,
      targetFiles: Int, clusterBy: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val data = read(spark, dir, Some(snap.version))
    clusterBy match {
      case Nil => data.repartition(targetFiles)
      case Seq(c) =>
        data.repartitionByRange(targetFiles, col(c)).sortWithinPartitions(col(c))
      case dims @ Seq(_, _, _*) =>
        // normalize each NUMERIC dimension onto the full 16-bit lane
        // from its OBSERVED bounds — a raw `pmod(col, 65536)` folds any
        // domain wider than 2^16 (k, k+65536, ... collide), silently
        // destroying the skipping the clustering exists to create.
        // STRING dimensions lane on their first two UTF-8 bytes (the
        // same order the typed manifest stats record), which clusters
        // lexicographic prefixes — locality, not reversibility, exactly
        // like the numeric lanes.
        import org.apache.spark.sql.functions.{max => fmax, min => fmin}
        val isString: Map[String, Boolean] = dims.map(c =>
          c -> snap.schema.fields.find(_.name == c)
            .exists(_.dataType == org.apache.spark.sql.types.StringType)).toMap
        // the raw lane value: numeric dims as themselves, string dims as
        // their two-byte prefix — BOTH then normalized from observed
        // bounds (a string lane's raw span is a narrow band of the
        // 16-bit space — e.g. all-lowercase keys span ~6k of 65536 with
        // constant top bits, which would let the other dims dominate
        // every interleave level)
        def rawLane(c: String): org.apache.spark.sql.Column =
          if (isString(c)) stringLane16(col(c)) else col(c).try_cast("long")
        val bd = data.agg(
          dims.flatMap(c => Seq(fmin(rawLane(c)), fmax(rawLane(c)))).head,
          dims.flatMap(c => Seq(fmin(rawLane(c)), fmax(rawLane(c)))).tail: _*)
          .collect()(0)
        def lane(c: String, lo: Int): org.apache.spark.sql.Column =
          if (bd.isNullAt(lo) || bd.getLong(lo) == bd.getLong(lo + 1)) lit(0L)
          else graft.ext.Layout.normalize16(rawLane(c), bd.getLong(lo), bd.getLong(lo + 1))
        val lanes = dims.zipWithIndex.map { case (c, i) => lane(c, 2 * i) }
        data.withColumn("__z", graft.ext.Layout.zOrderKey(lanes))
          .repartitionByRange(targetFiles, col("__z"))
          .sortWithinPartitions(col("__z"))
          .drop("__z")
    }
  }

  /** 16-bit z-order lane for a STRING column: the first two UTF-8 bytes
    * as `b0·256 + b1` (missing bytes read as 0, so shorter strings with
    * the same prefix lane together and below their extensions — the
    * UTF-8 byte order the typed stats use). Null → lane 0.
    */
  private def stringLane16(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{coalesce, conv, encode, hex, lit, rpad, substring}
    coalesce(
      conv(rpad(hex(substring(encode(c, "UTF-8"), 1, 2)), 4, "0"), 16, 10)
        .cast("long"),
      lit(0L))
  }

  /** Row-level change feed between two committed versions — the
    * Delta/Iceberg change-data-feed tier, closing the loop for a CDC
    * engine: the transactional TARGET can itself be a change SOURCE for
    * downstream replicas. One row per changed key with `change_type` in
    * insert/update/delete; insert/update rows carry the `to`-version
    * image, delete rows the `from`-version image; keys whose full row is
    * byte-identical in both versions emit nothing.
    *
    * Requires `keyCols` to be unique within each version (the invariant
    * [[merge]] maintains); under duplicate keys a row-level diff is
    * ill-defined and the keyed join would multiply.
    *
    * ==Scale shape==
    * If `from`'s file set is a subset of `to`'s (pure appends between the
    * versions), deletes are impossible and only rows in the ADDED files
    * can differ: the feed reads the manifest-diff delta — O(changed
    * data), not O(table) — and joins it against the base on keys (the
    * delta side is batch-sized; Spark/AQE picks the broadcast build).
    * Otherwise (an overwrite/merge rewrote files) the general path is one
    * full-outer key-shuffle join of the two snapshots — the unavoidable
    * lower bound when any file may have been rewritten, and still a
    * single co-partitioned shuffle, no N². Schema evolution is honored:
    * the output schema is the union (columns absent in a version read as
    * null there, and count toward the difference test).
    */
  def changeFeed(spark: SparkSession, dir: String, fromVersion: Long,
      toVersion: Long, keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, when}
    val (joined, dataCols) = feedJoin(spark, dir, fromVersion, toVersion, keyCols)
    joined.select(keyCols.map(col) ++ dataCols.map { c =>
      // delete rows carry the pre-image; insert/update the post-image
      when(col("change_type") === "delete", col(s"__o_$c"))
        .otherwise(col(s"__n_$c")).as(c)
    } :+ col("change_type"): _*)
  }

  /** [[changeFeed]] in the CDC-log image shape: one row per changed key
    * with `old_data` / `new_data` STRUCT columns (null when the side
    * does not exist — no old image on insert, no new image on delete;
    * an update carries BOTH, the retraction/assertion pair incremental
    * view maintenance needs). This is the bridge from the table format
    * to [[graft.apply.IncrementalAgg]]: a stored `groupBy` view is
    * maintained from `changeFeedImages` deltas alone — O(changes +
    * groups) per refresh, never O(table) — and the result is EXACTLY
    * (decimal arithmetic) the recompute on the target version.
    */
  def changeFeedImages(spark: SparkSession, dir: String, fromVersion: Long,
      toVersion: Long, keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, struct, when}
    val (joined, dataCols) = feedJoin(spark, dir, fromVersion, toVersion, keyCols)
    def img(prefix: String) = struct(
      keyCols.map(col) ++ dataCols.map(c => col(s"$prefix$c").as(c)): _*)
    joined.select(keyCols.map(col) ++ Seq(
      when(col("change_type") =!= "insert", img("__o_")).as("old_data"),
      when(col("change_type") =!= "delete", img("__n_")).as("new_data"),
      col("change_type")): _*)
  }

  /** Shared internals of [[changeFeed]]/[[changeFeedImages]]: the keyed
    * diff join with per-side image columns (`__o_*` / `__n_*`) and the
    * `change_type` classification, no-op rows already dropped.
    * Returns (joined frame, data column names).
    */
  private def feedJoin(spark: SparkSession, dir: String, fromVersion: Long,
      toVersion: Long, keyCols: Seq[String]): (DataFrame, Seq[String]) = {
    import org.apache.spark.sql.functions.{col, lit, when}
    require(keyCols.nonEmpty, "changeFeed needs at least one key column")
    require(fromVersion != toVersion, "changeFeed needs two distinct versions")
    val fromSnap = snapshot(dir, fromVersion)
    val toSnap = snapshot(dir, toVersion)
    // union output schema: to-version order first (the current shape),
    // then any from-only columns
    val toNames = toSnap.schema.fieldNames.toSeq
    val fromOnly = fromSnap.schema.fields.filterNot(f => toNames.contains(f.name))
    val outFields = toSnap.schema.fields ++ fromOnly
    val dataCols = outFields.map(_.name).filterNot(keyCols.contains)
    def widen(df: DataFrame, own: StructType): DataFrame =
      df.select(outFields.map { f =>
        if (own.fieldNames.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toSeq: _*)
    // pure append = every from-file survives AND the deletion-vector map
    // is unchanged: a merge-on-read merge keeps every file (its deletes
    // live in a NEW dv sidecar), so the file-subset test alone would
    // misclassify it as delete-free and the fast path would drop its
    // updates/deletes from the feed
    val appendOnly = fromSnap.files.toSet.subsetOf(toSnap.files.toSet) &&
      fromSnap.dvs == toSnap.dvs
    val newSide =
      if (appendOnly) {
        val added = toSnap.files.filterNot(fromSnap.files.toSet)
        if (added.isEmpty) {
          // no delta files -> an empty feed with the full join shape
          val empty = spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(outFields))
          val o0 = empty.select(
            keyCols.map(col) ++ dataCols.map(c => col(c).as(s"__o_$c")) ++
              dataCols.map(c => col(c).as(s"__n_$c")) :+
              lit(null).cast("string").as("change_type"): _*)
          return (o0, dataCols.toSeq)
        }
        widen(spark.read.schema(toSnap.schema)
          .parquet(added.map(f => s"$dir/$f"): _*), toSnap.schema)
      } else widen(read(spark, dir, Some(toVersion)), toSnap.schema)
    // append path: the base is consulted only for keys the delta
    // carries, so manifest stats (when recorded for the first key)
    // prune base FILES to those overlapping the delta's key range —
    // the same skipping tier [[merge]] uses for its hit scan
    val oldBase =
      if (appendOnly && fromSnap.stats.values.exists(_.contains(keyCols.head))) {
        val keep = pruneByKeyRange(fromSnap, newSide, keyCols.head)
        if (keep.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            fromSnap.schema)
        else dvApply(spark, dir, fromSnap, spark.read.schema(fromSnap.schema)
          .parquet(keep.map(f => s"$dir/$f"): _*))
      } else read(spark, dir, Some(fromVersion))
    val oldSide = widen(oldBase, fromSnap.schema)
    val o = oldSide.select(
      keyCols.map(col) ++ dataCols.map(c => col(c).as(s"__o_$c")) :+
        lit(true).as("__in_o"): _*)
    val n = newSide.select(
      keyCols.map(col) ++ dataCols.map(c => col(c).as(s"__n_$c")) :+
        lit(true).as("__in_n"): _*)
    // append-only: added rows joined against the base (no deletes);
    // general: full outer of the two snapshots
    val joined =
      if (appendOnly) n.join(o, keyCols, "left_outer")
      else o.join(n, keyCols, "full_outer")
    val differs = dataCols
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val classified = joined
      .withColumn("change_type",
        when(col("__in_o").isNull, lit("insert"))
          .when(col("__in_n").isNull, lit("delete"))
          .when(differs, lit("update"))
          .otherwise(lit(null)))
      .filter(col("change_type").isNotNull)
    (classified, dataCols.toSeq)
  }

  /** Serializable copy-on-write MERGE: apply one deduplicated CDC batch
    * (`operation` column in INSERT/UPDATE/DELETE, the
    * [[graft.apply.ChangeApplier]] op vocabulary; INSERT and UPDATE both
    * upsert the new image — `INSERT OR REPLACE`, reference:
    * cdc_system.py:327) as ONE atomic new version. Requires at most one
    * change row per key (run `ChangeApplier.dedupToLatest` first).
    *
    * ==Copy-on-write file selection (the Delta MERGE shape)==
    * Only files that can contain a touched key are rewritten:
    *  1. manifest-stats pre-prune — the touched keys' [min, max] (one
    *     1-row aggregate) intersected with each file's recorded range
    *     (driver-side, O(files)); stat-less files stay candidates,
    *  2. exact hit scan — candidates read with a KEY-ONLY projection +
    *     `input_file_name`, semi-joined to the touched keys, distinct
    *     file names collected (O(files) driver rows).
    * Hit files are rewritten minus touched keys, surviving upsert images
    * are appended, and every untouched file carries forward by REFERENCE
    * (its manifest entry and stats, zero data movement) — at 100 TB a
    * batch touching 0.1% of keys rewrites ~0.1% of files, not the table.
    *
    * ==Merge-on-read (`writeMode = "mor"`)==
    * For HIGH-CHURN targets even O(hit files) rewriting amplifies: a
    * 100-row batch scattered over 100 files rewrites 100 files under
    * CoW. MoR instead records the touched rows as per-file DELETION
    * VECTORS (parquet row positions via `_metadata.row_index`, one
    * immutable sidecar per commit under `_txlog/dv/`) and lands only the
    * upsert images as new files — write cost O(changes), the
    * Delta/Iceberg deletion-vector answer. Every read applies the DVs
    * (a broadcast anti-join on (file, position), [[dvApply]]); reads pay
    * one probe per row until [[compact]] rewrites survivors and folds
    * the DVs away, restoring the bare file-scan plan (and the maximal
    * [[TxTableProvider]] relation). Results are IDENTICAL to the CoW
    * merge — `tx_merge_mor` hash-checks that on the oracle board —
    * only the write/read cost trade moves.
    *
    * ==Serializability==
    * The read-modify-write is valid only against the base version it
    * read, so the publish is a compare-and-swap at `base + 1`
    * ([[publishAt]]); a lost race re-reads the new latest and re-derives
    * the whole merge (bounded by `maxRetries`). Losers leave only
    * invisible orphan dirs, retired by [[vacuum]].
    *
    * Returns the committed version.
    */
  def merge(spark: SparkSession, dir: String, changes: DataFrame,
      keyCols: Seq[String], opCol: String = "operation",
      maxRetries: Int = 10, epochId: Option[Long] = None,
      arbiter: CommitArbiter = LocalLinkArbiter,
      writeMode: String = "cow", streamId: Option[String] = None): Long = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min}
    require(keyCols.nonEmpty, "merge needs at least one key column")
    require(writeMode == "cow" || writeMode == "mor",
      s"writeMode must be cow or mor, got $writeMode")
    // materialize the batch once: every stage below (dup check, bounds,
    // hit scan, rewrite) and every CAS retry re-derives from it, and a
    // nondeterministic input re-evaluated per stage could pass the dup
    // check on one evaluation and disagree on the next
    val chRaw = changes.localCheckpoint(true)
    // key types must match the table's exactly, or widen losslessly
    // (byte→short→int→long). Anything else — say STRING '5.0' against a
    // LONG key — is rejected LOUDLY: under ANSI the join's implicit cast
    // throws mid-scan on malformed values, and under a lenient cast the
    // typed stats prune and the join could disagree on which rows match,
    // silently dropping DELETEs. The caller casts explicitly or not at all.
    val keySchema = latest(dir).getOrElse(throw new IllegalArgumentException(
      s"no committed version at $dir to merge into")).schema
    val widening = {
      import org.apache.spark.sql.types._
      Seq[DataType](ByteType, ShortType, IntegerType, LongType)
    }
    keyCols.foreach { k =>
      val bt = keySchema(k).dataType
      val ct = chRaw.schema(k).dataType
      require(bt == ct ||
          (widening.contains(ct) && widening.contains(bt) &&
            widening.indexOf(ct) <= widening.indexOf(bt)),
        s"merge key '$k' is $ct in the change batch but $bt in the table " +
          s"at $dir — cast the batch key explicitly")
    }
    val ch = chRaw.select(chRaw.columns.map { c =>
      if (keyCols.contains(c)) col(c).cast(keySchema(c).dataType).as(c)
      else col(c)
    }.toSeq: _*)
    val touched = ch.select(keyCols.map(col): _*).distinct()
    require(ch.select(keyCols.map(col): _*).count() == touched.count(),
      s"merge requires one change row per key (${keyCols.mkString(",")}); " +
        "run ChangeApplier.dedupToLatest first")
    var attempt = 0
    var committed = -1L
    while (committed < 0) {
      attempt += 1
      require(attempt <= maxRetries,
        s"merge at $dir lost $maxRetries publish races; giving up")
      val base = latest(dir).getOrElse(throw new IllegalArgumentException(
        s"no committed version at $dir to merge into"))
      // cast to the base schema: the manifest's schema is the table
      // contract, and a batch with (say) STRING ids must not smuggle
      // string-typed files into a LONG-keyed table — the next read
      // would fail against the declared schema
      val upserts = ch.filter(col(opCol).isin("INSERT", "UPDATE"))
        .select(base.schema.fields.map(f => col(f.name).cast(f.dataType)).toSeq: _*)
      // 1. stats pre-prune on the first key's global touched range,
      // typed at the key column's own type ([[pruneByKeyRange]])
      val candidates = pruneByKeyRange(base, touched, keyCols.head)
      val statsCols = base.stats.values.flatMap(_.keys).toSeq.distinct.sorted
      // rebuild Bloom entries for the rewritten files with the table's
      // existing geometry, so point-lookup skipping survives merge churn
      val bloomSpec = bloomSpecOf(base)
      val published =
        if (writeMode == "mor") {
          // ==Merge-on-read== write O(changes), defer the rewrite:
          // touched rows become per-file DELETION-VECTOR positions
          // (applied by every read, folded away by [[compact]]); the
          // upsert images land as ordinary new files. A 100-row batch
          // scattered over 100 multi-GB files writes ~100 rows plus a
          // sidecar — not 100 files (the CoW amplification this tier
          // exists to avoid for high-churn streaming targets).
          // already-dv-deleted rows may re-surface here; their positions
          // are already in the base dv map and dedup in the union below
          val hits: Array[(String, Long)] =
            if (candidates.isEmpty) Array.empty
            else spark.read.schema(base.schema)
              .parquet(candidates.map(f => s"$dir/$f"): _*)
              .select(keyCols.map(col) :+
                col("_metadata.file_path").as("__fp") :+
                col("_metadata.row_index").as("__pos"): _*)
              .join(touched, keyCols, "left_semi")
              .select(col("__fp"), col("__pos")).collect()
              .map { r =>
                val raw = r.getString(0)
                val f = try new java.net.URI(raw).getPath
                  catch { case _: Exception => raw }
                (f.split('/').takeRight(3).mkString("/"), r.getLong(1))
              }
          val (commitRel, newFiles, newStats, newBlooms, newSizes, newRows) =
            writeData(upserts, dir, statsCols, bloomSpec)
          // compose the FULL dv map (existing positions ∪ new hits) into
          // ONE fresh immutable sidecar — O(deletes-since-compact) text,
          // invisible until the manifest CAS references it
          val mergedDv: Map[String, Array[Long]] =
            (dvPositions(dir, base).toSeq ++
              hits.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq)
              .groupBy(_._1)
              .map { case (f, chunks) =>
                f -> chunks.flatMap(_._2).distinct.sorted.toArray
              }
          val dvs: Map[String, String] =
            if (mergedDv.isEmpty) Map.empty
            else {
              val sidecarRel = s"dv/${commitRel.stripPrefix("data/")}.dv"
              val p = logDir(dir).resolve(sidecarRel)
              Files.createDirectories(p.getParent)
              Files.writeString(p, mergedDv.toSeq.sortBy(_._1)
                .map { case (f, ps) => s"$f|${ps.mkString(",")}" }
                .mkString("", "\n", "\n"))
              mergedDv.keys.map(_ -> sidecarRel).toMap
            }
          publishAt(dir, base.version + 1, "merge", base.schema,
            base.files ++ newFiles, base.stats ++ newStats,
            epochId, tmpTag = commitRel.stripPrefix("data/"),
            arbiter = arbiter, blooms = base.blooms ++ newBlooms, dvs = dvs,
            sizes = base.sizes ++ newSizes, rows = base.rows ++ newRows,
            streamId = streamId)
        } else {
          // ==Copy-on-write== (the read-optimal default)
          // 2. exact per-file hits: key-only projection + semi join (Spark
          // picks the build side; the touched batch is the small one)
          val hitFiles: Seq[String] =
            if (candidates.isEmpty) Seq.empty
            else spark.read.schema(base.schema)
              .parquet(candidates.map(f => s"$dir/$f"): _*)
              .select(keyCols.map(col) :+ input_file_name().as("__f"): _*)
              .join(touched, keyCols, "left_semi")
              .select(col("__f")).distinct().collect()
              .map { r =>
                // absolute URI -> table-relative data/<uuid>/<part>; decode
                // percent-encoding first so the result string-matches the
                // manifest entries (a mismatched hit would carry the file
                // forward AND append its rewrite — duplicating every row)
                val raw = r.getString(0)
                val f = try new java.net.URI(raw).getPath
                  catch { case _: Exception => raw }
                f.split('/').takeRight(3).mkString("/")
              }.toSeq.sorted
          // 3. rewrite only the hit files; untouched files carry forward.
          // The rewrite read is DV-APPLIED: carrying a dv-deleted row
          // into the rewritten file would RESURRECT it (the rewritten
          // file has no dv entry).
          val rewritten =
            if (hitFiles.isEmpty) upserts
            else dvApply(spark, dir, base, spark.read.schema(base.schema)
              .parquet(hitFiles.map(f => s"$dir/$f"): _*))
              .join(touched, keyCols, "left_anti")
              .unionByName(upserts)
          val (commitRel, newFiles, newStats, newBlooms, newSizes, newRows) =
            writeData(rewritten, dir, statsCols, bloomSpec)
          val hitSet = hitFiles.toSet
          val files = base.files.filterNot(hitSet) ++ newFiles
          val stats = (base.stats -- hitSet) ++ newStats
          val blooms = (base.blooms -- hitSet) ++ newBlooms
          publishAt(dir, base.version + 1, "merge", base.schema, files, stats,
            epochId, tmpTag = commitRel.stripPrefix("data/"), arbiter = arbiter,
            blooms = blooms, dvs = base.dvs -- hitSet,
            sizes = (base.sizes -- hitSet) ++ newSizes,
            rows = (base.rows -- hitSet) ++ newRows, streamId = streamId)
        }
      if (published) committed = base.version + 1
      // lost race: the just-written commitRel dir is orphaned (invisible);
      // vacuum retires it
    }
    committed
  }

  /** Catch a replica table up to the primary's latest version by
    * replaying the change feed version-by-version through [[merge]] —
    * the pull-based replication loop a downstream cluster runs on a
    * schedule (each call is one "micro-batch"; calling it in a
    * foreachBatch/timer loop IS the streaming form).
    *
    * Exactly-once without a checkpoint store: each applied primary
    * version commits on the replica with `epochId = primaryVersion`, so
    * a crash-replayed sync finds the stamp in the replica's own log and
    * skips the version ([[commitStreaming]]'s idempotence argument,
    * applied to replication). The replica must not be written by anyone
    * else — its version log IS the applied-offset ledger.
    *
    * Scale: each step ships O(changed keys) through the feed (delta
    * files only for appends) and rewrites O(hit files) via the
    * copy-on-write merge — a quiet primary costs nothing, a busy one
    * costs its churn, never its size. Returns the number of primary
    * versions applied this call.
    */
  def syncReplica(spark: SparkSession, primaryDir: String, replicaDir: String,
      keyCols: Seq[String]): Int = {
    val primaryVs = versions(primaryDir)
    require(primaryVs.nonEmpty, s"primary at $primaryDir has no committed version")
    val applied: Set[Long] =
      versions(replicaDir).map(snapshot(replicaDir, _)).flatMap(_.epoch).toSet
    // a vacuum may run on the primary WHILE this sync iterates: any
    // version (or its diff base) listed above can vanish mid-loop. A
    // missing-file failure is then expected, not exceptional — if the
    // version itself survives, re-seed it wholesale; if it was vacuumed,
    // skip it (the primary's latest version always survives vacuum and
    // subsumes it)
    def isFileMissing(e: Throwable): Boolean =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).exists {
        case _: java.nio.file.NoSuchFileException => true
        case _: java.io.FileNotFoundException => true
        case t => t.getMessage != null && t.getMessage.contains("PATH_NOT_FOUND")
      }
    var n = 0
    def applyVersion(v: Long): Unit = {
      if (latest(replicaDir).isEmpty) {
        // bootstrap: the first unseen version seeds the replica wholesale
        val seed = read(spark, primaryDir, Some(v))
        Files.createDirectories(logDir(replicaDir))
        val (commitRel, files, stats, _, seedSizes, seedRows) =
          writeData(seed, replicaDir, keyCols)
        require(publishAt(replicaDir, 0L, "overwrite", snapshot(primaryDir, v).schema,
          files, stats, epochId = Some(v), tmpTag = commitRel.stripPrefix("data/"),
          sizes = seedSizes, rows = seedRows),
          s"replica at $replicaDir was concurrently initialized")
      } else if (!primaryVs.contains(v - 1) || {
          def shape(t: StructType) = t.fields.map(f => (f.name, f.dataType)).toSeq
          shape(snapshot(primaryDir, v).schema) !=
            shape(latest(replicaDir).get.schema)
        }) {
        // the diff base was vacuumed away on the primary, or the schema
        // evolved (merge preserves the replica's schema, so evolution
        // cannot ride the feed): full re-seed of this version's state
        // (still epoch-stamped, still idempotent)
        commit(read(spark, primaryDir, Some(v)), replicaDir, "overwrite",
          statsColumns = keyCols, epochId = Some(v))
      } else {
        import org.apache.spark.sql.functions.{col, when}
        val feed = changeFeed(spark, primaryDir, v - 1, v, keyCols)
          .withColumn("operation",
            when(col("change_type") === "delete", "DELETE")
              .when(col("change_type") === "insert", "INSERT")
              .otherwise("UPDATE"))
          .drop("change_type")
        merge(spark, replicaDir, feed, keyCols, epochId = Some(v))
      }
      n += 1
    }
    primaryVs.filterNot(applied).foreach { v =>
      try applyVersion(v)
      catch {
        case e: Throwable if isFileMissing(e) =>
          if (versions(primaryDir).contains(v)) {
            commit(read(spark, primaryDir, Some(v)), replicaDir, "overwrite",
              statsColumns = keyCols, epochId = Some(v))
            n += 1
          }
      }
    }
    n
  }

  /** The table's commit history as a DataFrame — the DESCRIBE HISTORY
    * tier: one row per retained version with its operation, file count,
    * schema width, epoch stamp (streaming/replication commits), and
    * whether the schema changed relative to the previous retained
    * version. Driver-side O(versions) manifest parses, no data read —
    * the audit surface an operator checks before time travel or vacuum.
    */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val snaps = versions(dir).map(snapshot(dir, _))
    snaps.zip(None +: snaps.map(Some(_)))
      .map { case (s0, prev) =>
        (s0.version, s0.op, s0.files.size.toLong,
          s0.schema.fields.length, s0.epoch,
          prev.exists(p => p.schema.fields.map(f => (f.name, f.dataType)).toSeq
            != s0.schema.fields.map(f => (f.name, f.dataType)).toSeq),
          // manifest-answered live row count (null when a version's
          // counts are incomplete — pre-round-10 manifests)
          manifestRowCount(dir, Some(s0.version)))
      }
      .toDF("version", "op", "n_files", "n_columns", "epoch",
        "schema_changed", "n_rows")
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
      // the committer's hidden checksum sibling dies with its file — a
      // .part-*.crc kept alive by nothing is retention litter that also
      // blocks the dir removal below
      Files.deleteIfExists(p.resolveSibling(s".${p.getFileName}.crc"))
      // drop the commit dir once only job-marker litter remains
      // (_SUCCESS + its .crc carry no data and reference nothing; a dir
      // holding ONLY those is as dead as an empty one — without this,
      // every expired commit dir survives vacuum forever as crumbs)
      val parent = p.getParent
      val it = Files.list(parent)
      val leftovers = try it.iterator().asScala.toList finally it.close()
      val ancillary = leftovers.forall { q =>
        val n = q.getFileName.toString
        n == "_SUCCESS" || n == "._SUCCESS.crc"
      }
      if (ancillary) {
        leftovers.foreach(Files.deleteIfExists(_))
        Files.deleteIfExists(parent)
      }
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
          // recursive, deepest-first: a writer that crashed mid
          // df.write.parquet leaves a nested _temporary/ subtree, which
          // a flat delete would trip over; and one undeletable orphan
          // must not abort the rest of retention
          try {
            val walk = Files.walk(d)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .iterator().asScala.foreach(Files.deleteIfExists(_))
            finally walk.close()
          } catch { case _: java.io.IOException => () }
        }
    }
    // Bloom sidecars no surviving manifest references (same grace
    // period as the data-dir sweep — a concurrent commit's sidecar is
    // written BEFORE its manifest becomes visible)
    val bloomRoot = logDir(dir).resolve("bloom")
    if (Files.isDirectory(bloomRoot)) {
      val liveSidecars = versions(dir).flatMap(v =>
        snapshot(dir, v).blooms.values.flatMap(_.values.map(_.sidecar))).toSet
      val cutoff = System.currentTimeMillis() - orphanGraceMs
      val it = Files.list(bloomRoot)
      val stale =
        try it.iterator().asScala.filter(Files.isRegularFile(_)).toList
        finally it.close()
      stale
        .filterNot(p => liveSidecars(s"bloom/${p.getFileName}"))
        .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
        .foreach(p => try Files.deleteIfExists(p)
          catch { case _: java.io.IOException => () })
    }
    // deletion-vector sidecars: same live-set + grace-window sweep (a
    // concurrent merge's sidecar is written BEFORE its manifest CAS)
    val dvRoot = logDir(dir).resolve("dv")
    if (Files.isDirectory(dvRoot)) {
      val liveDvs = versions(dir).flatMap(v =>
        snapshot(dir, v).dvs.values).toSet
      val cutoff = System.currentTimeMillis() - orphanGraceMs
      val it = Files.list(dvRoot)
      val stale =
        try it.iterator().asScala.filter(Files.isRegularFile(_)).toList
        finally it.close()
      stale
        .filterNot(p => liveDvs(s"dv/${p.getFileName}"))
        .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
        .foreach(p => try Files.deleteIfExists(p)
          catch { case _: java.io.IOException => () })
    }
  }
}

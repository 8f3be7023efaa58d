package graft.sources

import java.nio.file.{Files, Path}

/** The ONE atomicity primitive [[TxTable]]'s commit protocol needs,
  * factored out of the filesystem: publish `content` at `target` iff
  * nothing is there yet. Everything else in the protocol (invisible
  * data dirs, full-snapshot manifests, CAS retries) is storage-agnostic;
  * this seam is where local POSIX and object stores differ — exactly
  * Delta's `LogStore` abstraction.
  *
  * ==Contract==
  *  - EXACTLY ONE of any set of concurrent `putIfAbsent` calls for the
  *    same `target` returns true; the rest return false.
  *  - After any call returns true, readers of `target` see the winner's
  *    COMPLETE content (no torn manifests) — publication is the single
  *    visibility point.
  *  - A false return leaves `target` untouched (the loser's content
  *    never clobbers the winner's).
  *
  * ==Implementations==
  *  - [[LocalLinkArbiter]] (default): POSIX `link(2)` from a temp file —
  *    atomic create-if-absent on any local/NFSv4 filesystem. A rename
  *    would NOT do: POSIX rename silently replaces, so a lost race
  *    clobbers a committed version.
  *  - An object store swaps in a conditional put: S3 `If-None-Match: *`,
  *    GCS `x-goog-if-generation-match: 0`, ABFS `If-None-Match: *` — all
  *    native put-if-absent since 2024's S3 conditional-write GA. Stores
  *    without it (or multi-store deployments) use an external arbiter
  *    row per (table, version) — a DynamoDB conditional write — and
  *    then write the manifest object (the S3A-on-Delta recipe). The
  *    protocol above is unchanged in every case.
  */
trait CommitArbiter {

  /** Publish `content` at `target` iff absent; true iff THIS call won.
    * `tmpTag` uniquifies any scratch artifact so concurrent losers never
    * collide with each other either.
    */
  def putIfAbsent(target: Path, content: String, tmpTag: String): Boolean
}

/** The portable-API arbiter arm: put-if-absent through Hadoop's
  * `FileContext` — write the complete content to a temp sibling, then
  * `rename(tmp, target, Options.Rename.NONE)` (fail-if-destination-
  * exists). This is the protocol Delta's `HDFSLogStore` commits through,
  * and it proves [[TxTable]]'s seam against the API every distributed
  * filesystem and object-store connector actually implements (HDFS,
  * S3A, ABFS, GCS connectors all surface `FileContext`/`FileSystem`).
  *
  * ==Atomicity is the STORE's, not this class's==
  *  - HDFS: `rename` with `Rename.NONE` is atomic at the NameNode —
  *    exactly-one-winner holds under true concurrency, and content is
  *    complete before the rename, so readers never see a torn manifest.
  *  - Object stores with conditional PUT (S3 `If-None-Match`, GCS
  *    generation-match, ABFS etag): use their conditional write — the
  *    [[CommitArbiter]] scaladoc's native arms — rather than this class;
  *    rename on an object store is copy+delete and NOT exclusive.
  *  - The raw LOCAL filesystem validates-then-renames (a check-then-act
  *    window), so [[LocalLinkArbiter]] (link(2), truly atomic) stays the
  *    default for local deployments; this arm exists so the contract
  *    suite (`CommitArbiterSpec`) exercises the portable protocol
  *    end-to-end — winner, loser-never-clobbers, retry, full commits.
  *
  * A lost rename leaves the target untouched and cleans its own temp;
  * the temp name carries `tmpTag` so concurrent losers never collide
  * with each other either.
  */
final class HadoopFsArbiter(conf: org.apache.hadoop.conf.Configuration)
    extends CommitArbiter {
  override def putIfAbsent(target: Path, content: String,
      tmpTag: String): Boolean = {
    import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path => HPath}
    val dst = new HPath(target.toAbsolutePath.toUri)
    val fc = FileContext.getFileContext(dst.toUri, conf)
    val tmp = new HPath(dst.getParent, s".tmp-$tmpTag")
    val out = fc.create(tmp,
      java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      org.apache.hadoop.fs.Options.CreateOpts.createParent())
    // a write/close failure (disk full, transient I/O) must not orphan
    // the temp: vacuum never sweeps _txlog temps, so sweep it here
    // before rethrowing — the rename phase below has its own finally
    try {
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } catch {
      case e: Throwable =>
        try fc.delete(tmp, false)
        catch { case _: java.io.IOException => () }
        throw e
    }
    try {
      fc.rename(tmp, dst, Options.Rename.NONE)
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
          _: java.nio.file.FileAlreadyExistsException => false // lost race
      case e: java.io.IOException if fc.util.exists(dst) =>
        // some connectors signal the occupied destination as a bare
        // IOException; existence of the (immutable, winner-owned)
        // target is the loss signal
        false
    } finally {
      try fc.delete(tmp, false)
      catch { case _: java.io.IOException => () } // already renamed away
      ()
    }
  }
}

/** Local-filesystem arbiter: write a temp sibling, hard-link it to the
  * target (`link(2)` atomically fails if the target exists), delete the
  * temp. The temp lives in the target's own directory so the link never
  * crosses a filesystem boundary.
  */
object LocalLinkArbiter extends CommitArbiter {
  override def putIfAbsent(target: Path, content: String,
      tmpTag: String): Boolean = {
    val tmp = target.resolveSibling(s".tmp-$tmpTag")
    Files.writeString(tmp, content)
    try {
      Files.createLink(target, tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false // lost race
    } finally {
      Files.deleteIfExists(tmp)
      ()
    }
  }
}

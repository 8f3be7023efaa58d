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

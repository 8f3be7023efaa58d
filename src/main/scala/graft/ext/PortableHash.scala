package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-independent ("portable") hashing primitives.
  *
  * The default hash throughout the dedup/fingerprint operators is Spark's
  * `xxhash64` — codegen'd and fast, but engine-internal: no other engine
  * reproduces its values, so any query whose OUTPUT depends on hash values
  * (minhash signatures, simhash bits, rolling hashes, checksums) could not
  * be cross-checked against the DuckDB oracle. This module provides a
  * second hash family both engines compute exactly:
  *
  *  - the base string hash is the first/second 8 hex digits of `md5`,
  *    parsed as a 32-bit integer — `md5` is bit-identical everywhere;
  *  - everything built on top (universal-hash minhash family, fold
  *    chains) is integer arithmetic kept strictly below 2^62, so ANSI
  *    overflow checking never fires and DuckDB BIGINTs agree;
  *  - the per-slot minhash constants (a_i, b_i) are generated driver-side
  *    with splitmix64 and INLINED AS LITERALS into both the Spark plan and
  *    the generated oracle SQL — the two engines never need to agree on an
  *    RNG, only on the literals.
  *
  * Cost note: portable minhash is CHEAPER than the xxhash64 formulation —
  * one md5 per shingle plus `numHashes` multiply-add-mods, vs `numHashes`
  * full string hashes per shingle.
  */
object PortableHash {

  /** Modulus for all fold/universal hashes: 2^31 - 1 (Mersenne prime).
    * Keeping values < 2^31 bounds every product below 2^62 (no ANSI
    * overflow) and fits DuckDB BIGINT arithmetic exactly.
    */
  val P: Long = 2147483647L

  /** Fold multiplier (prime, ~2^20: P * FoldK + x < 2^52). */
  val FoldK: Long = 1000003L

  /** Fold seed for rolling hashes / checksums. */
  val Init: Long = 97531L

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Universal-hash constants (a_i in [1, P-1], b_i in [0, P-1]) for
    * `numHashes` minhash slots — h_i(x) = (a_i * x + b_i) mod P. Pure
    * function of the slot index; inlined as literals on both engines.
    */
  def minhashAB(numHashes: Int): IndexedSeq[(Long, Long)] =
    universalAB(numHashes, 0L)

  /** Universal-hash constants from an arbitrary seed base — distinct
    * families for callers that must not share the minhash slots (e.g.
    * the bootstrap's per-replicate draws). Same (a, b) domain and the
    * same driver-literal inlining contract as [[minhashAB]].
    */
  def universalAB(numHashes: Int, seedBase: Long): IndexedSeq[(Long, Long)] =
    (0 until numHashes).map { i =>
      (1L + Math.floorMod(splitmix64(seedBase + 2L * i), P - 1),
        Math.floorMod(splitmix64(seedBase + 2L * i + 1), P))
    }

  // ------------------------------------------------------------- Spark side

  /** 32-bit string hash: md5 hex digits [1,8] as an integer, in [0, 2^32). */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Companion 32-bit hash: md5 hex digits [9,16] — independent bits for
    * callers needing 64 (e.g. simhash votes).
    */
  def hash32Lo(s: Column): Column =
    conv(substring(md5(s), 9, 8), 16, 10).cast("long")

  /** Left fold `acc = (acc * FoldK + x) mod P` over an array of
    * non-negative longs < 2^32. Matches [[foldSql]] exactly.
    */
  def fold(xs: Column, init: Column): Column =
    aggregate(xs, init, (acc, x) => (acc * FoldK + x) % P)

  // ---------------------------------------------------- DuckDB SQL snippets

  /** SQL: 32-bit hash of a string expression (md5 digits [start, start+8)).
    * DuckDB parses '0x…' string casts natively.
    */
  def hash32Sql(strExpr: String, start: Int = 1): String =
    s"CAST('0x' || substring(md5($strExpr), $start, 8) AS BIGINT)"

  /** SQL: the same left fold as [[fold]] via `list_reduce` (empty input
    * returns the init because it is prepended, not passed separately).
    */
  def foldSql(listExpr: String, initExpr: String): String =
    s"list_reduce(list_prepend(CAST($initExpr AS BIGINT), $listExpr), " +
      s"(acc, x) -> (acc * $FoldK + x) % $P)"

  /** SQL literal `CAST([...] AS BIGINT[])` for a constant list. */
  def bigintListSql(xs: Seq[Long]): String =
    xs.mkString("CAST([", ", ", "] AS BIGINT[])")
}

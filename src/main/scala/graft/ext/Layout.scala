package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering keys.
  *
  * At 100 TB, which rows share a file decides which files a filter can
  * skip. Sorting by one column gives perfect skipping on that column and
  * none on any other; interleaving the bits of several columns into one
  * Z-value and range-partitioning on it gives each file a small hyper-RECT
  * of the key space, so parquet min/max stats prune scans on EVERY
  * interleaved dimension at once (the layout Delta's OPTIMIZE ZORDER BY
  * and friends use).
  *
  * Everything here is closed-form integer bit algebra on columns — no
  * UDFs, fully codegen'd, and expressible identically in any engine with
  * 64-bit `& | <<` (which is what makes the key oracle-checkable
  * value-for-value).
  */
object Layout {

  /** Spread the low 16 bits of a non-negative integral column to the even
    * bit positions of a 32-bit lane (Morton spreading, the classic
    * mask-doubling sequence: 4 shift-or-mask steps instead of a 16-step
    * bit loop).
    */
  def spread16(x: Column): Column = {
    val m = x.bitwiseAND(lit(0xFFFFL))
    val a = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Z-value interleaving two 16-bit dimensions: bit i of `x` goes
    * to position 2i, bit i of `y` to position 2i+1. Inputs are taken
    * modulo 2^16 — callers bucket/normalize real values into that range
    * first (rank-bucketing or fixed-width binning both work; only
    * LOCALITY matters, not reversibility of the normalization).
    */
  def zOrderKey2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Scale an integral column with known bounds onto the full 16-bit
    * lane: `(v - min) * 65535 div (max - min)`. Z-order locality is only
    * as good as the bit-significance BALANCE between dimensions — a
    * 148-value dimension interleaved raw against a 2400-value one
    * contributes nothing to the top bits, and every file split lands on
    * the wide dimension alone. Bounds come from table stats or a prior
    * scan; exact integer arithmetic, so engines agree bit-for-bit.
    */
  def normalize16(v: Column, minV: Long, maxV: Long): Column = {
    require(maxV > minV, s"degenerate range [$minV, $maxV]")
    val r = maxV - minV
    val num = (v.cast("long") - lit(minV)) * lit(65535L)
    // exact integer floor division: subtract the remainder first, so the
    // `/` (double) divides an exactly-divisible pair — exact below 2^53
    ((num - pmod(num, lit(r))) / lit(r)).cast("long")
  }

  /** Spread the low 16 bits to every THIRD bit position (stride-3
    * Morton spreading, the classic 3-D magic-mask sequence; bit i →
    * position 3i, max output bit 45).
    */
  def spread16x3(x: Column): Column = {
    val m = x.bitwiseAND(lit(0xFFFFL))
    val a = m.bitwiseOR(shiftleft(m, 16)).bitwiseAND(lit(0xFF0000FFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0xF00F00F00FL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0xC30C30C30C3L))
    c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x249249249249L))
  }

  /** Spread the low 16 bits to every FOURTH bit position (stride-4
    * mask-doubling; bit i → position 4i, max output bit 60). NOT
    * `spread16 ∘ spread16` — the inner call's 0xFFFF input mask would
    * truncate the 32-bit intermediate to its low half.
    */
  def spread16x4(x: Column): Column = {
    val m = x.bitwiseAND(lit(0xFFFFL))
    val a = m.bitwiseOR(shiftleft(m, 24)).bitwiseAND(lit(0x000000FF000000FFL))
    val b = a.bitwiseOR(shiftleft(a, 12)).bitwiseAND(lit(0x000F000F000F000FL))
    val c = b.bitwiseOR(shiftleft(b, 6)).bitwiseAND(lit(0x0303030303030303L))
    c.bitwiseOR(shiftleft(c, 3)).bitwiseAND(lit(0x1111111111111111L))
  }

  /** k-dimension Z-order key over 16-bit lanes (round-10 directive #8 —
    * the [[zOrderKey2]] generalization): bit i of dimension d lands at
    * position i·k + d, so one `repartitionByRange` on the key gives each
    * file a hyper-rectangle of the k-space and min/max skipping on EVERY
    * clustered dimension. Supports 1–4 dimensions: 16 bits per dim keeps
    * the key in a 64-bit long through k = 4, and beyond 4 each file
    * split consumes one bit from EVERY dimension per level, so per-dim
    * resolution at realistic file counts (2^10–2^14 files) degrades
    * below one distinguishable bucket — hierarchical sort or separate
    * tables is the honest answer there, not a wider interleave.
    * All closed-form mask algebra: codegen'd, engine-portable,
    * bit-for-bit reproducible.
    */
  def zOrderKey(lanes: Seq[Column]): Column = lanes match {
    case Seq(a) => a.bitwiseAND(lit(0xFFFFL))
    case Seq(a, b) => zOrderKey2(a, b)
    case Seq(a, b, c) =>
      spread16x3(a)
        .bitwiseOR(shiftleft(spread16x3(b), 1))
        .bitwiseOR(shiftleft(spread16x3(c), 2))
    case Seq(a, b, c, d) =>
      spread16x4(a)
        .bitwiseOR(shiftleft(spread16x4(b), 1))
        .bitwiseOR(shiftleft(spread16x4(c), 2))
        .bitwiseOR(shiftleft(spread16x4(d), 3))
    case other => throw new IllegalArgumentException(
      s"zOrderKey supports 1-4 dimensions, got ${other.size}")
  }

  /** The exact SQL twin of [[spread16]] (same mask-doubling sequence). */
  def spread16Sql(e: String): String = {
    val m = s"(($e) & 65535)"
    val a = s"(($m | ($m << 8)) & 16711935)"
    val b = s"(($a | ($a << 4)) & 252645135)"
    val c = s"(($b | ($b << 2)) & 858993459)"
    s"(($c | ($c << 1)) & 1431655765)"
  }

  /** The exact SQL twin of [[zOrderKey2]]. */
  def zOrderKey2Sql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"

  /** Write `df` Z-clustered on `zCol` into `numFiles` range partitions,
    * each internally sorted by the Z-value: consecutive Z-ranges →
    * contiguous hyper-rectangles → tight per-file min/max on every
    * interleaved dimension. One range shuffle (sampled boundaries), then
    * a local sort per partition — the standard layout-rewrite cost, paid
    * once per compaction cycle, repaid on every subsequent pruned scan.
    */
  /** Persist `df` as a catalog table hash-bucketed (and per-bucket
    * sorted) on `keyCol` — the co-location layout that lets EVERY future
    * equi-join or aggregation on that key run with ZERO shuffle: Spark's
    * bucketed `FileSourceScanExec` reports `HashPartitioning(key, n)` as
    * its output partitioning, so the join's distribution requirement is
    * already satisfied at scan time and no `Exchange` is planned on the
    * bucketed side(s).
    *
    * This is the storage half of the shuffle-elimination story (the
    * runtime halves being broadcast for small dims and AQE for skew): a
    * fact table written once with the join key bucketed amortizes its
    * one write-side shuffle across every downstream join — at 100 TB the
    * difference between re-shuffling the fact table per query and never
    * shuffling it again. Both sides must agree on bucket count (or be a
    * divisor under `spark.sql.bucketing.coalesceBucketsInJoin`).
    */
  def writeBucketedTable(
      df: DataFrame,
      table: String,
      keyCol: String,
      numBuckets: Int,
      path: String): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  def writeZOrdered(df: DataFrame, zCol: Column, numFiles: Int, path: String): Unit =
    df.withColumn("__z", zCol)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}

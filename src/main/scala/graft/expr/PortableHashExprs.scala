package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native kernels for the PORTABLE hash family ([[graft.ext.PortableHash]]).
  *
  * The pure-`Column` formulations (aggregate/zip_with folds in
  * [[graft.ext.Dedup]]) are oracle-equivalent by construction but
  * interpreted: every token hashes through boxed per-element lambdas —
  * for a 128-slot minhash that is numHashes × shingles boxed evaluations
  * per document. These expressions run the identical arithmetic as one
  * tight primitive-long Java loop (md5 via `MessageDigest`, which
  * matches SQL `md5()` byte-for-byte on the token's UTF-8 bytes).
  *
  * Each kernel is BIT-EXACT with its columnar twin (cross-checked in
  * `ExtOperatorsSpec`), so the DuckDB oracle SQL generated from the
  * columnar definition stays valid.
  */
private[expr] object PortableKernels {
  /** Single-sourced from [[graft.ext.PortableHash.P]] — the kernels must
    * stay bit-exact with the columnar twins built on that constant.
    */
  val P: Long = graft.ext.PortableHash.P

  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** md5 of the UTF-8 bytes, returned as (uint32 of bytes 0-3, uint32 of
    * bytes 4-7) — exactly hex digits [1,8] and [9,16] of the SQL `md5()`.
    */
  def md5Halves(utf8Bytes: Array[Byte]): (Long, Long) = {
    val md = digest.get()
    md.reset()
    val d = md.digest(utf8Bytes)
    def u32(o: Int): Long =
      ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
        ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
    (u32(0), u32(4))
  }
}

/** `array<string>` shingles → `array<long>` minhash signature under the
  * portable universal-hash family: slot i = min over shingles of
  * (a_i * (hash32(s) mod P) + b_i) mod P, sentinel P for empty input —
  * identical to `Dedup.minhashSignature(_, k, HashMode.Portable)`.
  */
case class PortableMinhash(child: Expression, ab: Seq[(Long, Long)])
    extends UnaryExpression {
  import PortableKernels.P

  private lazy val aArr: Array[Long] = ab.map(_._1).toArray
  private lazy val bArr: Array[Long] = ab.map(_._2).toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_portable_minhash"

  def kernel(arr: ArrayData): ArrayData = {
    val k = aArr.length
    val acc = Array.fill(k)(P)
    val n = arr.numElements()
    var s = 0
    while (s < n) {
      if (!arr.isNullAt(s)) {
        val (hi, _) = PortableKernels.md5Halves(arr.getUTF8String(s).getBytes)
        val x = hi % P
        var i = 0
        while (i < k) {
          val h = (aArr(i) * x + bArr(i)) % P
          if (h < acc(i)) acc(i) = h
          i += 1
        }
      }
      s += 1
    }
    new GenericArrayData(acc)
  }

  override def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pmh", this, classOf[PortableMinhash].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PortableMinhash =
    copy(child = newChild)
}

/** `array<string>` tokens → `struct<hi: long, lo: long>` portable 64-bit
  * SimHash (two non-negative 32-bit halves) — identical to
  * `Dedup.simhashPortable`: bit j of the fingerprint is the sign of the
  * tally of bit-j votes, where token votes come from the md5 halves.
  */
case class PortableSimhash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${t.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))
  override def prettyName: String = "graft_portable_simhash"

  def kernel(arr: ArrayData): InternalRow = {
    val tally = new Array[Int](64) // [0,32) ← lo bits, [32,64) ← hi bits
    val n = arr.numElements()
    var s = 0
    while (s < n) {
      if (!arr.isNullAt(s)) {
        val (hi, lo) = PortableKernels.md5Halves(arr.getUTF8String(s).getBytes)
        var j = 0
        while (j < 32) {
          tally(j) += (if (((lo >>> j) & 1L) == 1L) 1 else -1)
          tally(32 + j) += (if (((hi >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      s += 1
    }
    var fLo = 0L; var fHi = 0L
    var j = 0
    while (j < 32) {
      if (tally(j) > 0) fLo |= (1L << j)
      if (tally(32 + j) > 0) fHi |= (1L << j)
      j += 1
    }
    InternalRow(fHi, fLo)
  }

  override def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("psh", this, classOf[PortableSimhash].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PortableSimhash =
    copy(child = newChild)
}

/** `string` key → `boolean` Bloom membership under the portable family:
  * one md5 base hash, then k integer probes
  * `((x·a_i + b_i) mod P) mod m` into a 32-bits-per-word table — identical
  * to [[graft.ext.BloomFilter.mightContainColumnar]] (cross-checked in
  * tests), but the md5 runs ONCE per row in a primitive loop instead of
  * once per probe (Catalyst's predicate pushdown re-inlines a staged hash
  * column into each conjunct, so the columnar form pays k md5s/row).
  */
case class BloomProbe(
    child: Expression,
    words: Seq[Long],
    ab: Seq[(Long, Long)],
    mBits: Int)
    extends UnaryExpression {
  import PortableKernels.P

  @transient private lazy val wArr: Array[Long] = words.toArray
  @transient private lazy val aArr: Array[Long] = ab.map(_._1).toArray
  @transient private lazy val bArr: Array[Long] = ab.map(_._2).toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${t.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  def kernel(s: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    val (hi, _) = PortableKernels.md5Halves(s.getBytes)
    val x = hi % P
    var i = 0
    while (i < aArr.length) {
      val pos = ((x * aArr(i) + bArr(i)) % P % mBits).toInt
      if (((wArr(pos >>> 5) >>> (pos & 31)) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  override def nullSafeEval(a: Any): Any =
    kernel(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpr", this, classOf[BloomProbe].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

/** `string` key → `array<long>` of its d count-min cells
  * `(i·w + ((x·a_i + b_i) mod P) mod w)` — identical to the columnar
  * cell expression in [[graft.ext.Sketches.countMinTable]] but with the
  * md5 base hash computed ONCE per row instead of once per cell (the
  * explode's input array inlines the hash per element otherwise).
  */
case class CmsCells(child: Expression, ab: Seq[(Long, Long)], w: Int)
    extends UnaryExpression {
  import PortableKernels.P

  @transient private lazy val aArr: Array[Long] = ab.map(_._1).toArray
  @transient private lazy val bArr: Array[Long] = ab.map(_._2).toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cms_cells"

  def kernel(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val (hi, _) = PortableKernels.md5Halves(s.getBytes)
    val x = hi % P
    val out = new Array[Long](aArr.length)
    var i = 0
    while (i < aArr.length) {
      out(i) = i.toLong * w + (x * aArr(i) + bArr(i)) % P % w
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    kernel(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", this, classOf[CmsCells].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsCells =
    copy(child = newChild)
}

package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization kernels.
  *
  * The Column formulations in [[graft.ext.Similarity]] (aggregate over a
  * `typedLit` codebook with a nested zip_with per codeword) are
  * oracle-equivalent by construction but interpreted: encoding one
  * vector evaluates m × |codebook| × subDim boxed lambda calls (~1 ms per
  * row at m=4, |codebook|=9, dim=64). These kernels run the identical
  * arithmetic — sequential left-fold over ascending dims, strict-< argmin
  * over the id-sorted codebook — as plain Java loops. Bit-exact with the
  * columnar twins (cross-checked in `ExtOperatorsSpec`), so the oracle
  * SQL generated from the columnar definitions stays valid.
  */
private[expr] final class PqCodebook(
    val cents: Seq[(Long, Seq[Double])], val m: Int) extends Serializable {
  val dim: Int = cents.head._2.length
  require(m > 0 && dim % m == 0, s"dim $dim not divisible into $m subspaces")
  val sub: Int = dim / m
  val ids: Array[Long] = cents.map(_._1).toArray
  // the "ties to the smaller id" contract needs an id-sorted walk; the
  // public Similarity entry points sort, this is the backstop
  require(ids.length < 2 || ids.sliding(2).forall(w => w(0) < w(1)),
    "PQ codebook must be sorted by strictly ascending codeword id")
  // flattened [codeword][dim]
  val vecs: Array[Array[Double]] = cents.map(_._2.toArray).toArray
  val idToIdx: java.util.HashMap[Long, Integer] = {
    val mp = new java.util.HashMap[Long, Integer]()
    ids.zipWithIndex.foreach { case (id, i) => mp.put(id, i) }
    mp
  }
}

/** `array<T numeric>` vector → `array<struct<code: long, dist2: double>>`
  * of length m: per subspace, the squared-L2-nearest codeword (ties to
  * the smaller id) and its distance. Returns NULL for vectors shorter
  * than the codebook dim (the columnar twin nulls such rows out
  * downstream; uniform-dim input is the operator contract).
  */
case class PqEncode(child: Expression, cents: Seq[(Long, Seq[Double])], m: Int)
    extends UnaryExpression {

  @transient private lazy val cb = new PqCodebook(cents, m)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("code", LongType, nullable = false),
      StructField("dist2", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  def kernel(arr: ArrayData): GenericArrayData = {
    if (arr.numElements() < cb.dim) return null
    // null elements would read as 0.0 from toDoubleArray (or NPE on generic
    // arrays); null the row out, matching the columnar twin's propagation
    var ne = 0
    while (ne < arr.numElements()) {
      if (arr.isNullAt(ne)) return null
      ne += 1
    }
    val v = arr.toDoubleArray()
    val out = new Array[Any](cb.m)
    var i = 0
    while (i < cb.m) {
      val off = i * cb.sub
      var bestD = Double.MaxValue
      var bestC = Long.MaxValue
      var c = 0
      while (c < cb.vecs.length) {
        val cw = cb.vecs(c)
        // sequential left fold over ascending dims — the exact order the
        // oracle's list_reduce reproduces
        var d2 = 0.0
        var k = 0
        while (k < cb.sub) {
          val d = v(off + k) - cw(off + k)
          d2 += d * d
          k += 1
        }
        if (d2 < bestD) { bestD = d2; bestC = cb.ids(c) }
        c += 1
      }
      out(i) = InternalRow(bestC, bestD)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqe", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.kernel($c);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** ADC score: `(codes: array<long>, dtab: array<array<double>>)` →
  * double. `dtab` is the query's per-subspace distance table ORDERED BY
  * CODEBOOK POSITION (not id); the kernel maps each code id to its
  * position and sums `dtab[i][pos(codes[i])]` in ascending-subspace
  * order. NULL on an unknown code id or null inputs.
  */
case class PqAdcScore(
    left: Expression, right: Expression, cents: Seq[(Long, Seq[Double])], m: Int)
    extends BinaryExpression {

  @transient private lazy val cb = new PqCodebook(cents, m)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, array<array<double>>), got " +
            s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc_score"

  def kernel(codesData: ArrayData, dtabData: ArrayData): Any = {
    if (codesData.numElements() < cb.m || dtabData.numElements() < cb.m) return null
    var sum = 0.0
    var i = 0
    while (i < cb.m) {
      val idx = cb.idToIdx.get(codesData.getLong(i))
      if (idx == null) return null
      sum += dtabData.getArray(i).getDouble(idx)
      i += 1
    }
    sum
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adc", this, classOf[PqAdcScore].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("adcRes")
      s"""
      |Object $r = $ref.kernel($a, $b);
      |if ($r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ((Double) $r).doubleValue(); }
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native covariance-moment kernel.
  *
  * [[graft.ext.Similarity.covariance]]'s Column formulation emitted the
  * dim·(dim+1)/2 upper-triangle products via a nested
  * `transform(sequence, transform(sequence, struct(...)))` — 2,080
  * boxed struct allocations through interpreted lambdas per row at
  * dim 64, the exact HOF trade its scaladoc named as the upgrade path
  * (the `corpus_bigrams` lesson). This kernel runs the identical IEEE
  * multiplies as one primitive loop into an UnsafeArrayData of doubles;
  * position p enumerates the triangle row-major (i ascending, j from i),
  * and the 2,080-cell position→(i, j) mapping joins back AFTER the
  * aggregate, on the O(dim²) frame. Bit-exact with the HOF twin (same
  * products, same per-cell decimal sums downstream), so the DuckDB
  * oracle is unchanged.
  */
case class UpperTriProducts(child: Expression, dim: Int) extends UnaryExpression {
  require(dim > 0, s"dim must be positive, got $dim")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_upper_tri_products"

  def kernel(arr: ArrayData): UnsafeArrayData = {
    // wrong-length or null-element vectors null out, matching the
    // operator's up-front clean filter (belt and braces — a partial row
    // would silently bias every cell it touches)
    if (arr.numElements() != dim) return null
    var ne = 0
    while (ne < dim) {
      if (arr.isNullAt(ne)) return null
      ne += 1
    }
    val v = arr.toDoubleArray()
    val out = new Array[Double](dim * (dim + 1) / 2)
    var p = 0
    var i = 0
    while (i < dim) {
      val xi = v(i)
      var j = i
      while (j < dim) {
        out(p) = xi * v(j)
        p += 1
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("utp", this, classOf[UpperTriProducts].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.kernel($c);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): UpperTriProducts =
    copy(child = newChild)
}

package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** [[SortedIntersectCount]] with a Jaccard-threshold early exit: walks the
  * same two-pointer merge over SORTED, DISTINCT `array<bigint>` inputs,
  * but bails out as soon as even a perfect tail (every remaining element
  * of the shorter side matching) could not lift the pair's Jaccard to
  * `minJaccard` − 1e-6. On a bail the returned count is an UNDERCOUNT —
  * safe exactly because the caller filters `jaccard >= minJaccard`
  * (6-dp-rounded): the bail condition proves the true Jaccard is below
  * `minJaccard − 1e-6 < minJaccard − 5e-7`, i.e. below the rounded
  * filter's acceptance band, so the pair is dropped whether or not the
  * count is exact, and every SURVIVING pair's count (and hence its output
  * `jac`) is exact. The margin is deliberately conservative: a missed
  * bail costs a few extra loop steps, never correctness.
  *
  * Why it pays: candidate generation (blocking / LSH bands) is tuned for
  * recall, so most candidate pairs are BELOW the threshold; for a
  * disjoint pair the full walk costs |A|+|B| steps while the bail fires
  * after roughly (|A|+|B|)·t/(1+t) of the shorter side — a ~3× step cut
  * at t = 0.2 and better at higher thresholds.
  *
  * `minJaccard` must be a foldable non-negative double (enforced at
  * type-check); same sortedness contract as [[SortedIntersectCount]].
  */
case class SortedIntersectCountBounded(
    left: Expression,
    right: Expression,
    minJaccard: Expression)
    extends TernaryExpression {

  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = minJaccard

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def arr(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (!(arr(left) && arr(right)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else if (minJaccard.dataType != DoubleType || !minJaccard.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName threshold must be a foldable double")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable || minJaccard.nullable
  override def prettyName: String = "graft_sorted_intersect_count_bounded"

  override def nullSafeEval(a: Any, b: Any, t: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    // Bail when even a perfect tail can't reach tt: with c* = c + rem the
    // best possible count, jac* >= tt ⟺ c*(1+tt) >= tt(nx+ny). The 1e-6
    // slack keeps double rounding (~1e-10 here) strictly conservative —
    // a missed bail is extra steps, never a wrong drop.
    val tt = t.asInstanceOf[Double] - 1e-6
    val rhs = tt * (nx + ny) - 1e-6
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny &&
        (c + math.min(nx - i, ny - j)) * (1.0 + tt) >= rhs) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, t) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val tt = ctx.freshName("tt")
      val rhs = ctx.freshName("rhs"); val rem = ctx.freshName("rem")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |final double $tt = $t - 1e-6;
         |final double $rhs = $tt * ($nx + $ny) - 1e-6;
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  final int $rem = ($nx - $i < $ny - $j) ? ($nx - $i) : ($ny - $j);
         |  if (($c + $rem) * (1.0 + $tt) < $rhs) break;
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SortedIntersectCountBounded =
    copy(left = newFirst, right = newSecond, minJaccard = newThird)
}

package graft.expr

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native codegen'd cosine similarity over two `array<double>` columns.
  *
  * The pure-`Column` formulation (`aggregate(zip_with(...))` in
  * [[graft.ext.Similarity]]) is correct but interpreted: higher-order
  * functions sit outside whole-stage codegen, which matters in the ANN
  * hot path where cosine runs per (query, candidate) pair. This
  * expression emits a single fused Java loop (one pass computing dot and
  * both norms) and participates in whole-stage codegen.
  *
  * Semantics are BIT-EXACT with the Column formulation FOR EQUAL-LENGTH
  * inputs (the only case the oracle queries exercise — embeddings are
  * uniform-dim): sequential left-to-right accumulation of dot/na/nb,
  * `sqrt(na)*sqrt(nb)` (not `sqrt(na*nb)`), `0.0` for zero-norm inputs,
  * NULL for null elements. Deliberate divergence on RAGGED input: this
  * expression returns NULL for any length mismatch, while the columnar
  * form's zero-norm short-circuit can return 0.0 when the zero-norm side
  * is also the shorter one — NULL is the honest answer for a malformed
  * pair, so the native semantics win and the columnar form is retained
  * only as the equal-length cross-check reference.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $bad = false;
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    final double $xv = $a.getDouble($i);
         |    final double $yv = $b.getDouble($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    final double $d = Math.sqrt($na) * Math.sqrt($nb);
         |    ${ev.value} = ($d == 0.0) ? 0.0 : $dot / $d;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering the engine's SQL function surface —
  * enable with `spark.sql.extensions=graft.expr.GraftExtensions` (or
  * `SparkSession.builder.withExtensions`), then e.g.
  * `SELECT graft_cosine(a, b)`, `graft_jaccard`, `graft_fingerprint`,
  * `graft_token_count`, `graft_quality`, `graft_lang_id`,
  * `graft_simhash`, `graft_rolling_hash` work from plain SQL. Besides the
  * native [[CosineSim]], functions are composed from the engine's Column
  * algebra, so SQL and DataFrame callers share one implementation.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  private def fromColumns(name: String)(f: Seq[Column] => Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (children: Seq[Expression]) =>
        GraftSqlBridge.expression(f(children.map(GraftSqlBridge.column))))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSim(
        Cast(children.head, ArrayType(DoubleType)),
        Cast(children(1), ArrayType(DoubleType)))))
    ext.injectFunction(fromColumns("graft_jaccard")(cs =>
      // general form: SQL callers give no distinctness guarantee
      graft.ext.Dedup.jaccardGeneral(cs.head, cs(1))))
    ext.injectFunction(fromColumns("graft_fingerprint")(cs =>
      graft.ext.TextAnalysis.fingerprint(cs.head)))
    ext.injectFunction(fromColumns("graft_token_count")(cs =>
      graft.ext.TextAnalysis.tokenCount(cs.head)))
    ext.injectFunction(fromColumns("graft_quality")(cs =>
      graft.ext.TextAnalysis.qualityScore(cs.head)))
    ext.injectFunction(fromColumns("graft_lang_id")(cs =>
      graft.ext.TextAnalysis.langId(cs.head)))
    ext.injectFunction(fromColumns("graft_simhash")(cs =>
      graft.ext.Dedup.simhash(cs.head)))
    ext.injectFunction(fromColumns("graft_rolling_hash")(cs =>
      graft.ext.TextAnalysis.rollingHash(cs.head)))
    // Portable (engine-independent, md5-derived) variants — same values
    // any engine computes from the documented closed forms.
    ext.injectFunction(fromColumns("graft_portable_rolling_hash")(cs =>
      graft.ext.TextAnalysis.rollingHash(cs.head, graft.ext.HashMode.Portable)))
    ext.injectFunction(fromColumns("graft_hash32")(cs =>
      graft.ext.PortableHash.hash32(cs.head)))
    // deterministic permille split: graft_sample_bucket(id, salt) in [0,1000)
    ext.injectFunction(fromColumns("graft_sample_bucket")(cs =>
      graft.ext.PortableHash.hash32(
        org.apache.spark.sql.functions.concat(cs(1), cs.head.cast("string"))) % 1000))
    // DataFrame-returning operator families as table-valued functions —
    // `SELECT * FROM graft_dedup_minhash('docs', 'text', 'doc_id', 0.5)`;
    // see [[GraftTableFunctions]] for the full surface + naming scheme.
    GraftTableFunctions.register(ext)
    // INSERT INTO/OVERWRITE <txtable catalog table> → the transactional
    // commit. POST-HOC (custom post-hoc rules run after the built-ins):
    // the built-in conversion plans a raw directory write that loses
    // inserted rows outside the manifest and DESTROYS the version log on
    // overwrite; see [[graft.sources.TxTableInsertRule]].
    ext.injectPostHocResolutionRule(s => graft.sources.TxTableInsertRule(s))
    // deletion-vector read expansion: marked txtable relations become
    // (clean pruned scan ⟕̸ broadcast DV anti-join); see
    // [[graft.sources.TxDvScanRule]].
    ext.injectPostHocResolutionRule(s => graft.sources.TxDvScanRule(s))
  }
}

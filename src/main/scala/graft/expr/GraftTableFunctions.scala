package graft.expr

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.Decimal

/** DataFrame-returning SQL entry points for the operator families —
  * table-valued functions registered by [[GraftExtensions]], so a SQL
  * console reaches the dedup / ANN / retrieval / curation / sketch /
  * BPE / embedding tiers without Scala:
  *
  * {{{
  * SELECT * FROM graft_dedup_minhash('docs', 'text', 'doc_id', 0.5)
  * SELECT * FROM graft_ann_topk('embeddings', 'queries', 'vec_id', 'embedding', 10)
  * SELECT * FROM graft_text_bm25('docs', 'doc_id', 'text', 'dup,spark,key', 20)
  * }}}
  *
  * Naming scheme: `graft_<family>_<operator>` (`graft_ann_topk`,
  * `graft_dedup_exact`, `graft_corpus_source_cap`, …). Arguments are
  * FOLDABLE SQL literals: table/view names and column names as strings
  * (resolved through the session catalog at call time, so temp views
  * work), numeric knobs as int/double literals. Every TVF delegates to
  * the SAME DataFrame operator the Scala API exposes — one
  * implementation, two surfaces — so plans, scale shapes, and results
  * are identical to the Scala calls the oracle already checks.
  */
object GraftTableFunctions {

  /** name → (argument usage string, builder). */
  private val registry: Map[String, (String, (SparkSession, Seq[Any]) => DataFrame)] = Map(
    "graft_dedup_exact" -> (("(table, textCol, idCol)",
      (s: SparkSession, a: Seq[Any]) =>
        graft.ext.Dedup.exactDedup(s.table(str(a(0))), str(a(1)), str(a(2))))),
    "graft_dedup_minhash" -> (("(table, textCol, idCol, threshold)",
      (s: SparkSession, a: Seq[Any]) =>
        graft.ext.Dedup.minhashLshDedup(s.table(str(a(0))), str(a(1)), str(a(2)),
          threshold = dbl(a(3)), mode = graft.ext.HashMode.Portable))),
    "graft_ann_topk" -> (("(corpusTable, queryTable, idCol, vecCol, k)",
      (s: SparkSession, a: Seq[Any]) =>
        graft.ext.Similarity.bruteForceTopK(s.table(str(a(0))), s.table(str(a(1))),
          str(a(2)), str(a(3)), str(a(2)), str(a(3)), k = int(a(4))))),
    "graft_text_bm25" -> (("(table, idCol, textCol, termsCsv, k)",
      (s: SparkSession, a: Seq[Any]) => {
        val postings = graft.ext.Search.invertedPostings(
          s.table(str(a(0))), str(a(1)), str(a(2)))
        graft.ext.Search.bm25TopK(postings, graft.ext.Search.docStats(postings),
          str(a(3)).split(",").map(_.trim).toSeq, k = int(a(4)))
      })),
    "graft_corpus_source_cap" -> (("(table, idCol, sourceCol, cap, salt)",
      (s: SparkSession, a: Seq[Any]) =>
        graft.ext.Corpus.sourceCap(s.table(str(a(0))), str(a(1)), str(a(2)),
          cap = int(a(3)), salt = str(a(4))))),
    "graft_corpus_temperature" -> (("(table, sourceCol, alpha)",
      (s: SparkSession, a: Seq[Any]) =>
        graft.ext.Corpus.temperatureWeights(s.table(str(a(0))), str(a(1)),
          alpha = dbl(a(2))))),
    "graft_sketch_hll" -> (("(table, keyCol, b)",
      (s: SparkSession, a: Seq[Any]) =>
        graft.ext.Sketches.hllDistinct(s.table(str(a(0))), Seq.empty,
          col(str(a(1))).cast("string"), b = int(a(2))))),
    "graft_bpe_train" -> (("(table, textCol, numMerges)",
      (s: SparkSession, a: Seq[Any]) => {
        import s.implicits._
        graft.ext.Bpe.trainInMemory(s.table(str(a(0))), str(a(1)), int(a(2)))
          .merges.toDF("merge_rank", "merge_left", "merge_right", "pair_freq")
      })),
    "graft_emb_dim_stats" -> (("(table, vecCol)",
      (s: SparkSession, a: Seq[Any]) =>
        graft.ext.Similarity.dimStats(s.table(str(a(0))), str(a(1))))),
    "graft_tx_read" -> (("(tableDir [, version])",
      (s: SparkSession, a: Seq[Any]) =>
        graft.sources.TxTable.read(s, str(a(0)),
          if (a.length > 1) Some(int(a(1)).toLong) else None))),
    "graft_tx_versions" -> (("(tableDir)",
      (s: SparkSession, a: Seq[Any]) => {
        import s.implicits._
        graft.sources.TxTable.versions(str(a(0))).toDF("version")
      })),
    "graft_tx_change_feed" -> (("(tableDir, fromVersion, toVersion, keyColsCsv)",
      (s: SparkSession, a: Seq[Any]) =>
        graft.sources.TxTable.changeFeed(s, str(a(0)), int(a(1)).toLong,
          int(a(2)).toLong, str(a(3)).split(",").map(_.trim).toSeq))),
    "graft_emb_hard_negatives" -> (("(corpusTable, queryTable, idCol, vecCol, k, lo, hi)",
      (s: SparkSession, a: Seq[Any]) =>
        graft.ext.Similarity.hardNegatives(s.table(str(a(0))), s.table(str(a(1))),
          str(a(2)), str(a(3)), k = int(a(4)), lo = dbl(a(5)), hi = dbl(a(6))))),
    "graft_dedup_canonical" -> (("(pairsTable, docsTable, idCol, textCol)",
      (s: SparkSession, a: Seq[Any]) =>
        graft.ext.Corpus.dedupCanonical(s.table(str(a(0))), s.table(str(a(1))),
          str(a(2)), str(a(3))))),
    "graft_tx_history" -> (("(tableDir)",
      (s: SparkSession, a: Seq[Any]) =>
        graft.sources.TxTable.history(s, str(a(0))))),
    "graft_corpus_contamination" -> ((
      "(docsTable, embTable, idCol, textCol, vecIdCol, vecCol)",
      (s: SparkSession, a: Seq[Any]) =>
        graft.ext.Corpus.contaminationReport(s.table(str(a(0))), s.table(str(a(1))),
          str(a(2)), str(a(3)), str(a(4)), str(a(5))))))

  /** The registered TVF names (for docs/tests). */
  def names: Seq[String] = registry.keys.toSeq.sorted

  private def str(a: Any): String = {
    require(a != null, "string argument must not be NULL")
    a.toString // UTF8String.toString
  }

  private def int(a: Any): Int = a match {
    case i: Int => i
    case l: Long => math.toIntExact(l)
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case other => throw new IllegalArgumentException(
      s"expected an integer literal, got $other")
  }

  private def dbl(a: Any): Double = a match {
    case d: Double => d
    case f: Float => f.toDouble
    case dec: Decimal => dec.toDouble // SQL `0.5` parses as DECIMAL(1,1)
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case other => throw new IllegalArgumentException(
      s"expected a numeric literal, got $other")
  }

  private[expr] def register(ext: SparkSessionExtensions): Unit =
    registry.foreach { case (name, (usage, build)) =>
      ext.injectTableFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(GraftTableFunctions.getClass.getName, name),
        (children: Seq[Expression]) => plan(name, usage, build, children)))
    }

  private def plan(
      name: String,
      usage: String,
      build: (SparkSession, Seq[Any]) => DataFrame,
      children: Seq[Expression]): LogicalPlan = {
    require(children.forall(_.foldable),
      s"$name arguments must be literals; usage: $name$usage")
    val args = children.map(_.eval())
    val spark = SparkSession.active
    try build(spark, args).queryExecution.logical
    catch {
      case e: IndexOutOfBoundsException =>
        throw new IllegalArgumentException(
          s"$name: wrong argument count; usage: $name$usage", e)
    }
  }
}

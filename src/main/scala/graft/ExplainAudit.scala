package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for selected queries so plan
  * regressions (lost filter pushdown, surprise single-partition exchanges,
  * missed broadcasts) are reviewable per round.
  *
  * Usage: `sbt "runMain graft.ExplainAudit [sfDir] [q1,q2,...]"`.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq(
      "lineitem_agg", "top_revenue_join", "cdc_apply_changes",
      "cdc_pending_scan", "ann_brute_force", "ann_ivf_assign",
      "emb_near_dup", "corpus_sample", "corpus_pack",
      "corpus_decontaminate", "corpus_mix", "corpus_tfidf",
      "text_repetition", "text_pii_redact", "emb_quantize", "emb_pq_assign",
      "ann_pq_topk", "corpus_shuffle",
      "dedup_incremental", "ann_ivfpq_topk", "lineitem_bloom_semi",
      "sketch_quantiles", "sketch_heavy_hitters", "corpus_budget_mix",
      "supplier_salted_revenue", "orders_profile", "events_asof_within",
      "corpus_curate", "text_containment", "emb_semantic_dedup",
      "text_lm_score", "events_top_paths", "events_funnel_window",
      "orders_grouping_sets", "orders_outliers", "cdc_key_churn"))
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

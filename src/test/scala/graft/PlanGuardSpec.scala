package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Plan guard over the ENTIRE registered query surface: no query may
  * plan a cartesian product, and broadcast-nested-loop joins are allowed
  * only where they are the deliberate design (a small broadcast query
  * set swept against a corpus). A new operator that accidentally loses
  * its equi-join condition fails here, not in a 100 TB run.
  */
class PlanGuardSpec extends SparkSpecBase {

  /** Queries whose plan INTENTIONALLY contains a broadcast-nested-loop:
    * brute-force / ADC scoring sweeps a broadcast query set against the
    * corpus by design (shuffle is bounded by the partial top-k, not the
    * join).
    */
  private val nestedLoopAllowed = Set(
    "ann_brute_force", "ann_pq_topk", "ann_lsh",
    // data-space serving: queries × broadcast(codebook) is an
    // intentional bounded cross product (every query scores every
    // centroid — the same q×k work the literal path does via typedLit
    // explode, moved from plan nodes to rows); broadcast side is the
    // codebook, never corpus-sized
    "ann_ivfpq_topk_ds",
    // broadcast eval-set sweep — the "queries are small" brute-force
    // argument applied to decontamination
    "emb_decontaminate",
    // inherits the same sweep as its semantic tier
    "corpus_contamination_report",
    // broadcast query-set sweep, band-filtered (hard-negative mining)
    "emb_hard_negatives",
    // 1-row × 1-row sketch-combine frames
    "sketch_set_ops",
    // recall joins the brute-force ground truth, inheriting its sweep
    "ann_recall",
    // hybrid fusion's vector run IS the brute-force sweep (1-row query
    // vector broadcast against the corpus); the fusion itself is k×k
    "text_hybrid_search",
    // the IVF+PQ hybrid twin and its recall row inherit the lexical
    // side's 1-row corpus-stats (n_docs, avgdl) broadcast; their vector
    // run is the partition-pruned index probe, not a sweep
    "text_hybrid_ivfpq", "text_hybrid_recall",
    // 1-row corpus-stats frame (n_docs, avgdl) broadcast onto postings
    "text_bm25",
    // 1-row vocabulary-size scalar broadcast onto the (label, token) table
    "text_nb_train",
    // the |labels|-row class table swept against every token by design
    // (score(d, c) needs every (token, label) pair); broadcast side is
    // bounded by the label alphabet, never data volume
    "text_nb_score",
    // 1-row (min, max, total) frame broadcast onto the binning scan
    "lineitem_histogram",
    // 1-row quantile/scalar frames broadcast together; all inputs are
    // the multiplicity histogram, never the key frame
    "lineitem_key_skew",
    // 1-row (min, max) score-bounds frame broadcast onto the scored docs
    "corpus_quality_sample",
    // exhaustive ground truth over the hash sample is a deliberate
    // sample²-bounded sweep (the ann_brute_force argument for dedup)
    "dedup_lsh_recall",
    // 1-row global-max-date frame broadcast onto the per-customer frame
    "customer_rfm",
    // 1-row bigram-total scalar broadcast onto the vocabulary-sized frame
    "corpus_pmi",
    // 1-row n_checked scalar broadcast onto the |rules|-row report
    "orders_expectations",
    // 1-row max-pane scalar broadcast onto the pane-register frame
    "events_sliding_hll",
    // 1-row basket-total scalar broadcast onto the |items|²-bounded pairs
    "orders_basket_lift",
    // 1-row token-total scalar broadcast onto the ≤|cutoffs|-row curve
    "text_vocab_coverage",
    // 1-row corpus-total and 1-row normalizer broadcast onto the
    // |sources|-row weight frame
    "corpus_mix_temperature",
    // 1-row clean-vector-count scalar broadcast onto the O(dim²) cells
    "emb_covariance",
    // 1-row total/k frame + 1-row realized-sum broadcast onto the
    // |sources|-row plan table
    "corpus_epoch_plan",
    // 1-row positive-balance-average frame broadcast onto the customer
    // scan (the Q22 scalar-subquery shape)
    "customer_idle_balance",
    // |cutoffs|-row literal dims frame swept against the corpus by
    // design (one scan serves every truncation cutoff)
    "emb_energy_curve",
    // 1-row degree-census × 1-row triangle-count combine
    "part_triangles",
    // 1-row observed-range bounds broadcast onto the distinct-score
    // histogram
    "text_langid_calibration",
    // |thresholds|-row literal frame + 1-row positives-total broadcast
    // onto the distinct-score histogram
    "text_langid_pr",
    // 1-row corpus-token-total broadcast onto the (source, token) frame
    "corpus_source_divergence",
    // 1-row degree-census × 1-row triangle-count combine (near-dup graph)
    "dedup_graph_stats",
    // 1-row hot-key-count scalar broadcast for the theoretical-FPR term
    "sketch_bloom_fpr",
    // 1-row revenue-total broadcast onto the |suppliers|-row curve
    "supplier_pareto",
    // 1-row population-totals broadcast onto the distinct-score histogram
    "corpus_split_ks",
    // 1-row grand-total broadcast onto the |langs|×|sources| grid
    "corpus_lang_source_chi2",
    // 1-row sketch frames + 1-row exact-count combine
    "sketch_join_estimate",
    // |types|-row literal frame swept over the bounded day grid
    "events_type_correlation",
    // |months|² pair frame (pure-inequality theta join on the bounded
    // monthly rollup) + 1-row median-slope broadcast
    "orders_theilsen_trend",
    // 1-row day-axis totals broadcast onto the bounded daily frame
    "orders_cusum",
    // 1-row grand-total broadcast onto the 9-row digit histogram
    "orders_benford",
    // 12-row literal weight frame swept over the bounded monthly rollup
    "orders_ewma",
    // 1-row vocabulary-size scalar broadcast onto the bigram lookup
    "text_bigram_lm",
    // 1-row eigenvalue x 1-row trace combine
    "emb_pca_variance",
    // 10-row checkpoint grid swept over docs and the vocab frame by
    // design (one aggregate serves the whole growth curve)
    "text_heaps_law",
    // 1-row median broadcast onto the bounded daily frame
    "orders_runs_test",
    // 1-row full-sample-mean broadcast onto the 32-replicate CI row
    "orders_bootstrap_ci",
    // 1-row observed-diff broadcast onto the 32-replicate null frame
    "events_permutation_test",
    // TwoNN rides the brute-force sweep (broadcast query sample vs corpus)
    "emb_intrinsic_dim",
    // |months|² pair frame + 1-row tie-stats broadcast (the theilsen twin)
    "orders_mann_kendall",
    // 1-row token-totals broadcast onto the union-vocabulary frame
    "corpus_js_divergence")

  /** Queries whose plan INTENTIONALLY contains a GLOBAL (unpartitioned)
    * window: every one runs over a frame already collapsed to a bounded
    * size — a score histogram, a monthly/daily rollup, a per-entity
    * aggregate with a documented percentile_approx swap-in — never the
    * raw fact table. A new query that accidentally global-sorts an
    * unbounded frame fails here, not as a one-task straggler at 100 TB.
    */
  private val globalWindowAllowed = Set(
    // distinct-score histograms (ROC/AUC, MWU, KS, calibration families)
    "corpus_quality_mw", "corpus_split_ks", "text_langid_auc",
    // corpus_spearman moved OFF this list in round 11: its histogram
    // cumulative is now the bucketed two-phase pattern (no global window)
    // per-entity RFM quintiles: the global ntile windows run ONLY under
    // the 500 k-entity threshold (bounded by construction); beyond it
    // the distributed exact-ntile path engages — spec-pinned
    // bit-identical (range partition + per-pid row_number + offsets),
    // so no unbounded frame ever crosses a single-task window
    "customer_rfm",
    // Lorenz curve over the per-user aggregate (bounded by users; the
    // gini read is the curve, not the facts)
    "events_gini",
    // Kaplan-Meier steps over the bounded duration-histogram frame
    "events_survival",
    // bounded monthly/daily rollups (time axes, not fact rows)
    "orders_cusum", "orders_monthly_growth", "orders_runs_test",
    "orders_seasonal_decompose",
    // revenue-ranked suppliers (bounded by the supplier dimension)
    "supplier_pareto",
    // 10-row growth-curve checkpoints / vocab-rank frames
    "text_heaps_law", "text_zipf_slope",
    // rank-based medians over the bounded |months|^2 slope frame and the
    // |months| residual frame (the cross-engine-exact percentile swap)
    "orders_theilsen_trend")

  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(walk)
  }

  test("no registered query plans a cartesian product or stray nested-loop join") {
    val dir = "/root/testdata/sf0.001"
    val bad = scala.collection.mutable.Buffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = walk(fn(spark, dir).queryExecution.executedPlan)
      if (plan.exists(_.isInstanceOf[CartesianProductExec]))
        bad += s"$name: CartesianProduct"
      if (!nestedLoopAllowed(name) &&
          plan.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
        bad += s"$name: BroadcastNestedLoopJoin"
      if (!globalWindowAllowed(name) && plan.exists {
          case w: org.apache.spark.sql.execution.window.WindowExec =>
            w.partitionSpec.isEmpty
          case _ => false
        })
        bad += s"$name: global (unpartitioned) window"
    }
    assert(bad.isEmpty, s"plan guard violations:\n${bad.mkString("\n")}")
  }
}

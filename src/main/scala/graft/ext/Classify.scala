package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed multinomial Naive Bayes over a labeled document corpus —
  * the "model-based quality/domain filter" tier of a training-data
  * pipeline (the role a fastText classifier plays in public LLM data
  * recipes): train per-class token log-probabilities with plain
  * aggregations, then score and argmax every document, all as
  * declarative dataflow with no driver-side model object.
  *
  * reference: cdc_system.py has no model tier; this extends the corpus
  * analysis family (TextAnalysis) the way a real curation pipeline needs.
  *
  * Scale shape: training is one corpus scan + aggregations whose keys are
  * (label, token) — bounded by labels × vocabulary, never corpus rows;
  * the two scalars (corpus doc count, vocabulary size) are O(1)-output
  * aggregates carried as broadcast columns. Scoring is one corpus scan
  * exploded to tokens, a broadcast cross-join against the (tiny) label
  * table, and a left join against the conditional table keyed on
  * (label, token) — again vocabulary-bounded on the build side; the
  * per-document reduce is map-side combined. Nothing is ever collected.
  */
object Classify {

  private def toks(textCol: String) =
    explode(TextAnalysis.tokens(lower(col(textCol)))).as("token")

  /** Per-(label, token) conditional table with Laplace smoothing:
    * `log_cond = ln((cnt + alpha) / (tot_label + alpha * V))` where `V`
    * is the corpus-wide distinct-token count. Token multiplicity counts
    * (multinomial NB). Returns (label, token, cnt, log_cond) with the
    * UNROUNDED log kept in `log_cond_raw` for the scorer; `log_cond` is
    * the 6-dp compare-boundary column.
    */
  def nbTrain(docs: DataFrame, idCol: String, textCol: String,
              labelCol: String, alpha: Double = 1.0): DataFrame = {
    val tk = docs.select(col(labelCol).as("label"), toks(textCol))
    val cnt = tk.groupBy("label", "token").agg(count(lit(1)).as("cnt"))
    val tot = cnt.groupBy("label").agg(sum(col("cnt")).as("tot"))
    val vocab = cnt.agg(countDistinct(col("token")).as("v"))
    cnt.join(broadcast(tot), Seq("label"))
      .crossJoin(broadcast(vocab))
      .withColumn("log_cond_raw",
        log((col("cnt").cast("double") + lit(alpha)) /
            (col("tot").cast("double") + lit(alpha) * col("v").cast("double"))))
      .select(col("label"), col("token"), col("cnt"),
        col("log_cond_raw"), round(col("log_cond_raw"), 6).as("log_cond"))
  }

  /** Per-label statistics the scorer needs: document-count prior
    * `log_prior = ln(n_docs_label / N)` and the unseen-token penalty
    * `log_unseen = ln(alpha / (tot_label + alpha * V))` (the Laplace
    * probability of a zero-count token). One row per label.
    */
  def nbLabelStats(docs: DataFrame, idCol: String, textCol: String,
                   labelCol: String, alpha: Double = 1.0): DataFrame = {
    val tk = docs.select(col(labelCol).as("label"), toks(textCol))
    val tot = tk.groupBy("label").agg(count(lit(1)).as("tot"))
    val vocab = tk.agg(countDistinct(col("token")).as("v"))
    val nd = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val n = docs.agg(count(lit(1)).as("n"))
    nd.join(tot, Seq("label"), "left_outer")
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(n))
      .select(col("label"), col("n_docs"),
        coalesce(col("tot"), lit(0L)).as("tot_tokens"),
        log(col("n_docs").cast("double") / col("n").cast("double")).as("log_prior"),
        log(lit(alpha) / (coalesce(col("tot"), lit(0L)).cast("double") +
          lit(alpha) * col("v").cast("double"))).as("log_unseen"))
  }

  /** Score every document against every label and keep the argmax:
    * `score(d, c) = log_prior(c) + sum_t [log_cond(c, t) | log_unseen(c)]`
    * over the document's tokens (multiplicity kept). Zero-token documents
    * fall back to the prior alone. The winner is decided on the 6-dp
    * ROUNDED score (ties break on label ascending) so the argmax is
    * reproducible across engines. Returns (doc_id, pred_label, score).
    */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
              cond: DataFrame, labelStats: DataFrame): DataFrame = {
    val tk = docs.select(col(idCol).as("doc_id"), toks(textCol))
    val perLabelTok = tk
      .crossJoin(broadcast(labelStats.select(col("label"), col("log_unseen"))))
      .join(cond.select(col("label"), col("token"), col("log_cond_raw")),
        Seq("label", "token"), "left_outer")
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(coalesce(col("log_cond_raw"), col("log_unseen"))).as("tok_sum"))
    val scored = docs.select(col(idCol).as("doc_id"))
      .crossJoin(broadcast(labelStats.select(col("label"), col("log_prior"))))
      .join(perLabelTok, Seq("doc_id", "label"), "left_outer")
      .select(col("doc_id"), col("label"),
        round(col("log_prior") + coalesce(col("tok_sum"), lit(0.0)), 6).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("label"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("label").as("pred_label"), col("score"))
  }
}

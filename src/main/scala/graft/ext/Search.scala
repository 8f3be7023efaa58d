package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index text retrieval over a document corpus: term → posting
  * list construction and conjunctive (AND) term queries — the lookup
  * side of a corpus store ("find every document mentioning X and Y"),
  * complementing the analysis operators that scan everything.
  *
  * Scale shape: the index build is one explode + one partial-aggregated
  * groupBy keyed on (token, doc) — keys are doc-local on the heavy side,
  * so no token's fanout concentrates on one task until the final
  * per-token coalesce, which only carries (token, doc, tf) triples, not
  * text. A query touches ONLY the probed terms' postings: the filter on
  * `token` pushes into the (at scale, token-bucketed parquet) posting
  * scan, so query cost is proportional to the matched posting rows —
  * independent of corpus size for selective terms. The AND is a count
  * aggregate over those rows, not an n-way self-join.
  */
object Search {

  /** Posting-list build: one row per (token, doc) with the term
    * frequency. Tokens are lowercased whitespace tokens (the engine's
    * shared tokenizer). Persist this partitioned/bucketed by `token` at
    * scale; queries then prune to the probed terms' buckets.
    */
  def invertedPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Conjunctive search: documents whose posting rows cover ALL query
    * terms, scored by total term frequency. `terms` must be distinct
    * (duplicates would double-count the coverage test).
    */
  def searchAll(postings: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      s"terms must be non-empty and distinct: $terms")
    postings.filter(col("token").isin(terms: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("score"))
      .filter(col("n_terms") === terms.size)
      .select(col("doc_id"), col("score"))
  }
}

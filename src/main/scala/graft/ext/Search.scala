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

  /** Corpus statistics the BM25 scorer needs: one row per document with
    * its token length, plus the corpus totals riding along as columns
    * (`n_docs`, `avgdl`). Built from the posting list (one corpus-sized
    * scan, one doc-keyed aggregate with map-side combine) — at scale this
    * table is materialized once next to the postings and reused by every
    * query, exactly like the index itself.
    */
  def docStats(postings: DataFrame): DataFrame = {
    val dl = postings.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    // corpus scalars: an O(1)-output aggregate broadcast onto every row
    val totals = dl.agg(count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    dl.crossJoin(broadcast(totals))
  }

  /** Disjunctive BM25 top-k: rank documents matching ANY query term by
    * the Robertson/Okapi score
    * `sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))` with the
    * non-negative idf `ln((N-df+0.5)/(df+0.5) + 1)`.
    *
    * Scale shape: the token filter prunes the posting scan to the probed
    * terms (bucket-pruned when postings are bucketed by token), so the
    * per-term df aggregate and the scoring join both run over matched
    * posting rows only — corpus size enters through `stats`, which is a
    * prebuilt artifact. The doc-length join puts the small (matched
    * postings) side right of a broadcast-eligible equi-join; the final
    * top-k is `orderBy+limit` = `TakeOrderedAndProject`, never a full
    * sort. Scores are rounded to 6 dp BEFORE ranking so the ordering is
    * reproducible across engines; ties break on doc_id.
    */
  def bm25TopK(postings: DataFrame, stats: DataFrame, terms: Seq[String],
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      s"terms must be non-empty and distinct: $terms")
    val matched = postings.filter(col("token").isin(terms: _*))
    val df_ = matched.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = matched
      .join(broadcast(df_), Seq("token"))
      .join(stats, Seq("doc_id"))
      .withColumn("idf",
        log((col("n_docs").cast("double") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("w",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
    scored.groupBy("doc_id")
      .agg(round(sum(col("w")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Hybrid retrieval via reciprocal-rank fusion (RRF, Cormack et al.
    * 2009, public method): fuse a lexical ranking and a vector ranking
    * of the same id space by `score = Σ_runs 1/(rrfK + rank)`, summing
    * only over runs where the document appears. The standard way to
    * combine BM25 with embedding search without calibrating their
    * incomparable score scales.
    *
    * Inputs are ALREADY-ranked top-k frames `(idCol, rank)` (ranks
    * 1-based, ties pre-broken) — both k-sized, so every operation here
    * is on k-row frames regardless of corpus size: the expensive parts
    * (posting probe, ANN probe) stay in their own operators. The fused
    * score is rounded to 6 dp before the final rank; ties break on id.
    *
    * Output: (idCol, in_lexical BOOLEAN, in_vector BOOLEAN,
    * rrf_score DOUBLE, rk BIGINT 1..k).
    */
  def rrfFuse(
      lexical: DataFrame,
      vector: DataFrame,
      idCol: String,
      rankCol: String,
      k: Int,
      rrfK: Int = 60): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val lex = lexical.select(col(idCol), col(rankCol).cast("long").as("__rl"))
    val vec = vector.select(col(idCol), col(rankCol).cast("long").as("__rv"))
    lex.join(vec, Seq(idCol), "full_outer")
      .select(col(idCol),
        col("__rl").isNotNull.as("in_lexical"),
        col("__rv").isNotNull.as("in_vector"),
        round(
          coalesce(lit(1.0) / (lit(rrfK) + col("__rl")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(rrfK) + col("__rv")), lit(0.0)),
          6).as("rrf_score"))
      // global rank over ≤2k rows; single partition DECLARED via a
      // non-foldable constant (the [[graft.log.ChangeLog.assignCdcIds]]
      // idiom — Spark 4 strips foldable partition specs)
      .withColumn("rk", row_number().over(
        Window.partitionBy(pmod(coalesce(col(idCol).cast("long"), lit(0L)), lit(1)))
          .orderBy(col("rrf_score").desc, col(idCol))).cast("long"))
      .filter(col("rk") <= k)
  }
}

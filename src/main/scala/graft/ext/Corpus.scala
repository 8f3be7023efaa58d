package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level operators for training-data pipelines: vocabulary
  * statistics, deterministic sampling, sequence packing, and duplicate
  * clustering. Like the rest of `ext`, everything is declarative
  * DataFrame algebra with the shuffle structure spelled out, and every
  * operator is reproducible by the DuckDB oracle (deterministic hashes,
  * exact integer arithmetic, explicit orderings).
  */
object Corpus {

  /** Top-`k` most frequent lowercase whitespace tokens. One explode +
    * one hash aggregate (map-side partial) + `TakeOrderedAndProject` —
    * the heavy-hitters plan that works at any corpus size because only
    * k rows survive per partition into the final ordering. Ties break
    * lexicographically for determinism.
    */
  def tokenFrequencies(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(k)

  /** Deterministic hash sample: keep a row iff
    * `hash32(salt || id) mod 1000 < permille`. Unlike `df.sample`, the
    * decision is a pure function of the id — stable across runs, cluster
    * sizes, AND engines (the oracle applies the same md5-derived hash),
    * and a narrow map (no shuffle, no RNG state). The standard way to
    * carve reproducible held-out splits from a training corpus.
    */
  def sampleByHash(df: DataFrame, idCol: String, permille: Int, salt: String): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"permille out of range: $permille")
    df.filter(
      PortableHash.hash32(concat(lit(salt), col(idCol).cast("string"))) % 1000 < permille)
  }

  /** Weighted deterministic sample: keep a row iff
    * `hash32(salt || id) < acceptProb · 2^32`, where `acceptProb` is a
    * per-ROW column in [0, 1] — importance/quality resampling ("keep
    * high-quality documents with probability ∝ score"), the knob a
    * data-mixing pipeline turns between "filter hard" and "keep all".
    * Same properties as [[sampleByHash]]: pure function of (salt, id) and
    * the row's own weight, so the decision is reproducible across runs,
    * partitionings, and engines, with NO shuffle and no RNG state — and
    * re-running with a HIGHER weight function keeps a superset of the
    * rows kept with a lower one (the hash threshold only moves up), which
    * is what makes iterative mix tuning cheap. Weights are clamped to
    * [0, 1]; the comparison is exact integer-vs-scaled-double on both
    * engines.
    */
  def weightedSampleByHash(
      df: DataFrame, idCol: String, weight: Column, salt: String): DataFrame = {
    val u = PortableHash.hash32(concat(lit(salt), col(idCol).cast("string")))
    df.filter(
      u.cast("double") <
        least(lit(1.0), greatest(lit(0.0), weight)) * lit(Sketches.HashDomain))
  }

  /** Fixed-stride document chunking with overlap — the "split long
    * documents into model-window pieces" step that precedes embedding or
    * training. Chunk starts are `1, 1+stride, 1+2·stride, …` (1-based,
    * while <= the text length), each chunk `chunkLen` characters
    * (`stride < chunkLen` ⇒ adjacent chunks overlap by `chunkLen -
    * stride`; the final chunk may be shorter). Pure per-row explode —
    * a narrow map with NO shuffle, fanout `ceil(len/stride)`, exactly
    * the plan that holds at any corpus size. Null/empty texts produce
    * no chunks (documented; `sequence(1, 0)` would otherwise error).
    *
    * Output: idCol ++ (chunk_i BIGINT 0-based, chunk_start BIGINT
    * 1-based char offset, chunk STRING).
    */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkLen: Int,
      stride: Int): DataFrame = {
    require(chunkLen > 0 && stride > 0 && stride <= chunkLen,
      s"need 0 < stride <= chunkLen, got chunkLen=$chunkLen stride=$stride")
    df.filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol), col(textCol).as("__t"),
        explode(sequence(lit(1), length(col(textCol)), lit(stride))).as("__s"))
      .select(col(idCol),
        expr(s"(__s - 1) div $stride").cast("long").as("chunk_i"),
        col("__s").cast("long").as("chunk_start"),
        col("__t").substr(col("__s"), lit(chunkLen)).as("chunk"))
  }

  /** Deterministic stratified k-sample: the k rows with the SMALLEST
    * portable hash of (salt, id) within each stratum — a uniform
    * without-replacement sample per stratum (hash order is independent
    * of any data attribute), reproducible across runs, partitionings,
    * and engines. Where [[mixStrata]] keeps a FRACTION per stratum,
    * this keeps an exact COUNT — the "n docs per language for the eval
    * set" operation.
    *
    * Plan: one window shuffle partitioned by stratum over a 3-column
    * projection (id, stratum, hash) — rank state only, no payload; the
    * selected ids join back to payloads downstream if needed. Ties
    * cannot occur on (hash, id) since id is unique, so the sample is
    * total-order deterministic.
    *
    * Output: (id, stratum, rnk BIGINT 1..k by hash order).
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: Column,
      k: Int,
      salt: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(col("stratum")).orderBy(col("__h"), col(idCol))
    df.select(col(idCol), strataCol.as("stratum"))
      .withColumn("__h",
        PortableHash.hash32(concat(lit(salt), col(idCol).cast("string"))))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("stratum"), col("rnk"))
  }

  /** Greedy contiguous sequence packing: within each stratum (ordered by
    * `idCol`), assign documents to training sequences of up to
    * `maxTokens` whitespace tokens — `seq_i = (tokens before this doc)
    * div maxTokens`. One window cumsum per stratum; exact integer
    * arithmetic. The contiguous-by-id discipline is what makes packing
    * deterministic and mergeable across a distributed sort, at the cost
    * of some padding vs bin-packing heuristics (the standard trade at
    * scale).
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int,
      strataCol: Column): DataFrame = {
    // ROWS frame (the packStats stance): the orderBy default RANGE frame
    // would fold tied ids' tokens into each other's cum
    val w = Window.partitionBy(col("stratum")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), strataCol.as("stratum"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      // integer `div`, not `/`: float division would be exact here but
      // the integral form keeps both engines trivially identical
      .withColumn("seq_i", expr(s"(cum - n_tokens) div $maxTokens"))
      .drop("cum")
  }

  /** Packing-boundary audit over [[packSequences]]' greedy contiguous
    * fill: for each (stratum, context length), how many documents
    * straddle a sequence boundary — the docs a non-splitting trainer
    * must truncate/pad around, the direct design input for choosing a
    * context length against a given corpus. A document with 0-based
    * token span [start, start+len) crosses a boundary iff
    * `start div ctx != (start+len−1) div ctx`.
    *
    * Plan: ONE stratum-key window cumsum over a 3-column projection
    * (id, stratum, token count — no text leaves the scan), then an
    * explode over the constant context-length list (|ctxs|× a
    * 4-column frame, nothing like the corpus), then a (stratum, ctx)
    * rollup that reuses the stratum partitioning (subset-key
    * aggregate, no second exchange). Zero-token docs are excluded —
    * they occupy no span.
    *
    * Output: (stratum, ctx INT, n_docs, total_tokens, n_seqs =
    * ceil(total/ctx), n_cross_docs, cross_doc_frac 6-dp,
    * cross_token_frac 6-dp = fraction of tokens in straddling docs),
    * ordered by stratum, ctx.
    */
  def packStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      ctxs: Seq[Int],
      strataCol: Column): DataFrame = {
    require(ctxs.nonEmpty && ctxs.forall(_ > 0), "context lengths must be positive")
    // ROWS frame, not the orderBy default RANGE frame: the DuckDB oracle
    // pins ROWS UNBOUNDED PRECEDING, and under RANGE two docs tying on
    // idCol would each absorb the other's tokens into `cum`, producing
    // overlapping spans (same stance as budgetMix's window below)
    val w = Window.partitionBy(col("stratum")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = df.select(col(idCol), strataCol.as("stratum"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("stratum"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("strt"),
        (col("cum") - 1).as("endp"))
    spans
      .select(col("stratum"), col("n_tokens"), col("strt"), col("endp"),
        explode(typedLit(ctxs)).as("ctx"))
      .withColumn("crossed",
        expr("(strt div ctx) != (endp div ctx)").cast("long"))
      .groupBy(col("stratum"), col("ctx"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("crossed")).as("n_cross_docs"),
        sum(col("crossed") * col("n_tokens")).as("__cross_tokens"))
      .select(col("stratum"), col("ctx"), col("n_docs"), col("total_tokens"),
        expr("(total_tokens + ctx - 1) div ctx").as("n_seqs"),
        col("n_cross_docs"),
        round(col("n_cross_docs").cast("double") / col("n_docs"), 6)
          .as("cross_doc_frac"),
        round(col("__cross_tokens").cast("double") / col("total_tokens"), 6)
          .as("cross_token_frac"))
      .orderBy(col("stratum"), col("ctx"))
  }

  /** Top-`k` TF-IDF terms per document — the classic keyword/topic
    * extraction pass. The idf factor is the RATIONAL form `(N+1)/(df+1)`
    * rather than its logarithm: the ranking it induces per document is
    * the same (log is monotone), and staying inside exactly-rounded IEEE
    * ops (`*`, `/`) keeps scores bit-identical across engines, where
    * `ln` is only correctly-rounded on some libms. Scores are rounded
    * to 6 dp BEFORE ranking so the rank is stable.
    *
    * Plan: explode → (doc, token) hash-agg → token-keyed df agg + join
    * back → per-doc top-k window. All keys are either doc-local or
    * vocabulary terms — uniformly distributed at any corpus size; the
    * df side is vocabulary-sized (broadcastable for natural-language
    * vocabularies, shuffle join otherwise — left to AQE).
    *
    * `docCount` is the corpus size N (callers usually pass `df.count()`;
    * taken as a parameter so a pipeline that already knows N doesn't
    * rescan for it).
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String, k: Int, docCount: Long): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token").asc)
    tf.join(dfreq, Seq("token"))
      .withColumn("score",
        round(col("tf").cast("double") *
          (lit((docCount + 1).toDouble) / (col("df") + 1).cast("double")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("score"), col("rnk"))
  }

  /** Benchmark decontamination: flag training documents that share at
    * least one word `n`-gram with an evaluation/benchmark set — the
    * standard pre-training hygiene step that keeps test data out of the
    * training corpus. Returns (doc_id, n_hit_ngrams): the number of the
    * doc's DISTINCT n-grams that appear anywhere in the eval set.
    *
    * Scale shape: the eval side (benchmarks: thousands of docs) collapses
    * to a distinct gram set and is BROADCAST; the training corpus is one
    * narrow scan → explode → broadcast-hash semi-probe → partial
    * aggregate. The 100 TB corpus never shuffles — only matched
    * (doc, gram) hits reach the final per-doc count, and at realistic
    * contamination rates that is a vanishing fraction of the corpus.
    */
  def decontaminate(
      train: DataFrame,
      eval: DataFrame,
      textCol: String,
      idCol: String,
      n: Int): DataFrame = {
    // grams are matched by 64-bit hash, not string: the native
    // [[Dedup.hashedShingles]] kernel goes text → sorted distinct hashes
    // in one pass (the string-building Column chain was the query's whole
    // cost), the broadcast set carries 8 B/gram instead of the strings,
    // and the probe compares longs. A false hit needs an xxhash64
    // collision between a train gram and an eval gram — P ≈
    // |train|·|eval|/2⁶⁴, vanishing at any real corpus size (same
    // documented trade as the ngram dedup pipeline).
    val evalGrams = eval
      .select(explode(Dedup.hashedShingles(col(textCol), n)).as("gram"))
      .distinct()
    train
      .select(col(idCol).as("doc_id"),
        explode(Dedup.hashedShingles(col(textCol), n)).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_ngrams"))
  }

  /** End-to-end curation pipeline — the composition a daily training-data
    * run actually executes, as ONE dataflow: quality gate (minimum token
    * count) → exact dedup keep-one (first id per normalized-text
    * fingerprint wins) → decontamination (drop docs whose n-gram overlap
    * with the eval set exceeds `maxHitNgrams`). Returns the surviving
    * docs as `(doc_id, stratum, n_tokens)`.
    *
    * Plan shape, in order: narrow scan with the token count and
    * fingerprint computed in one pass; [[decontaminate]]'s broadcast
    * semi-probe and a LEFT ANTI against the (tiny) contaminated-id set;
    * then one hash-partition shuffle on the fingerprint for the keep-one
    * window — the only corpus-sized shuffle, run over the
    * already-thinned frame. At 100 TB the pipeline moves the corpus
    * across the wire exactly once — each stage's filter runs before the
    * next stage's work, so dropped rows pay nothing downstream.
    */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stratumCol: Column,
      eval: DataFrame,
      minTokens: Int,
      n: Int,
      maxHitNgrams: Long): DataFrame = {
    val q = docs
      .select(col(idCol).as("doc_id"), stratumCol.as("stratum"), col(textCol).as("__text"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .filter(col("n_tokens") >= minTokens)
    // Decontamination runs BEFORE the keep-one window: both stages are
    // pure functions of the text (exact duplicates share hit counts),
    // so they commute — and this order runs the corpus-sized
    // fingerprint shuffle exactly once, over the already-thinned frame.
    // (Dedup-first needs `kept` twice — probe + anti-join — and the
    // plan re-ran the window for each consumer; checkpointing `kept`
    // fixed the double shuffle but paid an eager corpus
    // materialization. Commuting gets both properties for free.)
    val contaminated = decontaminate(q, eval.select(col(textCol).as("__text")),
        "__text", "doc_id", n)
      .filter(col("n_hit_ngrams") > maxHitNgrams)
      .select(col("doc_id"))
    val w = Window.partitionBy(col("__fp")).orderBy(col("doc_id"))
    q.join(contaminated, Seq("doc_id"), "left_anti")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("stratum"), col("n_tokens"))
  }

  /** Stratified corpus mixing: keep each row with a per-stratum
    * probability `permille(stratum)/1000`, decided by the same
    * deterministic portable hash as [[sampleByHash]] — the "sample
    * Wikipedia at 3 epochs, CommonCrawl at 0.4" mixing step of a training
    * run, reproducible across runs, engines, and cluster sizes. Strata
    * absent from the map are dropped (permille 0). A narrow map — no
    * shuffle, no RNG state; the weights ride along as a literal map
    * expression, so the filter is codegen'd into the scan.
    */
  def mixStrata(
      df: DataFrame,
      idCol: String,
      strataCol: Column,
      permilleByStratum: Map[String, Int],
      salt: String): DataFrame = {
    require(permilleByStratum.values.forall(p => p >= 0 && p <= 1000),
      s"permille out of range in $permilleByStratum")
    val weights = map(permilleByStratum.toSeq.flatMap {
      case (k, v) => Seq(lit(k), lit(v))
    }: _*)
    df.filter(
      PortableHash.hash32(concat(lit(salt), col(idCol).cast("string"))) % 1000 <
        coalesce(element_at(weights, strataCol), lit(0)))
  }

  /** Token-BUDGET mixing — the other half of data mixing: [[mixStrata]]
    * answers "keep fraction p of stratum X", this answers "take N tokens
    * of stratum X" (training mixes are specified in tokens, not rows).
    * Docs are visited in a deterministic pseudo-random order (portable
    * hash of (salt, id), ties on id); a doc is taken while the tokens
    * BEFORE it are still under the stratum's budget, so the selection
    * always crosses the budget by at most one document and is identical
    * for any partitioning / engine. Strata absent from the budget map
    * are dropped.
    *
    * Scale shape: one window shuffle partitioned by stratum ordered by
    * an 8-byte hash (same cost class as [[packSequences]] /
    * [[shuffleAssign]] — the per-stratum ordering IS the semantics); the
    * budget map rides as a literal. No driver state, no RNG.
    *
    * Output: (id, stratum, n_tokens, tok_before) for selected docs.
    */
  def budgetMix(
      df: DataFrame,
      idCol: String,
      textCol: String,
      strataCol: Column,
      tokenBudget: Map[String, Long],
      salt: String): DataFrame = {
    require(tokenBudget.values.forall(_ >= 0), s"negative budget in $tokenBudget")
    val budgets = map(tokenBudget.toSeq.flatMap {
      case (k, v) => Seq(lit(k), lit(v))
    }: _*)
    val h = PortableHash.hash32(concat(lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(col("stratum")).orderBy(col("__h"), col(idCol))
    df.select(col(idCol), strataCol.as("stratum"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        h.as("__h"), element_at(budgets, strataCol).as("__budget"))
      .filter(col("__budget").isNotNull)
      .withColumn("tok_before",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("tok_before") < col("__budget"))
      .select(col(idCol), col("stratum"), col("n_tokens"), col("tok_before"))
  }

  /** Deterministic global shuffle for training-order assignment: each row
    * gets a shard (hash bucket) and a dense position within its shard,
    * ordered by a second hash — a reproducible random permutation in
    * shard-major order, the way training examples are sharded and
    * shuffled before being fed to a data loader. One hash-partitioned
    * window per shard: parallelism = `numShards` (size it to the cluster;
    * rows per shard = corpus/numShards bounds per-task memory).
    */
  def shuffleAssign(df: DataFrame, idCol: String, numShards: Int, salt: String): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    val h = PortableHash.hash32(concat(lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    df.select(col(idCol), (h % numShards).as("shard"), h.as("h"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("h")
  }

  /** Streaming corpus ingest: the continuous front door of a training-data
    * pipeline — quality-score each arriving document, drop the ones below
    * `minQuality`, and suppress exact re-ingestions (crawler retries,
    * at-least-once sources) by content fingerprint within the watermark.
    *
    * State is keyed by fingerprint and evicted once the watermark passes
    * `tsCol` + `watermarkDelay`: O(docs per watermark window), never
    * O(corpus history) — re-crawls beyond the window are deliberately NOT
    * suppressed here (that is batch dedup's job over the landed corpus;
    * unbounded streaming state would be the 100 TB failure mode). The
    * batch equivalent over a static frame is quality-filter +
    * `dropDuplicates("fp")`.
    */
  def streamingIngest(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      minQuality: Double,
      watermarkDelay: String = "1 hour"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .filter(col("quality") >= minQuality)
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .dropDuplicatesWithinWatermark("fp")

  /** Passage-level corpus deduplication — the C4/RefinedWeb granularity
    * BETWEEN whole-document dedup and n-gram overlap: the corpus is
    * segmented into fixed `passageLen`-char non-overlapping windows
    * (via [[chunkDocuments]] with stride = length, so concatenating a
    * doc's chunks reconstructs it), every FULL-length chunk that recurs
    * anywhere in the corpus is kept only at its first occurrence in
    * (doc, position) order and dropped everywhere else, and documents
    * are reassembled from their surviving chunks. Short tail chunks
    * (< passageLen chars) are kept verbatim — too little content to
    * dedup on, the analog of C4's minimum-span rule.
    *
    * Scale shape: the keep-first decision is a map-side-combined
    * min-(doc, pos) aggregate keyed on the chunk content, joined back to
    * the chunk frame — the aggregate output is one row per DISTINCT
    * chunk, and a viral passage (the skew case) collapses to a single
    * row in the partial combine rather than sorting its whole multiplicity
    * in one window task; the join back is AQE-skew-splittable. Reassembly
    * is one per-doc aggregate (doc-local key). The audit row is O(1)
    * wide: counts + md5 of the cleaned text, never the text itself.
    *
    * Output: idCol ++ (n_total BIGINT chunks, n_kept BIGINT,
    * clean_md5 STRING — md5 of the reassembled text, NULL iff the input
    * text was NULL).
    */
  def passageDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      passageLen: Int = 64): DataFrame = {
    require(passageLen > 0, s"passageLen must be positive, got $passageLen")
    val chunks = chunkDocuments(df, idCol, textCol, passageLen, passageLen)
      .select(col(idCol), col("chunk_i"), col("chunk"))
    val keepers = chunks
      .filter(length(col("chunk")) === passageLen)
      .groupBy(col("chunk"))
      .agg(min(struct(col(idCol), col("chunk_i"))).as("__k"))
      .select(col("chunk"), col(s"__k.$idCol").as("__kid"),
        col("__k.chunk_i").as("__kci"))
    val marked = chunks.join(keepers, Seq("chunk"), "left_outer")
      .withColumn("__keep",
        length(col("chunk")) < passageLen ||
          (col(idCol) === col("__kid") && col("chunk_i") === col("__kci")))
    val agg = marked
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        md5(concat_ws("",
          transform(
            array_sort(collect_list(struct(col("chunk_i"),
              when(col("__keep"), col("chunk")).otherwise("").as("__c")))),
            e => e.getField("__c")))).as("clean_md5"))
    df.select(col(idCol), col(textCol).as("__t"))
      .join(agg, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_total"), lit(0L)).as("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        when(col("__t").isNull, lit(null).cast("string"))
          .otherwise(coalesce(col("clean_md5"), md5(lit("")))).as("clean_md5"))
  }

  /** Per-source document cap — the C4/RefinedWeb "domain cap" curation
    * step: no source (domain, crawl, feed) may contribute more than
    * `cap` documents, the kept ones chosen by deterministic portable
    * hash order (uniform without-replacement sample per source, stable
    * across runs/engines; ties impossible — id is unique).
    *
    * Scale shape: selection is TWO bounded window passes, not one
    * global sort per source. Pass 1 partitions each source's rows into
    * `preBuckets` hash sub-buckets and keeps the top `cap` per
    * (source, bucket) — any single window task sorts only its
    * sub-bucket, so a hot source (the skew case: one domain with 10⁹
    * docs) splits across `preBuckets` tasks. Pass 2 ranks the surviving
    * ≤ preBuckets·cap rows per source — bounded input regardless of
    * source size. Both passes carry (id, source, hash) only, never text.
    * Exactness: the global top-cap by hash order is a subset of the
    * per-bucket top-caps, so the two-phase result equals the single-
    * window result row-for-row (same argument as a partial top-k).
    *
    * Output: (idCol, sourceCol, rk BIGINT 1..cap in hash order).
    */
  def sourceCap(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      cap: Int,
      salt: String,
      preBuckets: Int = 16): DataFrame =
    rankCapped(
      hashedSourceRows(df, idCol, sourceCol, salt),
      idCol, sourceCol, cap, preBuckets)
      .select(col(idCol), col(sourceCol), col("rk"))

  private def hashedSourceRows(
      df: DataFrame, idCol: String, sourceCol: String, salt: String): DataFrame =
    df.select(col(idCol), col(sourceCol),
      PortableHash.hash32(concat(lit(salt), col(idCol).cast("string"))).as("__h"))

  /** Shared two-phase top-cap ranking over a hashed (id, source, __h)
    * frame — see [[sourceCap]] for the exactness/skew argument.
    * Output keeps `__h` so the incremental index can re-rank appends.
    */
  private def rankCapped(
      hashed: DataFrame,
      idCol: String,
      sourceCol: String,
      cap: Int,
      preBuckets: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    import org.apache.spark.sql.expressions.Window
    hashed
      .withColumn("__b", pmod(col("__h"), lit(preBuckets)))
      .withColumn("__r1", row_number().over(
        Window.partitionBy(col(sourceCol), col("__b"))
          .orderBy(col("__h"), col(idCol))))
      .filter(col("__r1") <= cap)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(sourceCol))
          .orderBy(col("__h"), col(idCol))).cast("long"))
      .filter(col("rk") <= cap)
      .select(col(idCol), col(sourceCol), col("__h"), col("rk"))
  }

  /** Persisted incremental form of [[sourceCap]] — the curation member
    * of the serving-index family ([[Dedup.writeSignatureIndex]],
    * IVF+PQ): the kept set lands on disk partitioned by a FOLDED source
    * hash (`ps = pmod(hash32(source), sourceParts)` — bounded directory
    * count, partition-prunable maintenance), and a day's batch updates
    * ONLY the partitions its sources fold into.
    *
    * Append ≡ rebuild, exactly: the new kept set per touched source is
    * top-cap(stored-kept ∪ batch) by hash order, and any row of
    * top-cap(base ∪ batch) is either a batch row or already in
    * top-cap(base) — the standard partial-top-k argument — so dropped
    * rows can never re-enter and the stored hashes (`hv`) are all the
    * state re-ranking needs. Untouched sources in a rewritten partition
    * re-rank to identical rows (idempotent). Parameters are persisted
    * and append fails fast on a mismatch (a different salt or cap would
    * silently produce a set that equals NO single-shot cap).
    */
  def writeSourceCapIndex(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      cap: Int,
      salt: String,
      path: String,
      sourceParts: Int = 64,
      preBuckets: Int = 16): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val kept = rankCapped(hashedSourceRows(df, idCol, sourceCol, salt),
        idCol, sourceCol, cap, preBuckets)
      .withColumn("ps", pmod(PortableHash.hash32(col(sourceCol)), lit(sourceParts)).cast("int"))
    // the kept schema rides in params so readers never infer: an EMPTY
    // initial build writes zero part-files under kept/, and inference
    // over that dir would fail (UNABLE_TO_INFER_SCHEMA) even though the
    // index is perfectly valid state for append to grow from
    Seq((cap, salt, sourceParts, kept.schema.json))
      .toDF("cap", "salt", "source_parts", "kept_schema")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
    kept.repartition(sourceParts, col("ps"))
      .write.partitionBy("ps").mode("overwrite").parquet(s"$path/kept")
  }

  private def requireCapParams(
      spark: org.apache.spark.sql.SparkSession,
      path: String, cap: Int, salt: String, sourceParts: Int)
      : org.apache.spark.sql.types.StructType = {
    val r = spark.read.parquet(s"$path/params").collect()(0)
    val stored = (r.getInt(0), r.getString(1), r.getInt(2))
    require(stored == ((cap, salt, sourceParts)),
      s"source-cap index at $path was built with (cap, salt, sourceParts) = " +
        s"$stored; caller passed ${(cap, salt, sourceParts)}")
    org.apache.spark.sql.types.DataType.fromJson(r.getString(3))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
  }

  /** The persisted kept set under its recorded schema — reads an
    * empty-build index (zero part-files) as an empty frame instead of
    * failing schema inference.
    */
  private def readKeptIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).parquet(s"$path/kept")

  /** Fold a batch into the persisted cap index. I/O is proportional to
    * the batch's source spread: the batch's distinct `ps` values (≤
    * sourceParts, a bounded driver-side list) become a partition filter
    * on the stored kept set, and only those partitions are re-ranked
    * and dynamically overwritten.
    */
  def appendToSourceCapIndex(
      batch: DataFrame,
      idCol: String,
      sourceCol: String,
      cap: Int,
      salt: String,
      path: String,
      sourceParts: Int = 64,
      preBuckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    val keptSchema = requireCapParams(spark, path, cap, salt, sourceParts)
    val hashed = hashedSourceRows(batch, idCol, sourceCol, salt)
      .withColumn("ps", pmod(PortableHash.hash32(col(sourceCol)), lit(sourceParts)).cast("int"))
      .localCheckpoint(true) // consumed twice (ps list + union); small: one batch
    val touched = hashed.select(col("ps")).distinct()
      .collect().map(_.getInt(0)).sorted
    val stored = readKeptIndex(spark, path, keptSchema)
      .filter(col("ps").isin(touched.map(Integer.valueOf): _*))
    val merged = stored.select(col(idCol), col(sourceCol), col("__h"), col("ps"))
      .unionByName(hashed)
    rankCapped(merged, idCol, sourceCol, cap, preBuckets)
      .withColumn("ps", pmod(PortableHash.hash32(col(sourceCol)), lit(sourceParts)).cast("int"))
      .repartition(math.max(1, touched.length), col("ps"))
      .write.partitionBy("ps").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(s"$path/kept")
  }

  /** The served kept set: (id, source, rk). */
  def serveSourceCapIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, sourceCol: String): DataFrame = {
    val schemaJson = spark.read.parquet(s"$path/params")
      .collect()(0).getString(3)
    readKeptIndex(spark, path,
        org.apache.spark.sql.types.DataType.fromJson(schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
      .select(col(idCol), col(sourceCol), col("rk"))
  }

  /** Line-level exact deduplication — the RefinedWeb granularity below
    * [[passageDedup]]'s fixed windows: a LINE (newline-delimited) that
    * occurs in more than `maxDocs` distinct documents is boilerplate
    * (nav bars, cookie banners, license headers) and is removed from
    * EVERY document; lines shorter than `minLineLen` characters are
    * exempt (too little content to call boilerplate — empty lines and
    * separators keep document structure, the analog of passageDedup's
    * short-tail rule).
    *
    * Scale shape: the boilerplate decision is a (line, doc)-distinct
    * aggregate — map-side combined, one row per distinct line out — and
    * the hot set (lines OVER the threshold) is, by construction, small
    * relative to the corpus; it joins back against the line frame as a
    * broadcast-eligible anti-join on the line content. A viral line
    * collapses in the partial aggregate, not in a single reduce task.
    * Reassembly is one doc-keyed aggregate. The audit row is O(1) wide:
    * counts + md5 of the cleaned text, never the text.
    *
    * Output: idCol ++ (n_lines BIGINT, n_kept BIGINT, clean_md5 STRING —
    * md5 of surviving lines joined by newline, NULL iff text was NULL).
    */
  def lineDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDocs: Int,
      minLineLen: Int = 10): DataFrame = {
    require(maxDocs > 0, s"maxDocs must be positive, got $maxDocs")
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val candidates = lines.filter(length(col("line")) >= minLineLen)
    // distinct-doc count per line, two-stage: (line, doc) distinct is
    // map-side combinable where a countDistinct would hold per-line doc
    // sets in the aggregation state
    val hot = candidates.select(col("line"), col(idCol)).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") > maxDocs)
      .select(col("line"))
    val marked = lines
      .join(hot.withColumn("__hot", lit(true)), Seq("line"), "left_outer")
      .withColumn("__keep",
        length(col("line")) < minLineLen || col("__hot").isNull)
    val agg = marked
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        md5(concat_ws("\n",
          transform(
            array_sort(collect_list(when(col("__keep"),
              struct(col("pos"), col("line"))))),
            e => e.getField("line")))).as("clean_md5"))
    df.select(col(idCol), col(textCol).as("__t"))
      .join(agg, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        when(col("__t").isNull, lit(null).cast("string"))
          .otherwise(col("clean_md5")).as("clean_md5"))
  }

  /** Connected components over near-duplicate pairs: every document in a
    * duplicate cluster is labeled with the cluster's minimum id — the
    * step that turns pairwise dedup output into "keep one per cluster".
    *
    * Standard min-label propagation: each round, every node takes the
    * min of its own label and its neighbors' labels; converges in
    * O(log diameter) rounds (duplicate clusters are shallow — a handful
    * of rounds in practice). Each round is one join + one aggregate with
    * the label frontier `localCheckpoint`ed to truncate lineage; edges
    * are persisted once. Output: (doc_id, cluster_id), one row per
    * distinct id appearing in `pairs`.
    */
  def dedupClusters(pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    // both edge directions from ONE scan of `pairs` (a union of two
    // selects would compute the - possibly expensive - pair input twice)
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var converged = false
    while (!converged) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nlabel"))
      // ONE join per round: carry (old, new) label side by side in the
      // checkpointed frame, so the convergence check is a narrow scan of
      // materialized rows instead of a second label-vs-label join.
      val joined = labels
        .join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("nl"))
        .localCheckpoint(true)
      converged = joined.filter(col("nl") =!= col("label")).isEmpty
      labels = joined.select(col("id"), col("nl").as("label"))
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** The three decontamination tiers unified into ONE per-document
    * report: exact (shared word `exactN`-grams, [[decontaminate]]),
    * fuzzy (minhash LSH cross pairs at j >= `fuzzyThreshold`,
    * [[Dedup.crossNearDupPairs]] with the recall-first 64x2 banding),
    * and semantic (embedding cosine >= `cosineThreshold`,
    * [[Similarity.embeddingDecontaminate]], aligned id spaces), all
    * against the SAME hash-sampled eval set (`permille`/1000 of ids by
    * the salted portable hash — [[sampleByHash]]'s convention), merged
    * per doc with an `n_tiers` agreement count. A paraphrased leak
    * shows up semantic-only; a verbatim leak lights all three.
    * Each tier keeps its bounded shape (broadcast gram set / banded
    * buckets / broadcast eval sweep); the merge is O(flagged docs).
    */
  def contaminationReport(
      docs: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      textCol: String,
      vecIdCol: String,
      vecCol: String,
      salt: String = "evalset",
      permille: Int = 100,
      exactN: Int = 5,
      fuzzyThreshold: Double = 0.5,
      cosineThreshold: Double = 0.3): DataFrame = {
    def inEval(c: Column) =
      PortableHash.hash32(concat(lit(salt), c.cast("string"))) % 1000 < permille
    val train = docs.filter(!inEval(col(idCol)))
    val eval = docs.filter(inEval(col(idCol)))
    val exact = decontaminate(train, eval, textCol, idCol, n = exactN)
      .select(col("doc_id"), col("n_hit_ngrams").as("exact_hits"))
    val fuzzy = Dedup.crossNearDupPairs(train, eval, textCol, idCol,
        n = 3, bands = 64, rowsPerBand = 2, threshold = fuzzyThreshold,
        mode = HashMode.Portable)
      .groupBy(col("id_l").as("doc_id"))
      .agg(count(lit(1)).as("fuzzy_matches"))
    val sem = Similarity.embeddingDecontaminate(
        embeddings.filter(!inEval(col(vecIdCol))),
        embeddings.filter(inEval(col(vecIdCol))),
        vecIdCol, vecCol, threshold = cosineThreshold)
      .select(col(vecIdCol).as("doc_id"),
        col("n_eval_matches").as("semantic_matches"))
    exact.join(fuzzy, Seq("doc_id"), "full_outer")
      .join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("exact_hits"), lit(0L)).as("exact_hits"),
        coalesce(col("fuzzy_matches"), lit(0L)).as("fuzzy_matches"),
        coalesce(col("semantic_matches"), lit(0L)).as("semantic_matches"))
      .withColumn("n_tiers",
        (col("exact_hits") > 0).cast("int") +
          (col("fuzzy_matches") > 0).cast("int") +
          (col("semantic_matches") > 0).cast("int"))
  }

  /** Canonical selection per near-dup cluster: within each connected
    * component of `pairs` ([[dedupClusters]]), keep the LONGEST document
    * (whitespace tokens, id ascending on ties) and report the member
    * count plus the tokens retired by deduping the cluster to its
    * canonical — the "keep the best copy" policy and savings ledger a
    * real dedup run produces. The winner is picked by
    * `max(struct(n_tokens, -id))` in ONE aggregate (no window shuffle);
    * O(flagged docs), a vanishing corpus fraction.
    */
  def dedupCanonical(pairs: DataFrame, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val m = dedupClusters(pairs)
      .join(docs.select(col(idCol).as("doc_id"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens")), Seq("doc_id"))
    m.groupBy(col("cluster_id"))
      .agg(
        count(lit(1)).as("n_members"),
        sum(col("n_tokens")).as("tokens_total"),
        max(struct(col("n_tokens"), (-col("doc_id")).as("neg_id"))).as("best"))
      .select(col("cluster_id"),
        (-col("best.neg_id")).as("canonical_id"),
        col("n_members"),
        (col("tokens_total") - col("best.n_tokens")).as("tokens_retired"))
  }

  /** Duplicated-n-gram report — the memorization-risk audit from the
    * dedup literature: which word n-grams occur repeatedly across the
    * corpus (counting every occurrence, NOT the per-doc-distinct shingle
    * sets dedup uses), and in how many distinct documents. A training
    * corpus with a handful of n-grams occurring millions of times is a
    * boilerplate/template signal the dedup pipeline should be pointed at.
    *
    * Scale shape: one narrow scan → explode (docs shorter than `n`
    * tokens contribute nothing — the audit wants real n-grams, not the
    * whole-text fallback dedup shingles use) → a (gram, doc)
    * pre-aggregate (distinct-doc counting) → a gram-key rollup, both
    * with map-side partial combine → `minDocs` filter →
    * `TakeOrderedAndProject` top-k. Only k rows survive per partition
    * into the final ordering, so the result stays driver-safe at any
    * corpus size. Ties break lexicographically for determinism.
    *
    * Output: (gram, n_occurrences BIGINT, n_docs BIGINT), ordered by
    * occurrences desc then gram, capped at `k`.
    */
  def dupNgrams(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Int,
      k: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    // ONE scan (a two-scan plan that aggregated 8-byte gram hashes and
    // re-derived only the k winning strings measured 8.9 s vs 5.2 s at
    // sf0.1, because scan 2 re-pays the gram build). The per-(gram, row)
    // tf counting happens INSIDE the native [[graft.expr.TfGrams]]
    // kernel (no-fallback mode: docs shorter than n contribute nothing —
    // the audit wants real n-grams), so the exploded output is already
    // a (gram, tf) posting list and the interpreted window HOF of the
    // round-8 plan is gone. n_docs counts DISTINCT `idCol` values (two
    // rows sharing a doc id — a doc split across rows — are one doc),
    // so a (gram, doc) pre-aggregate collapses per-doc postings before
    // the gram-key rollup; both levels partial-combine map-side.
    df.select(col(idCol).as("__doc"),
        explode(Dedup.tfGrams(col(textCol), n, withShortFallback = false))
          .as("__gt"))
      .groupBy(col("__gt.g").as("gram"), col("__doc"))
      .agg(sum(col("__gt.tf")).as("__c"))
      .groupBy(col("gram"))
      .agg(sum(col("__c")).as("n_occurrences"),
        count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_occurrences").desc, col("gram"))
      .limit(k)
  }

  /** Exact repeated-SUBSTRING span audit — the per-document sibling of
    * [[dupNgrams]] and the scalable stand-in for suffix-array substring
    * dedup (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better"): for each document, how many of its word n-gram
    * windows also occur in at least one OTHER document, and the longest
    * CONSECUTIVE run of such windows (a run of `r` duplicated n-gram
    * windows is a shared substring of `r + n − 1` tokens). Long spans
    * are verbatim-copy / memorization risks that set-based shingle
    * dedup (which ignores position) cannot see.
    *
    * Scale shape: one scan → native positional-gram kernel
    * ([[graft.expr.PosGrams]]) → gram-key windows (dense_rank + max,
    * ONE exchange — distinct-doc count per gram without a self-join) →
    * doc-key window for the gaps-and-islands run ids → (doc, run) and
    * doc rollups that reuse the doc-key partitioning (subset-key
    * aggregates, no further exchange) → top-k. Per-doc gram totals come
    * from a second narrow scan of the corpus (token count only, no gram
    * strings) joined on the doc key. Everything between the two
    * explicit exchanges partial-combines map-side; only `k` rows
    * survive into the final ordering.
    *
    * Output: (doc_id, n_grams, n_dup_grams, n_dup_runs,
    * longest_dup_span_tokens, dup_frac DOUBLE 6-dp), docs with at least
    * one duplicated window, ordered by longest span desc then doc_id,
    * capped at `k`.
    */
  def dupSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      k: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val grams = df.select(col(idCol).as("doc_id"),
      posexplode(Dedup.posGrams(col(textCol), n)).as(Seq("pos", "g")))
    // distinct docs per gram: dense_rank over doc order, then the
    // partition max — two window frames over ONE gram-key exchange
    val byGramOrdered = Window.partitionBy(col("g")).orderBy(col("doc_id"))
    val byGram = Window.partitionBy(col("g"))
    val marked = grams
      .withColumn("__dr", dense_rank().over(byGramOrdered))
      .withColumn("__nd", max(col("__dr")).over(byGram))
      .select(col("doc_id"), col("pos"), (col("__nd") >= 2).as("dup"))
    // gaps-and-islands: consecutive duplicated positions share
    // pos − running_dup_count; non-dup rows keep rid null and are
    // dropped before the run rollup
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = marked.withColumn("rid",
      when(col("dup"),
        col("pos") - sum(when(col("dup"), 1L).otherwise(0L)).over(byDoc)))
    val perRun = runs.filter(col("dup"))
      .groupBy(col("doc_id"), col("rid"))
      .agg(count(lit(1)).as("run_len"))
    val perDoc = perRun.groupBy(col("doc_id"))
      .agg(sum(col("run_len")).as("n_dup_grams"),
        count(lit(1)).as("n_dup_runs"),
        (max(col("run_len")) + (n - 1)).as("longest_dup_span_tokens"))
    // per-doc window totals: token count only — no gram strings built
    val totals = df.select(col(idCol).as("doc_id"),
      greatest(
        size(TextAnalysis.tokens(lower(col(textCol)))) - (n - 1),
        lit(0)).cast("long").as("n_grams"))
    perDoc.join(totals, Seq("doc_id"))
      .select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
        col("n_dup_runs"), col("longest_dup_span_tokens"),
        round(col("n_dup_grams").cast("double") / col("n_grams"), 6)
          .as("dup_frac"))
      .orderBy(col("longest_dup_span_tokens").desc, col("doc_id"))
      .limit(k)
  }

  /** Vocabulary coverage curve: what fraction of all token OCCURRENCES
    * the top-k most frequent types cover, at each cutoff — the
    * tokenizer/vocab-size design input (the knee of this curve is where
    * a word-level vocab stops paying for itself).
    *
    * Scale shape: one explode + map-side-combined frequency aggregate
    * (vocab-sized), a 1-row total, and a `TakeOrderedAndProject` of the
    * top max(cutoffs) types — the ONLY ordered frame is that bounded
    * top-k, ranked in a single declared partition (non-foldable constant
    * key, ≤ max cutoff rows by construction). The corpus never sorts.
    *
    * Output: (rank_cutoff INT, n_types, covered_tokens, coverage DOUBLE
    * 6-dp), one row per cutoff.
    */
  def vocabCoverage(
      df: DataFrame,
      textCol: String,
      cutoffs: Seq[Int]): DataFrame = {
    require(cutoffs.nonEmpty && cutoffs.forall(_ > 0), "cutoffs must be positive")
    val freq = df
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
    val total = freq.agg(sum(col("freq")).as("__total"))
    val top = freq.orderBy(col("freq").desc, col("token")).limit(cutoffs.max)
    val w = Window.partitionBy(pmod(xxhash64(col("token")), lit(1)))
      .orderBy(col("freq").desc, col("token"))
    val ranked = top.withColumn("__rn", row_number().over(w))
    val pieces = cutoffs.sorted.map { c =>
      ranked.filter(col("__rn") <= c)
        .agg(count(lit(1)).as("n_types"), sum(col("freq")).as("covered_tokens"))
        .select(lit(c).as("rank_cutoff"), col("n_types"), col("covered_tokens"))
    }.reduce(_.unionByName(_))
    pieces.crossJoin(broadcast(total))
      .select(col("rank_cutoff"), col("n_types"), col("covered_tokens"),
        round(col("covered_tokens").cast("double") / col("__total"), 6).as("coverage"))
  }

  /** Temperature-scaled source mixing weights — the multilingual/
    * multi-source sampling trick (`q_s ∝ p_s^α`, α < 1 upweights the
    * tail): for each source its share `p`, its temperature-flattened
    * share `q`, and the boost factor `q/p` a sampler would apply.
    * All derived values chain from 6-dp-rounded pieces, and the
    * normalizer sums 6-dp DECIMALs — association-order-exact, so the
    * report is engine-identical. O(|sources|) everything after one
    * map-side-combined count.
    *
    * Output: (source, n_docs, p, q, boost), ordered by source.
    */
  def temperatureWeights(
      df: DataFrame,
      sourceCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0, 1] expected, got $alpha")
    val counts = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).as("__t"))
    val scored = counts.crossJoin(broadcast(total))
      .withColumn("p", round(col("n_docs").cast("double") / col("__t"), 6))
      .withColumn("__w", round(pow(col("p"), lit(alpha)), 6)
        .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
    val z = scored.agg(sum(col("__w")).as("__z"))
    scored.crossJoin(broadcast(z))
      .withColumn("q", round(col("__w").cast("double") / col("__z").cast("double"), 6))
      .select(col("source"), col("n_docs"), col("p"), col("q"),
        round(col("q") / col("p"), 6).as("boost"))
      .orderBy("source")
  }

  /** Per-source document-length distribution on power-of-two buckets —
    * the pretraining length audit (context-window planning, packing
    * efficiency, truncation exposure) charted per corpus source. The
    * bucket index is `⌊log₂(max(tokens, 1))⌋` computed EXACTLY as
    * `length(bin(n)) − 1` — integer bit-length, no floating log to
    * disagree at exact powers of two across engines; 0-token docs land
    * in bucket 0 with the 1-token docs.
    *
    * One narrow scan (token count only) → one map-side-combined hash
    * aggregate on (source, bucket) — output bounded by
    * |sources| × ~40 buckets at any corpus size.
    *
    * Output: (source, bucket INT, n_docs, sum_tokens, min_tokens,
    * max_tokens).
    */
  def lengthCurves(
      df: DataFrame,
      textCol: String,
      sourceCol: String): DataFrame =
    df.select(col(sourceCol).as("source"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__nt"))
      .withColumn("bucket",
        (length(bin(greatest(col("__nt"), lit(1L)))) - 1).cast("int"))
      .groupBy(col("source"), col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("sum_tokens"),
        min(col("__nt")).as("min_tokens"),
        max(col("__nt")).as("max_tokens"))
      .orderBy("source", "bucket")

  /** Curation-funnel report — per-stage observability for the [[curate]]
    * pipeline: how many documents enter and survive each stage
    * (minimum-token quality gate → decontamination → exact dedup), as a
    * 4-row frame a pipeline dashboard can chart run-over-run. The counts
    * use exactly [[curate]]'s semantics (same token count, same
    * fingerprint, same [[decontaminate]] hit rule), so `docs_out` of the
    * last stage equals `curate(...).count()`.
    *
    * Scale shape: ONE narrow corpus scan computes token count and
    * fingerprint; contamination is [[decontaminate]]'s broadcast
    * semi-probe over the already-length-filtered frame (dropped rows pay
    * nothing downstream); everything then collapses into a single global
    * aggregate — conditional counts plus one `count(DISTINCT fp)` —
    * whose shuffle is one row per partition. No corpus-sized shuffle at
    * all: the funnel is strictly cheaper than the pipeline it audits.
    *
    * Output: (stage_ord INT, stage, docs_in, docs_out, docs_dropped),
    * stages `raw → min_tokens → decontaminate → exact_dedup`.
    */
  def curationFunnel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      eval: DataFrame,
      minTokens: Int,
      n: Int,
      maxHitNgrams: Long): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("__nt"),
      TextAnalysis.fingerprint(col(textCol)).as("__fp"))
    val contaminated = decontaminate(
        docs.filter(TextAnalysis.tokenCount(col(textCol)) >= minTokens),
        eval.select(col(textCol)), textCol, idCol, n)
      .filter(col("n_hit_ngrams") > maxHitNgrams)
      .select(col("doc_id"), lit(true).as("__contam"))
    val surviving = col("__nt") >= minTokens && col("__contam").isNull
    base.join(contaminated, Seq("doc_id"), "left_outer")
      .agg(
        count(lit(1)).as("raw"),
        count(when(col("__nt") >= minTokens, lit(1))).as("a_len"),
        count(when(surviving, lit(1))).as("a_dec"),
        countDistinct(when(surviving, col("__fp"))).as("a_dd"))
      .select(expr(
        """stack(4,
          |  1, 'raw',           raw,   raw,  CAST(0 AS BIGINT),
          |  2, 'min_tokens',    raw,   a_len, raw  - a_len,
          |  3, 'decontaminate', a_len, a_dec, a_len - a_dec,
          |  4, 'exact_dedup',   a_dec, a_dd,  a_dec - a_dd)
          |  AS (stage_ord, stage, docs_in, docs_out, docs_dropped)""".stripMargin))
      .select(col("stage_ord").cast("int").as("stage_ord"), col("stage"),
        col("docs_in"), col("docs_out"), col("docs_dropped"))
  }

  /** Data-constrained epoch plan: distribute a token budget (= the
    * corpus total, i.e. "train for as many tokens as we have, but
    * uniformly across sources") over sources, repeating scarce sources
    * up to `maxEpochs` times — the public data-constrained-scaling
    * recipe ("repeat up to ~4 epochs before returns collapse") as a
    * reproducible plan table. Per source: available tokens, the uniform
    * target, the epoch multiplier `min(target/avail, maxEpochs)`, the
    * allocation `min(target, avail·maxEpochs)` (scarce sources cap out
    * below target), and the final share of the realized mix.
    *
    * One corpus scan → one O(|sources|) aggregate; the two 1-row
    * rollups (total/k, realized-allocation sum) broadcast back onto the
    * tiny per-source frame. Token counts are exact longs; every derived
    * double is a fixed op sequence over them (no float accumulation —
    * the 2-dp allocations sum as exact decimals), rounded once.
    */
  /** Per-source unigram KL divergence from the corpus-wide distribution
    * — the domain-shift detector a mixing decision reads (a source whose
    * token distribution diverges hard from the pool is either a
    * treasure or a contamination, and either way warrants a look).
    *
    *   KL(source ‖ corpus) = Σ_t p_s(t) · ln(p_s(t) / p_c(t))
    *
    * summed over the source's own tokens (p_s > 0 by construction;
    * p_c ≥ p_s·tot_s/total > 0 always, so no smoothing is needed —
    * unlike the reverse direction, which this deliberately is not).
    *
    * One corpus scan; every aggregate after it is keyed on (source,
    * token) or token — bounded by |sources| × vocabulary, never corpus
    * rows, with map-side combine on the token explosion. The corpus
    * marginal reuses the per-source counts (no second scan). Per-term
    * values are a fixed double-op chain over exact long counts, rounded
    * to 12 dp, then summed as exact decimals — the KL total is
    * order-independent across engines and partitionings.
    */
  def sourceDivergence(df: DataFrame, textCol: String,
                       sourceCol: String): DataFrame = {
    val tk = df.select(col(sourceCol).as("source"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
    val sCnt = tk.groupBy("source", "token").agg(count(lit(1)).as("cnt"))
    val sTot = sCnt.groupBy("source").agg(
      sum(col("cnt")).as("tot"), count(lit(1)).as("vocab"))
    val cCnt = sCnt.groupBy("token").agg(sum(col("cnt")).as("ccnt"))
    val cTot = sTot.agg(sum(col("tot")).as("ctotal"))
    val ps = col("cnt").cast("double") / col("tot")
    val pc = col("ccnt").cast("double") / col("ctotal")
    sCnt.join(sTot, "source")
      .join(cCnt, "token")
      .crossJoin(broadcast(cTot))
      .withColumn("term",
        round(ps * log(ps / pc), 12)
          .cast(org.apache.spark.sql.types.DecimalType(28, 14)))
      .groupBy(col("source"))
      .agg(
        max(col("tot")).as("n_tokens"),
        max(col("vocab")).as("vocab"),
        round(sum(col("term")).cast("double"), 6).as("kl_divergence"))
  }

  def epochPlan(df: DataFrame, textCol: String, sourceCol: String,
                maxEpochs: Double = 4.0): DataFrame = {
    val perSrc = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(TextAnalysis.tokenCount(col(textCol)).cast("long"))
        .as("avail_tokens"))
    val tot = perSrc.agg(sum(col("avail_tokens")).as("total"),
      count(lit(1)).as("k"))
    val planned = perSrc.crossJoin(broadcast(tot))
      .withColumn("target_tokens",
        round(col("total").cast("double") / col("k"), 2))
      .withColumn("epochs",
        round(least(col("target_tokens") / col("avail_tokens"),
          lit(maxEpochs)), 6))
      .withColumn("allocated_tokens",
        round(least(col("target_tokens"),
          col("avail_tokens").cast("double") * maxEpochs), 2))
    val realized = planned.agg(
      sum(col("allocated_tokens")
        .cast(org.apache.spark.sql.types.DecimalType(28, 2))).as("realized"))
    planned.crossJoin(broadcast(realized))
      .select(col("source"), col("avail_tokens"), col("target_tokens"),
        col("epochs"), col("allocated_tokens"),
        round(col("allocated_tokens") / col("realized").cast("double"), 6)
          .as("share"))
  }
}

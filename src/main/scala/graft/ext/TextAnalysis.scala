package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (north-star
  * surface per SURVEY §7 / BASELINE.json; the reference itself has no text
  * operators — its row images are opaque JSON, reference: cdc_system.py:145).
  *
  * Everything here is pure `Column` algebra over Spark built-ins, so it
  * stays inside whole-stage codegen and the parquet scan only reads the
  * text column (column pruning). No UDFs, no collect — each function is a
  * narrow map, embarrassingly parallel at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokenization. `split` on a trimmed string; empty string
    * yields an empty array (guarded — Spark's split("") returns [""]).
    */
  def tokens(text: Column): Column = {
    val t = trim(text)
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-boundary tokenization: runs of letters, runs of
    * digits, and single punctuation marks each count as one token — the
    * usual cheap proxy for a byte-pair-encoded token count when the real
    * tokenizer is unavailable.
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text))

  /** Ratio of punctuation characters to total characters (0 for empty). */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    when(total === 0, lit(0.0)).otherwise(punct.cast("double") / total.cast("double"))
  }

  /** Default English stopword markers (tiny on purpose: the score only
    * needs to separate natural prose from symbol soup / boilerplate).
    */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val tk = tokens(lower(text))
    val hits = size(filter(tk, t => t.isin(stopwords: _*)))
    when(size(tk) === 0, lit(0.0)).otherwise(hits.cast("double") / size(tk).cast("double"))
  }

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column = {
    val tk = tokens(text)
    when(size(tk) === 0, lit(0.0))
      .otherwise(
        aggregate(tk, lit(0L), (acc, t) => acc + length(t).cast("long")).cast("double") /
          size(tk).cast("double"))
  }

  /** Composite document quality score in [0,1] — the standard
    * length / punctuation / stopword heuristic used to filter web text
    * before LLM training. Fixed weights keep it oracle-checkable.
    */
  def qualityScore(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(100.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    val stopScore = least(stopwordRatio(text, stopwords) * 4.0, lit(1.0))
    round(lenScore * 0.3 + punctScore * 0.3 + stopScore * 0.4, 6)
  }

  /** Language marker lexicons for the n-gram/stopword language-ID
    * heuristic. Real pipelines ship ~200 markers per language; these short
    * lists keep tests readable while exercising the same plan shape.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "y", "es", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有"))

  /** Per-language marker-hit score: number of tokens that appear in the
    * language's marker list.
    */
  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => t.isin(markers: _*)))

  /** Heuristic language ID: argmax of [[langScore]] across languages,
    * ties broken by list order (en first), "und" (undetermined) when no
    * marker hits at all. One pass, no shuffle.
    */
  def langId(text: Column, lexicons: Seq[(String, Seq[String])] = LangMarkers): Column = {
    val scores = lexicons.map { case (lang, m) => lang -> langScore(text, m) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s > 0 && s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text. Stable across runs/engines — the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Aggressive text normalization for near-exact dedup: lowercase,
    * punctuation/symbols → space, whitespace collapsed, trimmed.
    * "Hello,  World!" and "hello world" normalize identically — the
    * canonical form that catches the formatting-only duplicates
    * [[fingerprint]]'s whitespace-only normalization misses. A pure
    * narrow map (two regexes inside codegen).
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Exact-dedup key over [[normalizeText]] — the second, stronger key
    * of a two-pass exact dedup (raw fingerprint first, normalized
    * second).
    */
  def normFingerprint(text: Column): Column = md5(normalizeText(text))

  /** Sentence count: runs of terminal punctuation, floored at 1 so the
    * readability ratio is total for fragment-only docs.
    */
  def sentenceCount(text: Column): Column =
    greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))

  /** Syllable-count proxy: vowel-group runs across the lowercased text —
    * the standard cheap stand-in when no pronunciation dictionary is
    * available ("readability" ≈ 1 syllable per [aeiouy]+ run).
    */
  def syllableCountProxy(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))

  /** Flesch reading-ease score over the whitespace token count,
    * [[sentenceCount]], and [[syllableCountProxy]]:
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)`,
    * rounded to 6 dp. NULL for empty docs (words = 0 — undefined, not
    * 0). Pure narrow map: three regex passes inside one codegen stage,
    * double arithmetic in a fixed association order both engines share.
    */
  def fleschScore(text: Column): Column = {
    val w = tokenCount(text).cast("double")
    val s = sentenceCount(text).cast("double")
    val sy = syllableCountProxy(text).cast("double")
    when(w === 0, lit(null).cast("double"))
      .otherwise(round(lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (sy / w), 6))
  }

  /** 64-bit rolling hash over tokens: a left-fold xxhash64 chain
    * (`h_i = xxhash64(h_{i-1}, token_i)`) — order-sensitive, unlike
    * [[fingerprint]]'s content hash; the building block for
    * shift-resistant chunk fingerprinting. Chained hashing instead of a
    * polynomial so it stays total under ANSI mode (no long overflow).
    */
  def rollingHash(text: Column, mode: HashMode = HashMode.Engine): Column = mode match {
    case HashMode.Engine =>
      aggregate(tokens(text), lit(1125899906842597L),
        (acc, t) => xxhash64(acc, t))
    case HashMode.Portable =>
      // (acc * K + hash32(token)) mod P — order-sensitive like the xxhash64
      // chain, but reproducible by the DuckDB oracle (PortableHash.foldSql).
      PortableHash.fold(
        transform(tokens(text), t => PortableHash.hash32(t)),
        lit(PortableHash.Init))
  }

  /** Repetition statistics per document — the Gopher-style repetition
    * filters that catch degenerate web text (keyword stuffing, boilerplate
    * loops) which length/punctuation heuristics miss:
    *
    *  - `dup_token_frac`: fraction of tokens that are repeats of an
    *    earlier token (`1 - distinct/total`);
    *  - `top_2gram_frac`: fraction of all word 2-grams taken by the single
    *    most frequent 2-gram.
    *
    * The per-doc token stats are a narrow map over the token array; the
    * top-2-gram share is explode → per-(doc, gram) count → per-doc max —
    * two partial-aggregated shuffles keyed by (doc, gram) / doc, both
    * uniformly distributed at any corpus size (gram keys are doc-local,
    * so no key is ever hotter than its own document's gram count).
    *
    * The two consumers of `base` each re-tokenize (the text is scanned
    * twice) — a deliberate trade: materializing O(corpus) token arrays
    * to save a cheap column-pruned re-scan would cost more than it saves
    * at any scale where this operator matters.
    */
  /** Corpus-unigram log-probability quality score — the CCNet-style LM
    * filter with the corpus itself as the language model: token
    * probability = corpus frequency / total token count, and a document
    * scores the MEAN natural-log probability of its tokens (rounded 6 dp
    * at the boundary; empty docs surface NULL, never 0 — 0 would be the
    * BEST possible score). Gibberish and rare-token soup score far more
    * negative than fluent text; the downstream filter drops the tail.
    *
    * Shape: two corpus scans by necessity (one to build the frequency
    * table, one to score against it) — the frequency table is
    * checkpointed so its aggregate runs once and the total-token scalar
    * (a 1-row driver collect, same bound as a literal) reads the
    * checkpoint, not the corpus. Both shuffles are bounded by vocabulary
    * and doc count respectively, never corpus row count; the score uses
    * `avg(ln cnt) − ln T`, algebraically equal to the mean log
    * probability but with the scalar applied once per doc.
    */
  /** Per-document unigram entropy `H = ln(n) − (Σ c·ln c)/n` over the
    * doc's own token distribution — the low-diversity quality signal
    * orthogonal to [[lmScore]] (corpus-typicality) and
    * [[repetitionStats]] (adjacency): keyword-stuffed or template docs
    * score near 0, diverse prose near ln(n_distinct). One (doc, token)
    * aggregate then one doc-keyed aggregate, both map-side combined;
    * the identity form needs no per-doc token-count join. Empty/null
    * docs report n_tokens=0 with NULL entropy (undefined, not zero).
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val h = tf.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("s"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        round(log(col("n").cast("double")) - col("s") / col("n"), 6).as("entropy"))
    df.select(col(idCol).as("doc_id"))
      .join(h, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("entropy"))
  }

  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(tokens(lower(col(textCol)))).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    // A corpus with zero tokens (all-empty/whitespace texts) has an empty
    // frequency table and a NULL sum; every doc then takes the already
    // defined empty-doc contract (n_tokens=0, NULL lm_score) instead of
    // the scalar read throwing.
    val totRow = freq.agg(sum(col("cnt"))).head()
    if (totRow.isNullAt(0))
      return df.select(col(idCol).as("doc_id"),
        lit(0L).as("n_tokens"),
        lit(null).cast("double").as("lm_score"))
    val logT = math.log(totRow.getLong(0).toDouble)
    val scored = toks
      .join(freq, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        round(avg(log(col("cnt").cast("double"))) - logT, 6).as("lm_score"))
    df.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("lm_score"))
  }

  /** Corpus-BIGRAM LM score with add-1 smoothing — the sequence-aware
    * step up from [[lmScore]]'s unigram typicality: mean
    * `ln((C(w₁w₂)+1)/(C(w₁)+V))` over a doc's adjacent token pairs.
    * Word-salad docs whose unigrams are all common score high on
    * [[lmScore]] and low here — transition probability is the signal
    * unigrams can't see.
    *
    * Shape: training is two vocabulary-bounded aggregates off one
    * corpus scan; every bigram's ln term is resolved ONCE into a
    * vocabulary²-sparse lookup table (first-token unigram count joined
    * in, corpus V as a 1-row broadcast), so scoring is a single join of
    * doc positions against that table. Per-position terms are rounded
    * to 12 dp and DECIMAL-summed — partition-order-independent, and the
    * rounding absorbs the ≤1-ulp `ln` divergence across engines (the
    * KL-divergence recipe). Docs under 2 tokens: n_bigrams = 0, NULL
    * score.
    */
  def bigramLm(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val tk = tokens(lower(col(textCol)))
    // bigrams as zip_with over two O(n) pre-slices — the index form
    // (slice inside transform(sequence(...))) accesses array elements
    // per lambda invocation and runs INTERPRETED at ~10x cost (the
    // corpus_bigrams round-5 lesson; round-14 noop-sink timing exposed
    // this copy too: 13.2 s on the board for 500 docs). Same strings,
    // same order, same size>=2 guard — output identical.
    val base = df.select(col(idCol).as("doc_id"), tk.as("tk"))
      .select(col("doc_id"),
        when(size(col("tk")) >= 2,
          zip_with(
            slice(col("tk"), lit(1), size(col("tk")) - 1),
            slice(col("tk"), lit(2), size(col("tk")) - 1),
            (a, b) => concat_ws(" ", a, b)))
          .otherwise(array().cast("array<string>")).as("g2"))
    val pos = base.select(col("doc_id"), explode(col("g2")).as("g"))
    val cb = pos.groupBy(col("g")).agg(count(lit(1)).as("cb"))
    val cu = df.select(explode(tk).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cu"))
    val v = cu.agg(count(lit(1)).as("v"))
    val lm = cb.withColumn("w1", split(col("g"), " ").getItem(0))
      .join(cu, col("w1") === col("tok"))
      .crossJoin(broadcast(v))
      .select(col("g"),
        round(log((col("cb") + 1).cast("double") /
          (col("cu") + col("v")).cast("double")), 12)
          .cast(DecimalType(28, 12)).as("lp"))
    val scored = pos.join(lm, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp")).cast("double") / count(lit(1)), 6).as("bigram_lp"))
    df.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("bigram_lp"))
  }

  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = tokens(lower(col(textCol)))
    val base = df.select(col(idCol).as("doc_id"), tk.as("tk"))
      .select(col("doc_id"),
        size(col("tk")).as("n_tokens"),
        when(size(col("tk")) === 0, lit(0.0))
          .otherwise(round(lit(1.0) -
            size(array_distinct(col("tk"))).cast("double") /
              size(col("tk")).cast("double"), 6)).as("dup_token_frac"),
        // zip_with over pre-slices, not slice-inside-transform: the
        // index form runs interpreted (see [[bigramLm]]) — 12.4 s on
        // the round-14 noop board for this query alone.
        when(size(col("tk")) >= 2,
          zip_with(
            slice(col("tk"), lit(1), size(col("tk")) - 1),
            slice(col("tk"), lit(2), size(col("tk")) - 1),
            (a, b) => concat_ws(" ", a, b)))
          .otherwise(array().cast("array<string>")).as("g2"))
    val top = base
      .select(col("doc_id"), explode(col("g2")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(col("c")).as("top_cnt"), sum(col("c")).as("n_2grams"))
    base.select("doc_id", "n_tokens", "dup_token_frac")
      // left join: docs with < 2 tokens have no 2-grams at all
      .join(top, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"), col("dup_token_frac"),
        coalesce(round(col("top_cnt").cast("double") / col("n_2grams").cast("double"), 6),
          lit(0.0)).as("top_2gram_frac"))
  }

  /** PII patterns kept deliberately to the RE2-compatible common subset
    * (character classes, bounded repetition, `\b`) so the engine and the
    * oracle — and any other regex dialect a user swaps in — agree exactly.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII scrub: count and mask email addresses and IPv4 literals — the
    * compliance pass a training corpus runs before anything else sees it.
    * Pure per-row regex work (codegen'd built-ins): a narrow map that
    * column-prunes to the text column and never shuffles.
    *
    * Returns (id, n_emails, n_ipv4, redacted) — callers wanting a
    * compact audit trail can hash `redacted` instead of storing it.
    */
  def piiRedact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).as("n_ipv4"),
      regexp_replace(regexp_replace(t, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>")
        .as("redacted"))
  }

  /** All text statistics as one struct-producing projection, so callers
    * get every metric from a single scan of the text column.
    */
  def textStats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_bpeish_tokens", bpeishTokenCount(t))
      .withColumn("avg_token_len", round(avgTokenLen(t), 6))
      .withColumn("punct_ratio", round(punctRatio(t), 6))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 6))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_guess", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }

  /** PMI-ranked collocations: adjacent lowercase token pairs scored by
    * pointwise mutual information — `ln(P(ab) / (P(a)·P(b)))` with pair
    * probabilities over the bigram total and word probabilities over the
    * unigram total — the standard "which word pairs co-occur far more
    * than chance" measure used for phrase mining and tokenizer-merge
    * candidates (the statistical cousin of [[graft.ext.Bpe]]'s
    * frequency-greedy merges).
    *
    * Shape: the corpus is scanned once for bigrams and once for unigrams
    * (both explode → map-side-combined hash aggregates); the join of
    * pair counts to the two word-count sides is vocabulary-sized, never
    * corpus-sized, and the `minCount` filter prunes the pair frame
    * BEFORE the join. The PMI double is rounded to 6 dp before the
    * rank/filter boundary (float-compare rule).
    */
  def pmiCollocations(df: DataFrame, textCol: String, minCount: Long): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val bigrams = df
      .select(when(size(toks) >= 2,
          zip_with(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>")).as("g2"))
      .select(explode(col("g2")).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n_ab"))
    val unigrams = df
      .select(explode(toks).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_w"))
    val nPairs = bigrams.agg(sum(col("n_ab")).as("__n_pairs"))
    bigrams
      .filter(col("n_ab") >= minCount)
      .join(unigrams.select(col("w").as("w1"), col("n_w").as("__n1")), "w1")
      .join(unigrams.select(col("w").as("w2"), col("n_w").as("__n2")), "w2")
      .crossJoin(broadcast(nPairs))
      .select(
        col("w1"), col("w2"), col("n_ab"),
        round(log(col("n_ab").cast("double") * col("__n_pairs") /
          (col("__n1").cast("double") * col("__n2"))), 6).as("pmi"))
  }

  /** CCNet-style perplexity bucketing: split each language's documents
    * into head / middle / tail thirds by LM score ([[lmScore]] — higher
    * = more natural text), the standard quality-tiering step before
    * mixing (train mostly on head+middle, sample the tail). `ntile(3)`
    * runs per language ordered by `(lm_score DESC, doc_id)` — the score
    * is already 6-dp-rounded, so the total order (and therefore every
    * bucket boundary) is engine-identical; ties break by id. Documents
    * with NULL score (empty docs) get a NULL bucket — unscorable is not
    * a quality tier.
    *
    * Cost on top of the LM scoring itself: ONE per-language window over
    * (id, score) pairs. At extreme per-language cardinality the same
    * contract is served by percentile-cut bucketing (the
    * [[graft.ext.Segmentation.rfmApprox]] swap documented there).
    */
  def perplexityBuckets(
      df: DataFrame, idCol: String, textCol: String, langCol: String): DataFrame = {
    val scored = df.select(col(idCol).as("doc_id"), col(langCol).as("lang"))
      .join(lmScore(df, idCol, textCol), Seq("doc_id"))
    val hasScore = scored.filter(col("lm_score").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("lm_score").desc, col("doc_id"))
    val bucketed = hasScore
      .withColumn("t", ntile(3).over(w))
      .withColumn("bucket",
        when(col("t") === 1, "head").when(col("t") === 2, "middle")
          .otherwise("tail"))
      .drop("t")
    bucketed.unionByName(
      scored.filter(col("lm_score").isNull)
        .withColumn("bucket", lit(null).cast("string")))
  }

  /** Gopher-style composite quality gate: the rule-based document filter
    * every web-scale corpus passes through before dedup (Gopher §A1.1 /
    * C4 / RefinedWeb) — word-count bounds, mean-word-length bounds, and
    * a minimum stopword-hit count, composed as ONE narrow map over the
    * text column (one tokenization, all rules from it; no shuffle, no
    * UDF — `length(concat_ws)` gives the summed token length inside
    * codegen, avoiding a per-element lambda).
    *
    * Returns every document with its metrics, each rule's verdict, and
    * the composite `keep` — the observability-first shape (drop REASONS,
    * not just survivors): downstream picks `filter(col("keep"))` or logs
    * the per-rule kill counts. An empty/whitespace document has
    * `n_words = 0`, NULL `mean_word_len`, and fails the word-count rule
    * (its NULL mean-length verdict coalesces to false — empty docs are
    * dropped, not NULL-propagated).
    *
    * Stopword matching is lowercase whole-token equality with
    * multiplicity (count of stopword OCCURRENCES, Gopher's definition),
    * against a caller-supplied list small enough to ride in the plan as
    * a literal.
    */
  def qualityFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int,
      maxWords: Int,
      minMeanWordLen: Double,
      maxMeanWordLen: Double,
      minStopHits: Int,
      stopwords: Seq[String]): DataFrame = {
    val toks = tokens(col(textCol))
    val ltoks = tokens(lower(col(textCol)))
    val nWords = size(toks).cast("long")
    val meanWl = when(nWords > 0,
      round(length(concat_ws("", toks)).cast("double") / nWords.cast("double"), 6))
    val stopHits = size(filter(ltoks, t => t.isInCollection(stopwords))).cast("long")
    df.select(
        col(idCol),
        nWords.as("n_words"),
        meanWl.as("mean_word_len"),
        stopHits.as("stop_hits"))
      .withColumn("pass_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("pass_word_len",
        coalesce(col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen, lit(false)))
      .withColumn("pass_stopwords", col("stop_hits") >= minStopHits)
      .withColumn("keep",
        col("pass_words") && col("pass_word_len") && col("pass_stopwords"))
  }
}

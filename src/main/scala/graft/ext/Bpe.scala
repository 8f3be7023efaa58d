package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding (BPE) training and encoding — the
  * tokenizer-learning step of an LLM data pipeline, built the way BPE is
  * actually trained at corpus scale: the corpus collapses to its
  * word-frequency table FIRST (one map-side-combined aggregate — the only
  * pass that ever touches corpus-sized data), and every merge iteration
  * then runs over the VOCABULARY-sized frame, so training cost is
  * independent of corpus size beyond that single scan. Reference scope:
  * the reference engine has no tokenizer surface; this extends the text
  * tier the same way the ANN/sketch tiers extend it.
  *
  * Semantics are classic word-level BPE (Sennrich et al. 2016, public
  * algorithm): words start as character sequences; each iteration merges
  * the most frequent adjacent symbol pair (ties broken by pair lexical
  * order for cross-engine determinism), applied greedily left-to-right
  * within each word. No end-of-word marker is appended (documented
  * simplification; the marker is one `concat` away).
  *
  * Scale notes: the per-iteration top-1 pair is a driver collect of ONE
  * row (codebook-pattern, like IVF centroids); the symbol frame is
  * `localCheckpoint`ed per iteration so the plan does not nest k
  * higher-order-function applications deep. The interpreted-lambda cost
  * of the fold rides only on the vocabulary frame, never the corpus.
  *
  * Two trainers share the semantics:
  *
  *  - [[train]] — every iteration is a Spark job over the symbol frame.
  *    Measured driver-loop bound (round 7, sf0.1, local[32]):
  *    **6.05 merges/s** (~165 ms/merge for two vocab-sized jobs +
  *    checkpoint). Exact greedy BPE is inherently serial — merge i+1's
  *    argmax depends on merge i — and batching top-P pairs per round
  *    changes the trained vocabulary (pairs CREATED by merge i can
  *    outrank pair i+1), so the distributed loop cannot be
  *    round-batched without changing results.
  *  - [[trainInMemory]] — the codebook pattern applied to tokenizer
  *    training: the same corpus-collapsing scan, then the vocab-sized
  *    (word, freq) table is COLLECTED and the greedy loop runs on the
  *    driver with incremental pair-count maintenance — bit-identical
  *    merges/vocab to [[train]] (same argmax, same tie-break) at
  *    thousands of merges/s, the way production BPE trainers work
  *    (the word-count table, not the corpus, is the training input).
  *    Driver memory is bounded by the RETAINED vocabulary: at 100 TB
  *    apply the `minFreq` floor (sub-floor words cannot influence any
  *    merge that matters at vocab sizes of interest) and/or `maxWords`
  *    cap; with neither knob the distributed [[train]] remains the
  *    unbounded-vocab fallback.
  */
object Bpe {

  /** Word-frequency table `(word, freq)` over lowercased whitespace
    * tokens — the corpus-collapsing scan.
    */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** One greedy left-to-right merge pass of the pair (l, r) over a
    * symbol array: the accumulator's last symbol merges with the current
    * one iff they equal (l, r) — merging consumes the right symbol, so
    * overlapping occurrences resolve exactly as sequential BPE does
    * ("aaa" under (a,a) → [aa, a], never [a, aa] or [aa, aa]).
    */
  private def mergeOnce(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === l && x === r,
        concat(slice(acc, lit(1), size(acc) - 1), array(concat(element_at(acc, -1), x))))
        .otherwise(concat(acc, array(x))))

  /** Adjacent-pair frequencies of the current symbol table: one row per
    * (left, right) with the summed word frequency.
    */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      // single-symbol words have no adjacent pair; the filter also keeps
      // the explode's sequence(1, n-1) ascending (Spark's sequence runs
      // DESCENDING when start > stop — it would fabricate index 0)
      .filter(size(col("syms")) >= 2)
      .select(col("freq"),
        col("syms"),
        explode(sequence(lit(1), size(col("syms")) - 1)).as("ix"))
      .select(element_at(col("syms"), col("ix")).as("l"),
        element_at(col("syms"), col("ix") + 1).as("r"),
        col("freq"))
      .groupBy("l", "r")
      .agg(sum(col("freq")).as("f"))

  /** The trained state: ranked merges plus the final word → symbols
    * table (the lookup [[encode]] joins against).
    */
  final case class Trained(merges: Seq[(Int, String, String, Long)], wordSyms: DataFrame)

  /** Train `numMerges` BPE merges over the corpus. Returns the ranked
    * merge list (1-based rank, left, right, pair frequency) and the
    * final word → symbols table.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int): Trained = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    var words = wordFreq(df, textCol)
      .withColumn("syms",
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      // one-row driver collect per iteration (codebook pattern); ties
      // broken lexically so both engines pick the same pair
      val top = pairCounts(words)
        .orderBy(col("f").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, f))
        words = words
          .withColumn("syms", mergeOnce(col("syms"), l, r))
          .localCheckpoint(true)
        rank += 1
      }
    }
    Trained(merges.result(), words.select(col("word"), col("freq"), col("syms")))
  }

  /** Unicode-code-point string comparison — equal to UTF-8 byte order,
    * which is what Spark's and DuckDB's binary string ORDER BY use.
    * Scala's `String.compareTo` is UTF-16 code-UNIT order, which ranks
    * supplementary-plane characters (surrogate pairs) below U+E000..FFFF
    * — a tie-break divergence the in-memory trainer must not have.
    */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Exact greedy BPE trained on the COLLECTED word-frequency table —
    * same merges, same final vocabulary, same tie-breaks as [[train]]
    * (the equivalence is spec-asserted), at driver speed: pair counts
    * are maintained INCREMENTALLY (only words containing the merged
    * pair are touched, and only their changed adjacencies are
    * re-counted), so a merge costs O(occurrences), not O(vocabulary).
    *
    * Scale contract: the corpus-sized work is still the ONE distributed
    * `wordFreq` scan; what is collected is the (word, freq) table after
    * the `minFreq` floor and `maxWords` cap — the same bounded-codebook
    * argument as the IVF centroid collect. `maxWords` keeps the top
    * words by (freq DESC, word) so the cap is deterministic. With a
    * floor/cap the trained merges can differ from the uncapped run
    * (rare-word pairs stop counting); the registered queries train under
    * an explicit `maxWords` bound whose oracle twins replay the IDENTICAL
    * cap (same freq-desc/word order, same limit), so the trajectory is
    * hash-comparable at any SF while the collect stays provably bounded.
    */
  def trainInMemory(df: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 1L, maxWords: Option[Int] = None): Trained = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val wfBase = wordFreq(df, textCol).filter(col("freq") >= minFreq)
    val wf = maxWords match {
      case Some(n) => wfBase.orderBy(col("freq").desc, col("word")).limit(n)
      case None => wfBase
    }
    val rows = wf.collect()
    val freqs = new Array[Long](rows.length)
    val syms = new Array[Array[String]](rows.length)
    val words = new Array[String](rows.length)
    var w = 0
    while (w < rows.length) {
      words(w) = rows(w).getString(0)
      freqs(w) = rows(w).getLong(1)
      // word → its character symbols, by Unicode code point (substr in
      // [[train]] slices UTF-16 units; for words containing
      // supplementary characters code-point splitting is the faithful
      // "character" — the distributed twin only ever sees BMP text in
      // the registered corpora, where the two agree)
      syms(w) = words(w).codePoints().toArray.map(cp => Character.toString(cp))
      w += 1
    }
    import scala.collection.mutable
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addWordPairs(i: Int, sign: Long): Unit = {
      val s = syms(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * freqs(i)
        if (c == 0L) { pairCount.remove(p); pairWords.get(p).foreach(_.remove(i)) }
        else {
          pairCount(p) = c
          if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
        }
        j += 1
      }
      if (sign < 0) {
        // membership cleanup: a pair may survive globally but leave this
        // word — recompute membership from the (about-to-change) symbols
        var k = 0
        while (k < s.length - 1) {
          pairWords.get((s(k), s(k + 1))).foreach(_.remove(i))
          k += 1
        }
      }
    }
    var i = 0
    while (i < syms.length) { addWordPairs(i, 1L); i += 1 }
    def mergeWord(s: Array[String], l: String, r: String): Array[String] = {
      val acc = mutable.ArrayBuffer.empty[String]
      var j = 0
      while (j < s.length) {
        if (acc.nonEmpty && acc.last == l && s(j) == r)
          acc(acc.length - 1) = l + r
        else acc += s(j)
        j += 1
      }
      acc.toArray
    }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      if (pairCount.isEmpty) exhausted = true
      else {
        // argmax with the [[train]] tie-break: freq DESC, then (l, r)
        // ascending in binary (code-point) order
        var best: ((String, String), Long) = null
        pairCount.foreach { e =>
          if (best == null || e._2 > best._2 ||
              (e._2 == best._2 && {
                val cl = cpCompare(e._1._1, best._1._1)
                cl < 0 || (cl == 0 && cpCompare(e._1._2, best._1._2) < 0)
              })) best = e
        }
        val ((l, r), f) = best
        merges += ((rank, l, r, f))
        val affected = pairWords.getOrElse((l, r), mutable.Set.empty).toArray
        affected.foreach { wi =>
          addWordPairs(wi, -1L)
          syms(wi) = mergeWord(syms(wi), l, r)
          addWordPairs(wi, 1L)
        }
        pairCount.remove((l, r))
        pairWords.remove((l, r))
        rank += 1
      }
    }
    val spark = df.sparkSession
    import spark.implicits._
    val wordSyms = words.indices
      .map(k => (words(k), freqs(k), syms(k).toSeq))
      .toSeq.toDF("word", "freq", "syms")
    Trained(merges.result(), wordSyms)
  }

  /** Per-document BPE token count under a trained merge table: explode
    * each document's words and sum the symbol counts from the trained
    * word → symbols lookup. The join is vocabulary-vs-corpus — the small
    * side broadcasts — and documents with no tokens (null/empty text)
    * report 0.
    *
    * Output: idCol ++ (n_words BIGINT, n_bpe_tokens BIGINT).
    */
  def encode(df: DataFrame, idCol: String, textCol: String, trained: Trained): DataFrame = {
    val lookup = trained.wordSyms.select(col("word"), size(col("syms")).cast("long").as("__n"))
    val toks = df.select(col(idCol),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("word"))
      .join(lookup, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__n")).as("n_bpe_tokens"))
    df.select(col(idCol))
      .join(toks, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }
}

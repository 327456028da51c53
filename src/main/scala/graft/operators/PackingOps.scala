package graft.operators

import graft.core.Tables
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Corpus packing / budget-sampling operators — the "assemble the training
  * mix" layer that runs after text analysis and dedup: pack documents into
  * fixed-token-budget chunks (the GPT-style concat-then-chunk batch shape)
  * and draw a deterministic token-budget sample of the corpus.
  *
  * Both are built on one primitive, a GLOBAL exclusive running total in a
  * deterministic key order. The naive formulation — `sum(v) OVER (ORDER BY
  * key ROWS UNBOUNDED PRECEDING)` — moves the whole corpus through one
  * partition (the same hazard `CoreQueries.rowIdsStable` avoids), so the
  * primitive here computes it with range partitioning + two parallel
  * passes instead; only #partitions longs ever reach the driver.
  */
object PackingOps {

  /** Exclusive global running total of `valueCol` (must be LongType) in
    * ascending `keyCol` order, WITHOUT a single-partition window: range-
    * partition + sort by the key, sum each partition (pass 1, one long per
    * partition to the driver), prefix-sum those into per-partition offsets,
    * then stream each partition adding its offset (pass 2). Both passes are
    * fully parallel — the same two-pass shape as `RDD.zipWithIndex`.
    *
    * Cost of the two passes: the upstream compute and the shuffle WRITE run
    * once (Spark reuses shuffle files across the two jobs — the map stage
    * is skipped on pass 2); what re-executes per pass is the reduce side:
    * shuffle fetch + within-partition sort. `checkpoint = true` trades that
    * repeated fetch+sort for one executor-storage materialization of the
    * arranged frame (`localCheckpoint`), which both passes then read — the
    * right trade at 100 TB where the sort dominates; at test scale the
    * default skips the cache. Result is identical either way (spec-pinned)
    * and independent of partition boundaries because the key is unique and
    * globally range-sorted.
    */
  def exclusiveRunningTotal(df: DataFrame, keyCol: String, valueCol: String,
                            outCol: String, checkpoint: Boolean = false): DataFrame = {
    require(df.schema(valueCol).dataType == LongType,
      s"$valueCol must be LongType (got ${df.schema(valueCol).dataType})")
    val spark = df.sparkSession
    val arranged0 = df.repartitionByRange(col(keyCol)).sortWithinPartitions(keyCol)
    val arranged = if (checkpoint) arranged0.localCheckpoint(true) else arranged0
    val valueIdx = arranged.schema.fieldIndex(valueCol)
    val rowRdd = arranged.rdd
    val partSums = rowRdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(valueIdx))
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val out = rowRdd.mapPartitionsWithIndex { (i, it) =>
      var run = offsets(i)
      it.map { r =>
        val c = run
        run += r.getLong(valueIdx)
        Row.fromSeq(r.toSeq :+ c)
      }
    }
    spark.createDataFrame(out, arranged.schema.add(outCol, LongType, nullable = false))
  }

  /** Per-group variant of [[exclusiveRunningTotal]]: the exclusive running
    * total of `valueCol` within each `groupCol` (StringType), ordered by
    * `keyCol` — WITHOUT `sum() OVER (PARTITION BY group ORDER BY key)`,
    * which funnels each group through ONE task and dies when a group is
    * large (exactly the mixture-sampling case: few sources, huge corpora).
    * Rows are range-partitioned by (group, key) — a group may span several
    * consecutive partitions — then the same two passes run with per-
    * (partition, group) sums; the driver holds O(#partitions × #groups
    * touching a boundary) longs. Same `checkpoint` knob and trade as
    * [[exclusiveRunningTotal]].
    */
  def exclusiveRunningTotalPerGroup(df: DataFrame, groupCol: String,
                                    keyCol: String, valueCol: String,
                                    outCol: String, checkpoint: Boolean = false): DataFrame = {
    require(df.schema(valueCol).dataType == LongType,
      s"$valueCol must be LongType (got ${df.schema(valueCol).dataType})")
    require(df.schema(groupCol).dataType == StringType,
      s"$groupCol must be StringType (got ${df.schema(groupCol).dataType})")
    val spark = df.sparkSession
    val arranged0 = df.repartitionByRange(col(groupCol), col(keyCol))
      .sortWithinPartitions(groupCol, keyCol)
    val arranged = if (checkpoint) arranged0.localCheckpoint(true) else arranged0
    val gIdx = arranged.schema.fieldIndex(groupCol)
    val vIdx = arranged.schema.fieldIndex(valueCol)
    val rowRdd = arranged.rdd
    val partGroupSums = rowRdd
      .mapPartitionsWithIndex { (i, it) =>
        val m = scala.collection.mutable.Map.empty[String, Long]
        it.foreach { r =>
          val g = r.getString(gIdx)
          m.update(g, m.getOrElse(g, 0L) + r.getLong(vIdx))
        }
        Iterator((i, m.toMap))
      }
      .collect().sortBy(_._1)
    // offsets(i)(g) = total of group g in partitions before i; correct
    // because the range partitioning puts a group's rows in ascending key
    // order across consecutive partitions
    val running = scala.collection.mutable.Map.empty[String, Long]
    val offsets: Array[Map[String, Long]] = partGroupSums.map { case (_, m) =>
      val snapshot = m.keys.map(g => g -> running.getOrElse(g, 0L)).toMap
      m.foreach { case (g, s) => running.update(g, running.getOrElse(g, 0L) + s) }
      snapshot
    }
    val out = rowRdd.mapPartitionsWithIndex { (i, it) =>
      val run = scala.collection.mutable.Map(offsets(i).toSeq: _*)
      it.map { r =>
        val g = r.getString(gIdx)
        val c = run.getOrElse(g, 0L)
        run.update(g, c + r.getLong(vIdx))
        Row.fromSeq(r.toSeq :+ c)
      }
    }
    spark.createDataFrame(out, arranged.schema.add(outCol, LongType, nullable = false))
  }

  /** Concat-then-chunk sequence packing: documents in stable doc_id order
    * are laid head-to-tail and cut into `binTokens`-sized chunks; a
    * document's bin is `floor(exclusive_prefix / binTokens)` — the
    * deterministic streaming pack (documents may straddle a boundary; the
    * bin is where the document STARTS). Emits per-bin stats: doc count and
    * token total. Fully oracle-expressible as a window cumulative sum.
    */
  def packConcatChunks(t: Tables, binTokens: Long = 1024): DataFrame = {
    val tk = t.documents.select(
      col("doc_id"),
      size(tokens(col("text"))).cast(LongType).as("n_tok"))
    exclusiveRunningTotal(tk, "doc_id", "n_tok", "cum0")
      .withColumn("bin_id", floor(col("cum0") / binTokens))
      .groupBy("bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("bin_tokens"))
      .orderBy("bin_id")
  }

  /** Deterministic token-budget sample: documents are ordered by
    * md5(doc_id) — a seeded-shuffle stand-in that both engines compute
    * bit-identically — and taken while the exclusive token prefix is under
    * `budget` (the classic stop-after-crossing rule: the crossing document
    * is included, nothing after it). The "give me ~N tokens of this
    * corpus, reproducibly" operator.
    */
  def sampleTokenBudget(t: Tables, budget: Long = 8000): DataFrame = {
    val tk = t.documents.select(
      col("doc_id"),
      size(tokens(col("text"))).cast(LongType).as("n_tok"),
      md5(col("doc_id").cast(StringType)).as("shuffle_key"))
    exclusiveRunningTotal(tk, "shuffle_key", "n_tok", "cum0")
      .filter(col("cum0") < budget)
      .select("doc_id", "n_tok")
  }

  /** [[sampleTokenBudget]] restated on BPE-ENCODED token counts
    * (round-14, the round-13 verdict's optional half of the tokenizer
    * lifecycle): the budget a training run actually spends is encoded
    * tokens — what the trained tokenizer emits — not whitespace words,
    * and after only 5 merges the two differ by ~4× (encoded ≈ chars), so
    * a word-budgeted sample materially overshoots the real token bill.
    * Same md5(doc_id) shuffle order and stop-after-crossing rule over
    * the same distributed exclusive prefix sum; only the per-doc count
    * column changes ([[TextOps.bpeEncodedDocTokens]]). Fully hash-gated:
    * the oracle composes the BPE training/encoding CTEs with the
    * existing running-total statement.
    */
  def sampleTokenBudgetEncoded(t: Tables, budget: Long = 40000): DataFrame = {
    val tk = TextOps.bpeEncodedDocTokens(t)
      .select(col("doc_id"), col("n_tok"),
        md5(col("doc_id").cast(StringType)).as("shuffle_key"))
    exclusiveRunningTotal(tk, "shuffle_key", "n_tok", "cum0")
      .filter(col("cum0") < budget)
      .select("doc_id", "n_tok")
  }

  /** Deterministic mixture sampling: each source contributes up to
    * `perSourceBudget` tokens, drawn in md5(doc_id) shuffle order with the
    * same stop-after-crossing rule — the "assemble a training mix with
    * fixed per-source token ratios, reproducibly" operator. Built on the
    * per-group running total, so no per-source single-task window even
    * when one source is most of the corpus.
    */
  def sampleMixture(t: Tables, perSourceBudget: Long = 600): DataFrame = {
    val tk = t.documents.select(
      col("doc_id"), col("source"),
      size(tokens(col("text"))).cast(LongType).as("n_tok"),
      md5(col("doc_id").cast(StringType)).as("shuffle_key"))
    exclusiveRunningTotalPerGroup(tk, "source", "shuffle_key", "n_tok", "cum0")
      .filter(col("cum0") < perSourceBudget)
      .select("doc_id", "source", "n_tok")
  }

  /** TEMPERATURE-scaled mixture sampling — the multilingual-LLM staple
    * (sampling rate ∝ sourceShare^α, α < 1, so low-resource sources are
    * up-weighted relative to their raw share; Conneau & Lample 2019 §3.1
    * use α = 0.5–0.7): per-source token budgets proportional to
    * sqrt(source tokens), normalized to `totalBudget`, then each source's
    * draw proceeds in the same md5(doc_id) shuffle order and
    * stop-after-crossing rule as [[sampleMixture]].
    *
    * Cross-engine exactness (what lets the gate hash-check the BUDGET
    * arithmetic, not just the draw): the α = 1/2 weight is the
    * correctly-rounded IEEE `sqrt` — no transcendental — QUANTIZED to an
    * integer micro-weight v = floor(sqrt(n_tok)·10⁶ + 0.5); the
    * normalizer S = Σ v is an exact long sum (order-independent), and
    * budget = floor((totalBudget·v)/S) is integer-valued doubles under
    * one division. Every step is restated verbatim in the DuckDB oracle.
    * (Arbitrary α needs `pow`, whose low bits vary across libm builds —
    * an engine-side variant would be deterministic per engine but not
    * hash-gateable; α = 1/2 is the common production choice and the one
    * this gate pins.)
    *
    * Scale shape: one tiny per-source aggregate (|sources| rows,
    * broadcast back), then the [[exclusiveRunningTotalPerGroup]] draw —
    * no per-source single-task window even when one source dominates.
    * Budget flooring under-allocates at most |sources| tokens.
    */
  def sampleMixtureTemperature(t: Tables, totalBudget: Long = 8000L): DataFrame = {
    val tk = t.documents.select(
      col("doc_id"), col("source"),
      size(tokens(col("text"))).cast(LongType).as("n_tok"),
      md5(col("doc_id").cast(StringType)).as("shuffle_key"))
    val v = tk.groupBy("source")
      .agg(sum("n_tok").as("src_tok"))
      .withColumn("v",
        floor(sqrt(col("src_tok").cast("double")) * lit(1000000.0) + lit(0.5)))
    val s = v.agg(sum("v").as("sv"))
    val budgets = v.crossJoin(broadcast(s))
      .withColumn("budget",
        floor((col("v") * totalBudget).cast("double") / col("sv").cast("double")))
      .select("source", "budget")
    exclusiveRunningTotalPerGroup(tk, "source", "shuffle_key", "n_tok", "cum0")
      .join(broadcast(budgets), Seq("source"))
      .filter(col("cum0") < col("budget"))
      .select("doc_id", "source", "n_tok", "budget")
  }

  /** Training-shard manifest (round 14): assign every document to one of
    * `shards` fixed shards by the exact [[md5Uniform]] hash and emit the
    * per-shard manifest (docs, whitespace tokens, chars) a training
    * launcher schedules from — the deterministic "shuffle and shard" step
    * that runs after packing. Hash sharding instead of ntile-over-a-sort
    * on purpose: ntile needs a global row numbering (a global sort at
    * 100 TB), while shard = floor(shards·u) is one md5 + 13 exact IEEE
    * adds + one exponent-shift multiply per row — embarrassingly
    * parallel, so the ONLY exchange is the final `shards`-group rollup
    * (partial-aggregated map-side to `shards` rows per task), and the
    * assignment replays bit-for-bit on any engine or partitioning.
    * `shards` must be a power of two so `shards·u` stays exact (u carries
    * ≤ 48 fractional bits; the multiply only shifts the exponent), making
    * `floor` deterministic across engines; `least(·, shards−1)` guards
    * the u = 1.0 all-'f'-digest edge identically on both sides. Shard
    * balance is binomial-tight by md5 uniformity — and the gate hashes
    * the manifest VALUES against DuckDB, not a balance boolean.
    */
  def shardManifest(t: Tables, shards: Int = 8): DataFrame = {
    require(shards > 0 && (shards & (shards - 1)) == 0,
      s"shards must be a power of two for exact floor(shards*u), got $shards")
    t.documents
      .select(
        size(tokens(col("text"))).cast(LongType).as("n_tok"),
        col("n_chars"),
        md5(col("doc_id").cast(StringType)).as("h"))
      .select(col("n_tok"), col("n_chars"),
        least(floor(md5Uniform(col("h")) * shards), lit(shards - 1))
          .cast("int").as("shard_id"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        sum("n_chars").as("sum_chars"))
      .orderBy("shard_id")
  }

  /** Uniform in (0, 1] from the first 12 hex nibbles of a lowercase md5
    * column: u = Σₚ nib(p) / 16^(p+1), plus 16⁻¹² so an all-zero prefix
    * can't yield u = 0 (a zero priority would outrank every weight).
    * Every term is a 4-bit numerator over a power of two and every
    * partial sum fits 48 fractional bits, so each operation is EXACT in
    * IEEE-754 doubles — any engine computes the identical bits in any
    * evaluation order. Nibbles decode with the same ascii arithmetic as
    * [[DedupOps.simhashDupPairs]] (decoded once per char, not per bit).
    */
  private[operators] def md5Uniform(h: Column): Column =
    (0 until 12).map { p =>
      val a = ascii(substring(h, p + 1, 1))
      val nb = when(a >= 97, a - 87).otherwise(a - 48)
      nb.cast("double") / lit(math.pow(16.0, (p + 1).toDouble))
    }.reduce(_ + _) + lit(math.pow(16.0, -12.0))

  /** Deterministic weighted sampling without replacement — sequential
    * Poisson sampling (Ohlsson 1998; Rosén's order πps family): each
    * document draws priority q = u / w from a reproducible md5-derived
    * uniform u and weight w = n_chars + 1, and the k smallest priorities
    * are the sample, so inclusion probability is approximately
    * proportional to size. The "sample the corpus toward long documents,
    * reproducibly on any engine/partitioning" operator — the
    * quality-weighted cousin of the equal-weight [[TextOps.hashSamplePerLang]].
    *
    * Chosen over the better-known Efraimidis–Spirakis A-ES keys
    * (u^(1/w), i.e. ln(u)/w) deliberately: A-ES needs a transcendental,
    * whose low bits differ across libm builds, while u / w is ONE
    * correctly-rounded IEEE division over the exact [[md5Uniform]] — so
    * the gate hash-matches DuckDB bit-for-bit with no rounding tricks.
    *
    * Scale shape: embarrassingly parallel scan (md5 + 13 exact adds + a
    * divide per row), then global top-k = TakeOrderedAndProject — each
    * task keeps k rows, the driver merges #partitions·k, the corpus never
    * shuffles (plan spec-asserted). At 100 TB with k in the millions, use
    * [[weightedSampleTau]] — τ from a quantile sketch instead of the
    * limit; same priorities, same sample, fully distributed (gated
    * equivalent: `sample_weighted_tau` shares this gate's oracle).
    */
  /** The shared sequential-Poisson priority projection: one md5, 13 exact
    * adds, one correctly-rounded division per row — embarrassingly
    * parallel, no shuffle. Both the top-k path ([[weightedSample]]) and
    * the τ-threshold scale path ([[weightedSampleTau]]) rank exactly
    * these columns.
    */
  private def poissonPriorities(t: Tables): DataFrame =
    t.documents
      .select(
        col("doc_id"),
        (col("n_chars") + 1L).cast("double").as("weight"),
        md5(col("doc_id").cast(StringType)).as("h"))
      .select(col("doc_id"), col("weight"),
        (md5Uniform(col("h")) / col("weight")).as("priority"))

  def weightedSample(t: Tables, k: Int = 100): DataFrame =
    poissonPriorities(t)
      .orderBy(col("priority"), col("doc_id"))
      .limit(k)

  /** The τ-threshold scale path [[weightedSample]]'s scaladoc promises:
    * with k in the millions, TakeOrderedAndProject's per-task k-row
    * buffers and the driver's #partitions·k merge stop being free, so
    * production draws the SAME sample fully distributed — estimate τ, the
    * k/n-quantile of the priorities, from a Greenwald–Khanna sketch with
    * headroom (4k/n at relativeError 1e-3), keep `priority <= τ`, and
    * rank only the survivors. Because priorities are the identical
    * bit-exact doubles, "filter survivors contains ≥ k rows" PROVES
    * τ ≥ the k-th smallest priority, hence the survivor set is a superset
    * of the top-k and the re-rank returns EXACTLY [[weightedSample]]'s
    * rows (ties broken by the same doc_id order) — which is why this gate
    * shares the top-k oracle verbatim.
    *
    * The sketch can under-shoot only when 0.001·n outruns the 4k
    * headroom, so an escalation ladder (quantile ×4 per rung up to 1.0)
    * backs the primary estimate — but naively each rung would re-scan
    * the corpus, O(log(n/k)) full passes at 100 TB. Instead the WHOLE
    * ladder is resolved in a fixed THREE passes regardless of n and k:
    * one sketch pass returning every rung's τ candidate, one aggregate
    * counting all rungs' survivors simultaneously (a conditional-sum per
    * rung inside a single codegen'd aggregation), then the filter at the
    * first sufficient rung + the ~4k-row re-rank. The count pass also
    * makes the choice EXACT: the chosen τ provably covers ≥ k rows
    * before the filter runs. Survivor cardinality is ~4k, so the final
    * orderBy touches a vanishing fraction of the corpus.
    */
  def weightedSampleTau(t: Tables, k: Int = 100): DataFrame = {
    val pri = poissonPriorities(t)
    val n = t.documents.count()
    // empty corpus: approxQuantile has nothing to sketch (returns an
    // empty array) — the ranked-empty frame IS the sample
    if (n == 0L) return pri.orderBy(col("priority"), col("doc_id")).limit(k)
    // the ladder: 4k/n, 16k/n, … capped at 1.0 (always included so the
    // last rung degenerates to "everything" and the choice below can't
    // fail even when k > n)
    val ladder = (Iterator
      .iterate(math.min(1.0, 4.0 * k / n))(f => math.min(1.0, f * 4.0))
      .takeWhile(_ < 1.0) ++ Iterator(1.0)).toArray
    val taus = pri.stat.approxQuantile("priority", ladder, 1e-3)
    val counts = pri.agg(
      sum(when(col("priority") <= taus.head, 1L).otherwise(0L)),
      taus.tail.map(tau =>
        sum(when(col("priority") <= tau, 1L).otherwise(0L))): _*)
      .head()
    val chosen = taus.indices
      .find(i => counts.getLong(i) >= k)
      .getOrElse(taus.length - 1)
    pri.filter(col("priority") <= taus(chosen))
      .orderBy(col("priority"), col("doc_id"))
      .limit(k)
  }

  /** Per-GROUP weighted sampling: the k smallest sequential-Poisson
    * priorities within each language — the weighted cousin of
    * [[TextOps.hashSamplePerLang]], completing the sampling matrix
    * (equal-weight global / equal-weight per group / weighted global /
    * weighted per group). Same bit-exact priorities as
    * [[weightedSample]]; the per-group top-k is a rank window over the
    * lang hash partitioning. Scale note: one shuffle on the group key;
    * Spark inserts WindowGroupLimit below the exchange (spec-asserted),
    * so each map task forwards at most k rows per group it sees — a
    * dominant language costs its reduce task k·#maps rows, not the
    * group's corpus share.
    */
  def weightedSamplePerGroup(t: Tables, k: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("priority"), col("doc_id"))
    t.documents
      .select(
        col("lang"), col("doc_id"),
        (col("n_chars") + 1L).cast("double").as("weight"),
        md5(col("doc_id").cast(StringType)).as("h"))
      .select(col("lang"), col("doc_id"), col("weight"),
        (md5Uniform(col("h")) / col("weight")).as("priority"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("lang"), col("doc_id"), col("weight"), col("priority"),
        col("rn").cast("long").as("rn"))
  }
}

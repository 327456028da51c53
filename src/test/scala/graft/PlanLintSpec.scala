package graft

/** Sweeping plan lint across the gate surface: no batch gate query may
  * plan a CartesianProduct, and BroadcastNestedLoopJoin may appear only
  * as the deliberate broadcast-ONE-ROW scalar probe
  * (`crossJoin(broadcast(q))` — an O(n) map-side pass, not a quadratic
  * join; the build side is a single aggregate/query row by construction).
  * A regression anywhere in the 100-query surface — a filter that stops
  * reaching a join, an equi-key that stops resolving — turns into one of
  * these two operators, and this spec catches it wholesale rather than
  * per-query.
  *
  * Streaming gates are excluded (their construction starts real stream
  * queries; the returned memory-sink frame has no plan worth linting) as
  * are the two whose construction runs multi-second work asserted by
  * dedicated specs (`ml_price_metrics` fits models,
  * `multimodal_features`/`multimodal_png_files` encode PNG corpora).
  */
class PlanLintSpec extends SparkTestBase {

  private val excluded = Set(
    "events_hourly_streaming", "events_sliding_streaming",
    "events_hourly_streaming_append", "events_sliding_streaming_append",
    "events_sessions_streaming",
    "events_sessions_native_streaming",
    "events_dedup_streaming", "events_interval_join_streaming",
    "events_stream_join", "events_stream_left_join",
    "events_stream_full_join", "events_foreach_upsert",
    "dedup_minhash_streaming", "dedup_minhash_windowed",
    // streaming construction drains a real query; the returned 1-row
    // ledger frame is a LocalTableScan with no plan worth linting
    "events_progress_ledger",
    // construction runs the driving action and emits a local metrics
    // row — the observed pipeline's own plan is what executed, the
    // returned frame is a LocalTableScan
    "observe_intake_stats",
    "ml_price_metrics", "ml_price_metrics_full", "ml_cv_linear",
    // verdict-gate construction fits transformers (collect-backed);
    // their raw probes (imputedOrders/onehotFeatures/
    // imputedOrdersMedian/vectorIndexedFeatures) are linted instead
    // via the benchProbes pass below
    "ml_feature_impute", "ml_feature_onehot",
    "ml_feature_impute_median", "ml_feature_vector_index",
    // construction writes bucketed catalog tables (runs jobs); its plan
    // shape is asserted by BucketedTablesSpec instead
    "join_revenue_bucketed",
    "multimodal_features", "multimodal_png_files")

  /** Gates whose plan is EXPECTED to hold a broadcast-1-row
    * BroadcastNestedLoopJoin (the scalar/query-vector probe shape).
    */
  private val scalarProbe = Set(
    "scalar_above_avg", "ann_brute_force", "ann_lsh", "ann_brp_lsh",
    "ann_ivf", "ann_quantized", "ml_recommend_tfidf", "ml_recommend_tfidf_sparse",
    // broadcast 1-row min/max bounds frame feeding the normalization
    "layout_zorder",
    // broadcast 1-row weight normalizer feeding the budget arithmetic
    "sample_mixture_temperature",
    // broadcast 1-row vocabulary size feeding the smoothing denominator
    "text_bigram_perplexity",
    // broadcast 1-row merged-shard estimate joined onto the direct sketch
    "sketch_kmv_merge", "sketch_hll_merge",
    // broadcast 1-row [min,max] extent feeding the bucket arithmetic
    "profile_histogram",
    // broadcast 1-row corpus stats (N, Σdl) feeding the BM25 formula
    "text_bm25_topk",
    // broadcast 1-row stored-sample quantiles joined onto the exact row
    "sketch_quantile_sample",
    // broadcast 1-row insert-batch stats combined onto the base stats row
    "analyze_incremental_stats",
    // broadcast 1-row [min,max] extent feeding the integer CDF grid
    "dq_split_distribution")

  /** Gates whose plan holds SEVERAL broadcast-1-row nested loops (a
    * report assembled from independent 1-row aggregates). Value = exact
    * expected BNLJ count; every one must carry a declared build side.
    */
  private val scalarProbeMulti = Map(
    // orders-local × docs-local × lineitem-local × 2 FK-orphan counts
    "dq_constraint_report" -> 4,
    // stored-table union estimate × live union estimate
    "sketch_hll_persisted" -> 2,
    // left/right counts × exact dot product × sketch inner product
    "profile_join_size_cms" -> 3,
    // (nodes, wedges) agg × edge count × triangle count — the census row
    // assembled from three independent 1-row aggregates
    "graph_triangle_stats" -> 2,
    // the truncated probe and its full-dim membership reference each
    // broadcast the same 1-row query vector
    "ann_truncated_dims" -> 2)

  test("no gate query plans a cartesian product or an unexpected nested-loop join") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.filterNot(q => excluded(q._1)).foreach { case (name, fn) =>
      val p = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (scalarProbe(name)) {
        // the probe shape itself: nested-loop is fine ONLY because the
        // build side broadcasts one row. Pin that shape: exactly ONE
        // BNLJ, with a declared build side, fed by a broadcast exchange
        // in identity mode (the form `crossJoin(broadcast(oneRow))`
        // plans to) — a probe that degraded to a second nested loop or
        // lost its broadcast would slip the old allowlist silently.
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
        assert(bnlj <= 1, s"$name scalar probe: expected at most 1 " +
          s"BroadcastNestedLoopJoin, found $bnlj")
        if (bnlj == 1) {
          assert(p.contains("BroadcastNestedLoopJoin BuildLeft") ||
            p.contains("BroadcastNestedLoopJoin BuildRight"),
            s"$name scalar probe: BNLJ has no broadcast build side")
          assert(p.contains("BroadcastExchange IdentityBroadcastMode"),
            s"$name scalar probe: no identity-mode broadcast exchange " +
              "feeding the nested loop")
        }
      } else if (scalarProbeMulti.contains(name)) {
        val expect = scalarProbeMulti(name)
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
        assert(bnlj == expect,
          s"$name report probe: expected $expect BroadcastNestedLoopJoins, found $bnlj")
        val built = "BroadcastNestedLoopJoin Build(Left|Right)".r.findAllIn(p).size
        assert(built == bnlj,
          s"$name report probe: ${bnlj - built} BNLJs lack a broadcast build side")
        assert(p.contains("BroadcastExchange IdentityBroadcastMode"),
          s"$name report probe: no identity-mode broadcast exchange")
      } else
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin outside the scalar-probe allowlist")
    }
  }

  test("feature-engineering raw probes lint clean") {
    // the verdict gates above are excluded (construction fits models);
    // their production-path probes get the same cartesian/BNLJ lint here
    val tt = core.Tables(spark, "/root/testdata/sf0.001")
    Seq(
      "imputedOrders" -> ml.FeatureEngineering.imputedOrders(tt),
      "imputedOrdersMedian" -> ml.FeatureEngineering.imputedOrdersMedian(tt),
      "vectorIndexedFeatures" -> ml.FeatureEngineering.vectorIndexedFeatures(tt),
      "onehotFeatures" -> ml.FeatureEngineering.onehotFeatures(tt)).foreach {
      case (name, df) =>
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a cartesian/nested-loop join")
    }
  }

  /** PLANS.md drift check (round-10, verdict item 8): the committed file
    * is `runMain graft.Plans` output; regeneration was manual-only, so a
    * plan-shape change could land silently. This test re-derives every
    * pick's formatted plan under the same session shape (local[4],
    * shuffle=4, sf0.001) and compares the NODE SIGNATURE — the ordered
    * list of physical operator names — against the committed file.
    * Operator details (paths, stats, expr ids) are volatile and ignored;
    * a changed node list is exactly "the plan changed, regenerate
    * PLANS.md" (`sbt 'runMain graft.Plans' > /tmp/plans.txt`, then splice
    * under the header).
    */
  test("committed PLANS.md matches the current plan node signatures") {
    val committed = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("PLANS.md")), java.nio.charset.StandardCharsets.UTF_8)
    val nodeRe = """(?m)^\(\d+\) ([A-Za-z][A-Za-z0-9_ ]*?)(?: \[codegen id : \d+\])?$""".r
    def signature(block: String): Seq[String] =
      nodeRe.findAllMatchIn(block).map(_.group(1).trim).toSeq
    val tt = core.Tables(spark, "/root/testdata/sf0.001")
    val picks = Plans.picks(tt)
    val pickLabels = picks.map(_._1).toSet
    // split the committed file into per-pick sections; a chunk whose label
    // is not a pick (e.g. a "Subqueries" marker explain itself emits)
    // belongs to the preceding pick's plan output
    val sections = committed.split("""(?m)^===== """).toSeq.drop(1)
      .foldLeft(Vector.empty[(String, Seq[String])]) { (acc, s) =>
        val label = s.takeWhile(_ != '=').trim
        if (pickLabels(label) || acc.isEmpty) acc :+ (label -> signature(s))
        else acc.init :+ (acc.last._1 -> (acc.last._2 ++ signature(s)))
      }.toMap
    assert(sections.keySet == picks.map(_._1).toSet,
      s"PLANS.md sections out of sync with Plans.picks: " +
        s"missing ${picks.map(_._1).toSet -- sections.keySet}, " +
        s"stale ${sections.keySet -- picks.map(_._1).toSet}")
    picks.foreach { case (label, df) =>
      val fresh = signature(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      assert(fresh == sections(label),
        s"plan drift for '$label': regenerate PLANS.md " +
          s"(committed ${sections(label).mkString("→")} vs " +
          s"current ${fresh.mkString("→")})")
    }
  }
}

package graft

import graft.operators.CoreQueries
import graft.multimodal.MultimodalOps
import org.apache.spark.sql.functions._

/** GateInvariants: the rows-only gates' property harness must accept the
  * real queries and REJECT doctored outputs — otherwise it is decoration,
  * not a gate. (ANN/ML/mllib-minhash positives run in every Verify
  * invocation; here the cheap families cover both directions.)
  */
class VerifyInvariantsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("real sampling queries satisfy their invariants") {
    GateInvariants.check("sample_orders",
      CoreQueries.sampleOrdersGate(t), (s, d) => CoreQueries.sampleOrdersGate(core.Tables(s, d)),
      spark, dir)
    GateInvariants.check("split_counts",
      CoreQueries.splitCountsGate(t), (s, d) => CoreQueries.splitCountsGate(core.Tables(s, d)),
      spark, dir)
    GateInvariants.check("sample_stratified",
      CoreQueries.stratifiedSample(t), (s, d) => CoreQueries.stratifiedSample(core.Tables(s, d)),
      spark, dir)
    GateInvariants.check("row_ids",
      CoreQueries.rowIdsGate(t), (s, d) => CoreQueries.rowIdsGate(core.Tables(s, d)),
      spark, dir)
  }

  test("real sketch and ingest queries satisfy their invariants") {
    GateInvariants.check("agg_approx_distinct",
      CoreQueries.aggApproxDistinct(t), (s, d) => CoreQueries.aggApproxDistinct(core.Tables(s, d)),
      spark, dir)
    GateInvariants.check("q2_approx_median_default",
      CoreQueries.q2ApproxMedianDefaultGate(t), (s, d) => CoreQueries.q2ApproxMedianDefaultGate(core.Tables(s, d)),
      spark, dir)
    GateInvariants.check("sketch_cms_topk",
      CoreQueries.sketchCmsTopK(t), (s, d) => CoreQueries.sketchCmsTopK(core.Tables(s, d)),
      spark, dir)
    GateInvariants.check("multimodal_binary_ingest",
      MultimodalOps.binaryIngestStats(t), (s, d) => MultimodalOps.binaryIngestStats(core.Tables(s, d)),
      spark, dir)
  }

  test("feature-engineering gates satisfy their invariants; doctored outputs rejected") {
    GateInvariants.check("ml_feature_impute",
      ml.FeatureEngineering.imputeGate(t),
      (s, d) => ml.FeatureEngineering.imputeGate(core.Tables(s, d)),
      spark, dir)
    GateInvariants.check("ml_feature_onehot",
      ml.FeatureEngineering.onehotGate(t),
      (s, d) => ml.FeatureEngineering.onehotGate(core.Tables(s, d)),
      spark, dir)
    // doctored gap count with verdicts left true: independent recount rejects
    intercept[IllegalArgumentException] {
      GateInvariants.check("ml_feature_impute",
        ml.FeatureEngineering.imputeGate(t).withColumn("n_gapped", col("n_gapped") + 1),
        (s, d) => ml.FeatureEngineering.imputeGate(core.Tables(s, d)), spark, dir)
    }
    // flipped band verdict disagrees with the re-fit
    intercept[IllegalArgumentException] {
      GateInvariants.check("ml_feature_impute",
        ml.FeatureEngineering.imputeGate(t)
          .withColumn("imputed_mean_in_band", !col("imputed_mean_in_band")),
        (s, d) => ml.FeatureEngineering.imputeGate(core.Tables(s, d)), spark, dir)
    }
    // shifted index breaks the independently recomputed frequency rank
    intercept[IllegalArgumentException] {
      GateInvariants.check("ml_feature_onehot",
        ml.FeatureEngineering.onehotGate(t)
          .withColumn("priority_index", col("priority_index") + 1),
        (s, d) => ml.FeatureEngineering.onehotGate(core.Tables(s, d)), spark, dir)
    }
    // flipped one-hot verdict disagrees with the re-fit
    intercept[IllegalArgumentException] {
      GateInvariants.check("ml_feature_onehot",
        ml.FeatureEngineering.onehotGate(t)
          .withColumn("onehot_ok", !col("onehot_ok")),
        (s, d) => ml.FeatureEngineering.onehotGate(core.Tables(s, d)), spark, dir)
    }
  }

  test("round-11 feature gates satisfy their invariants; doctored outputs rejected") {
    GateInvariants.check("ml_feature_impute_median",
      ml.FeatureEngineering.imputeMedianGate(t),
      (s, d) => ml.FeatureEngineering.imputeMedianGate(core.Tables(s, d)),
      spark, dir)
    GateInvariants.check("ml_feature_vector_index",
      ml.FeatureEngineering.vectorIndexGate(t),
      (s, d) => ml.FeatureEngineering.vectorIndexGate(core.Tables(s, d)),
      spark, dir)
    // flipped median-band verdict disagrees with the independent re-fit
    intercept[IllegalArgumentException] {
      GateInvariants.check("ml_feature_impute_median",
        ml.FeatureEngineering.imputeMedianGate(t)
          .withColumn("median_in_band", !col("median_in_band")),
        (s, d) => ml.FeatureEngineering.imputeMedianGate(core.Tables(s, d)), spark, dir)
    }
    // shifted category index breaks the recomputed ascending rank
    intercept[IllegalArgumentException] {
      GateInvariants.check("ml_feature_vector_index",
        ml.FeatureEngineering.vectorIndexGate(t)
          .withColumn("category_index", col("category_index") + 1),
        (s, d) => ml.FeatureEngineering.vectorIndexGate(core.Tables(s, d)), spark, dir)
    }
    // a gate claiming BOTH features categorical contradicts maxCategories
    intercept[IllegalArgumentException] {
      GateInvariants.check("ml_feature_vector_index",
        ml.FeatureEngineering.vectorIndexGate(t)
          .withColumn("n_categorical", lit(2L)),
        (s, d) => ml.FeatureEngineering.vectorIndexGate(core.Tables(s, d)), spark, dir)
    }
  }

  test("round-11 sketch and pruning gates satisfy their invariants; doctored outputs rejected") {
    GateInvariants.check("sketch_hll_merge",
      CoreQueries.sketchHllMerge(t),
      (s, d) => CoreQueries.sketchHllMerge(core.Tables(s, d)), spark, dir)
    GateInvariants.check("stats_pruned_scan",
      sources.ParquetStats.prunedScanGate(t),
      (s, d) => sources.ParquetStats.prunedScanGate(core.Tables(s, d)), spark, dir)
    // flipped band verdict disagrees with the raw-estimate recomputation
    intercept[IllegalArgumentException] {
      GateInvariants.check("sketch_hll_merge",
        CoreQueries.sketchHllMerge(t)
          .withColumn("merged_in_band", !col("merged_in_band")),
        (s, d) => CoreQueries.sketchHllMerge(core.Tables(s, d)), spark, dir)
    }
    // doctored exact count with verdicts left true: rejected by recount
    intercept[IllegalArgumentException] {
      GateInvariants.check("sketch_hll_merge",
        CoreQueries.sketchHllMerge(t)
          .withColumn("n_exact", col("n_exact") * 2),
        (s, d) => CoreQueries.sketchHllMerge(core.Tables(s, d)), spark, dir)
    }
    // flipped skip verdict disagrees with the recomputed prune
    intercept[IllegalArgumentException] {
      GateInvariants.check("stats_pruned_scan",
        sources.ParquetStats.prunedScanGate(t)
          .withColumn("skipped_some", !col("skipped_some")),
        (s, d) => sources.ParquetStats.prunedScanGate(core.Tables(s, d)),
        spark, dir)
    }
  }

  test("gate surface is closed: every query has an oracle, no stale entries") {
    // since round 10 there are ZERO rows-only gates — a new query landing
    // without oracle SQL (or an oracle outliving its query, or a bench
    // probe for a gate that no longer exists) silently weakens the
    // correctness surface; pin the three key sets against each other
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"queries without oracle: ${q -- o}; stale oracles: ${o -- q}")
    val p = SparkEntry.benchProbes.keySet
    assert(p.subsetOf(q), s"bench probes for absent gates: ${p -- q}")
  }

  test("cross-validation sweep satisfies its invariants; doctored winner rejected") {
    GateInvariants.check("ml_cv_linear",
      ml.PricePipeline.cvVerdictGate(t),
      (s, d) => ml.PricePipeline.cvVerdictGate(core.Tables(s, d)),
      spark, dir)
    // a flipped verdict disagrees with the independent re-sweep
    intercept[IllegalArgumentException] {
      GateInvariants.check("ml_cv_linear",
        ml.PricePipeline.cvVerdictGate(t)
          .withColumn("winner_unique_minimal", !col("winner_unique_minimal")),
        (s, d) => ml.PricePipeline.cvVerdictGate(core.Tables(s, d)), spark, dir)
    }
  }

  test("doctored outputs are rejected") {
    // doctored source count with verdicts left true: the independent
    // recomputation must reject it (self-certification guard)
    intercept[IllegalArgumentException] {
      GateInvariants.check("sample_orders",
        CoreQueries.sampleOrdersGate(t).withColumn("n_source", col("n_source") * 2),
        (s, d) => CoreQueries.sampleOrdersGate(core.Tables(s, d)), spark, dir)
    }
    // flipped verdict must disagree with the recomputation
    intercept[IllegalArgumentException] {
      GateInvariants.check("sample_orders",
        CoreQueries.sampleOrdersGate(t)
          .withColumn("sampled_in_band", !col("sampled_in_band")),
        (s, d) => CoreQueries.sampleOrdersGate(core.Tables(s, d)), spark, dir)
    }
    intercept[IllegalArgumentException] {
      GateInvariants.check("split_counts",
        CoreQueries.splitCountsGate(t)
          .withColumn("train_in_band", !col("train_in_band")),
        (s, d) => CoreQueries.splitCountsGate(core.Tables(s, d)), spark, dir)
    }
    intercept[IllegalArgumentException] {
      GateInvariants.check("q2_approx_median_default",
        CoreQueries.q2ApproxMedianDefaultGate(t)
          .withColumn("in_band", !col("in_band")),
        (s, d) => CoreQueries.q2ApproxMedianDefaultGate(core.Tables(s, d)), spark, dir)
    }
    intercept[IllegalArgumentException] {
      GateInvariants.check("sketch_cms_topk",
        CoreQueries.sketchCmsTopK(t)
          .withColumn("never_under", !col("never_under")),
        (s, d) => CoreQueries.sketchCmsTopK(core.Tables(s, d)), spark, dir)
    }
    // doctored source count with verdicts left true: independent recount
    // rejects it
    intercept[IllegalArgumentException] {
      GateInvariants.check("row_ids",
        CoreQueries.rowIdsGate(t).withColumn("n_source", col("n_source") * 2),
        (s, d) => CoreQueries.rowIdsGate(core.Tables(s, d)), spark, dir)
    }
    // flipped uniqueness verdict disagrees with the raw re-run
    intercept[IllegalArgumentException] {
      GateInvariants.check("row_ids",
        CoreQueries.rowIdsGate(t).withColumn("ids_unique", !col("ids_unique")),
        (s, d) => CoreQueries.rowIdsGate(core.Tables(s, d)), spark, dir)
    }
    // drifted sketch: a false band verdict must be rejected engine-side
    intercept[IllegalArgumentException] {
      GateInvariants.check("agg_approx_distinct",
        CoreQueries.aggApproxDistinct(t)
          .withColumn("within_6rsd", lit(false)),
        (s, d) => CoreQueries.aggApproxDistinct(core.Tables(s, d)), spark, dir)
    }
    // broken stratum: a false band verdict must be rejected engine-side
    intercept[IllegalArgumentException] {
      GateInvariants.check("sample_stratified",
        CoreQueries.stratifiedSample(t)
          .withColumn("in_band", lit(false)),
        (s, d) => CoreQueries.stratifiedSample(core.Tables(s, d)), spark, dir)
    }
    // SELF-CERTIFICATION guard (round-8 verdict #4): a verdict column that
    // stays TRUE while the raw numbers are doctored must be rejected —
    // the invariant recomputes the band independently instead of trusting
    // the engine's boolean
    intercept[IllegalArgumentException] {
      GateInvariants.check("agg_approx_distinct",
        CoreQueries.aggApproxDistinct(t)
          .withColumn("n_exact", col("n_exact") * 1000),
        (s, d) => CoreQueries.aggApproxDistinct(core.Tables(s, d)), spark, dir)
    }
    intercept[IllegalArgumentException] {
      GateInvariants.check("sample_stratified",
        CoreQueries.stratifiedSample(t)
          .withColumn("n_source", col("n_source") * 1000),
        (s, d) => CoreQueries.stratifiedSample(core.Tables(s, d)), spark, dir)
    }
    // corrupted payload accounting: byte length off by one
    intercept[IllegalArgumentException] {
      GateInvariants.check("multimodal_binary_ingest",
        MultimodalOps.binaryIngestStats(t)
          .withColumn("byte_len", col("byte_len") + 1),
        (s, d) => MultimodalOps.binaryIngestStats(core.Tables(s, d)), spark, dir)
    }
  }

  test("ml_price_metrics invariants: real gate passes, doctored verdicts rejected") {
    import spark.implicits._
    // the fast 3-model variant keeps this spec cheap while exercising the
    // same checker path as the 9-model gate (shared case in GateInvariants)
    val good = ml.PricePipeline.fastMetricsGate(t)
    GateInvariants.check("ml_price_metrics", good,
      (s, d) => ml.PricePipeline.fastMetricsGate(core.Tables(s, d)), spark, dir)
    // quirk verdict flipped while the re-fit recomputation says true
    intercept[IllegalArgumentException] {
      GateInvariants.check("ml_price_metrics",
        good.withColumn("r2adj_eq_r2", !col("r2adj_eq_r2")),
        (s, d) => ml.PricePipeline.fastMetricsGate(core.Tables(s, d)), spark, dir)
    }
    // missing model
    intercept[IllegalArgumentException] {
      GateInvariants.check("ml_price_metrics",
        good.filter(col("model") =!= "DecisionTree"),
        (s, d) => ml.PricePipeline.fastMetricsGate(core.Tables(s, d)), spark, dir)
    }
  }

  test("checkMagnitudes: float-representable values pass; >= 2^53 rejected in every numeric shape") {
    import spark.implicits._
    // the real rollup gate (the round-11 failure site) must now pass
    GateInvariants.checkMagnitudes("agg_incremental_rollup",
      operators.SnapshotOps.incrementalRollupGate(t))
    // in-band values across the checked types pass, including NaN doubles
    // (canonicalized symbolically, not as a float) and numeric arrays
    val ok = Seq((1L, (1L << 52).toDouble, BigDecimal(9007199254740991L),
        Seq(1.0, Double.NaN), Seq(3L)))
      .toDF("l", "d", "dec", "darr", "larr")
    GateInvariants.checkMagnitudes("ok", ok)
    // a 2^60 long is exactly the class the round-11 driver capture mangled
    intercept[IllegalArgumentException] {
      GateInvariants.checkMagnitudes("big_long", Seq(1L << 60).toDF("v"))
    }
    intercept[IllegalArgumentException] {
      GateInvariants.checkMagnitudes("big_dec",
        Seq(BigDecimal("40000000000000000")).toDF("v"))
    }
    intercept[IllegalArgumentException] {
      GateInvariants.checkMagnitudes("big_neg_double",
        Seq(-1.0e16).toDF("v"))
    }
    intercept[IllegalArgumentException] {
      GateInvariants.checkMagnitudes("big_arr",
        Seq(Seq(1.0, (1L << 53).toDouble)).toDF("v"))
    }
  }

  test("the shared A→B / B→C oracle derivations are byte-identical across every CDC-family gate") {
    // the B (and where used, C) snapshot CTE is embedded in several
    // oracles; a residue change applied to one copy but not the others
    // would silently turn a self-proving family inconsistent. Pin the
    // canonical text (whitespace-normalized) in every embedding gate.
    def norm(sql: String) = sql.replaceAll("\\s+", " ").trim
    val canonB = norm(
      """SELECT doc_id, source,
        |CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END AS text
        |FROM documents WHERE doc_id % 7 <> 0
        |UNION ALL
        |SELECT doc_id + 1099511627776 AS doc_id, source, text
        |FROM documents WHERE doc_id % 13 = 0""".stripMargin)
    val canonC = norm(
      """SELECT doc_id, source,
        |CASE WHEN doc_id % 9 = 0 THEN text || ' v2' ELSE text END AS text
        |FROM b WHERE doc_id % 5 <> 0
        |UNION ALL
        |SELECT doc_id + 2199023255552 AS doc_id, source, text
        |FROM b WHERE doc_id % 21 = 0""".stripMargin)
    val bGates = Seq("merge_apply_roundtrip", "merge_apply_multibatch",
      "merge_apply_compacted", "agg_incremental_rollup",
      "agg_incremental_rollup_multi", "retention_purge",
      "time_travel_history", "drift_source_distribution",
      "index_incremental_lookup")
    val cGates = Seq("merge_apply_multibatch", "merge_apply_compacted",
      "agg_incremental_rollup_multi", "retention_purge",
      "time_travel_history")
    bGates.foreach { g =>
      assert(norm(SparkEntry.oracleSql(g)).contains(canonB),
        s"$g's oracle drifted from the canonical B derivation")
    }
    cGates.foreach { g =>
      assert(norm(SparkEntry.oracleSql(g)).contains(canonC),
        s"$g's oracle drifted from the canonical C derivation")
    }
  }
}

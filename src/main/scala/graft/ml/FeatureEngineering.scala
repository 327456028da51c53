package graft.ml

import graft.core.Tables
import org.apache.spark.ml.feature.{Bucketizer, Imputer, IndexToString, OneHotEncoder, SQLTransformer, StringIndexer, VectorAssembler, VectorIndexer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's remaining imported-but-unwired feature transformers
  * (`notebook_to_py/price-prediction.py:9` imports `Imputer` and
  * `OneHotEncoder`; `notebook_to_py/recomendation-system.py:21-23` imports
  * `Bucketizer`, `SQLTransformer` and `IndexToString` without ever calling
  * them). SURVEY §2.10 marks them optional for parity, but they are the
  * first transformers a real feature-engineering user reaches for, so
  * round 10 puts each on the correctness surface with the verdict-gate
  * pattern: the gates emit the oracle-recomputable quantities (counts,
  * frequency-rank indices, bucket assignments) plus booleans derived from
  * the ACTUAL fitted transformers, and `Verify.GateInvariants` re-runs the
  * fits and recomputes every verdict independently.
  *
  * Scale notes: all three fits are single-pass aggregates (Imputer: one
  * avg; StringIndexer: one countByValue; OneHotEncoder: one max) and the
  * transforms are per-row — nothing here shuffles more than once at any
  * corpus size. The gates collect only O(#categories) or O(1) rows; that
  * is verdict derivation, not the production path.
  */
object FeatureEngineering {

  /** Every 10th order key loses its price — a DETERMINISTIC missingness
    * pattern (the fixtures ship with no nulls), injected through the
    * reference's imported `SQLTransformer` so that transformer is
    * exercised too, not simulated with a plain Column.
    */
  private[graft] def gappyOrders(t: Tables): DataFrame =
    new SQLTransformer().setStatement(
      "SELECT *, CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_totalprice END " +
        "AS price_gappy FROM __THIS__")
      .transform(t.orders)

  /** Bucketizer splits over o_totalprice (fixture range ~1k–500k): four
    * buckets, left-closed, infinite end rails.
    */
  val priceBucketSplits: Array[Double] = Array(
    Double.NegativeInfinity, 50000.0, 150000.0, 300000.0, Double.PositiveInfinity)

  /** Bucketizer gate — per-bucket order counts. Fully oracle-exact (no
    * verdict booleans needed): the splits are explicit constants, so
    * bucket assignment is a CASE expression the DuckDB oracle restates
    * verbatim.
    */
  def bucketizedPriceCounts(t: Tables): DataFrame =
    new Bucketizer()
      .setInputCol("o_totalprice").setOutputCol("bucket")
      .setSplits(priceBucketSplits).setHandleInvalid("skip")
      .transform(t.orders.na.drop(Seq("o_totalprice")))
      .groupBy(col("bucket").cast("long").as("price_bucket"))
      .agg(count(lit(1)).as("n"))

  /** Imputer verdict gate: mean-strategy fill over the gapped price.
    * Oracle-recomputable: source count and gap count (the modulus is a
    * constant). Verdicts from the actual fit: every gapped row filled
    * with the surrogate, and the surrogate within 1e-9 relative of a
    * DECIMAL(28,6)-stable exact mean — Imputer's internal avg is a
    * shuffle-order-dependent double sum, so the gate carries the band
    * verdict rather than the float itself.
    */
  def imputeGate(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val gappy = gappyOrders(t)
    val model = new Imputer().setStrategy("mean")
      .setInputCols(Array("price_gappy")).setOutputCols(Array("price_imputed"))
      .fit(gappy)
    val surrogate = model.surrogateDF.head().getDouble(0)
    val out = model.transform(gappy)
    val nSource = t.orders.count()
    val nGapped = gappy.filter(col("price_gappy").isNull).count()
    val filled = out.filter(col("price_gappy").isNull &&
      (col("price_imputed").isNull ||
        abs(col("price_imputed") - lit(surrogate)) > lit(1e-9))).count() == 0L
    Seq((nSource, nGapped, filled, imputeMeanInBand(t, surrogate)))
      .toDF("n_source", "n_gapped", "gapped_all_filled", "imputed_mean_in_band")
  }

  /** The DECIMAL-stable exact-mean band check, shared verbatim with the
    * Verify invariant so both sides evaluate the identical predicate
    * (round-9 advice on ml_price_metrics).
    */
  private[graft] def imputeMeanInBand(t: Tables, surrogate: Double): Boolean = {
    val exact = gappyOrders(t)
      .filter(col("price_gappy").isNotNull)
      .agg((sum(col("price_gappy").cast("decimal(28,6)")) / count(lit(1)))
        .cast("double"))
      .head().getDouble(0)
    math.abs(surrogate - exact) <= 1e-9 * math.max(1.0, math.abs(exact))
  }

  /** Raw production-path probe for the bench (the verdict gate's collects
    * are verification cost, not workload — round-9 advice): the full
    * imputed frame, every gapped price replaced by the fitted surrogate.
    */
  def imputedOrders(t: Tables): DataFrame = {
    val gappy = gappyOrders(t)
    new Imputer().setStrategy("mean")
      .setInputCols(Array("price_gappy")).setOutputCols(Array("price_imputed"))
      .fit(gappy).transform(gappy)
  }

  /** Imputer `median`-strategy twin of [[imputeGate]] (round-10 verdict
    * residue item 2). Imputer's median is `approxQuantile(col, 0.5,
    * relativeError = 0.001)` — a Greenwald–Khanna sketch whose result is
    * an ACTUAL element with rank within ±0.001·n of the true median, so
    * (unlike the mean twin's 1e-9 band) the right contract is a rank
    * band: the surrogate must lie inside the EXACT interpolated
    * [P49.5, P50.5] of the non-null column — 5× wider than the sketch's
    * ±0.1 % rank guarantee, so the verdict is robust to interpolation at
    * the band edges while still pinning the sketch to the median
    * neighborhood. `Verify.GateInvariants` re-fits and recomputes both
    * booleans through the SAME shared predicate ([[imputeMedianInBand]]).
    */
  def imputeMedianGate(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val gappy = gappyOrders(t)
    val model = new Imputer().setStrategy("median")
      .setInputCols(Array("price_gappy")).setOutputCols(Array("price_imputed"))
      .fit(gappy)
    val surrogate = model.surrogateDF.head().getDouble(0)
    val out = model.transform(gappy)
    val nSource = t.orders.count()
    val nGapped = gappy.filter(col("price_gappy").isNull).count()
    val filled = out.filter(col("price_gappy").isNull &&
      (col("price_imputed").isNull ||
        abs(col("price_imputed") - lit(surrogate)) > lit(1e-9))).count() == 0L
    Seq((nSource, nGapped, filled, imputeMedianInBand(t, surrogate)))
      .toDF("n_source", "n_gapped", "gapped_all_filled", "median_in_band")
  }

  /** The exact-percentile band check for the median strategy, shared
    * verbatim with the Verify invariant (same posture as
    * [[imputeMeanInBand]]): one `percentile` aggregate — the exact sort-
    * based evaluator already gated in `agg_exact_percentiles` — at
    * 0.495/0.505, then a closed-interval containment test.
    */
  private[graft] def imputeMedianInBand(t: Tables, surrogate: Double): Boolean = {
    val band = gappyOrders(t)
      .filter(col("price_gappy").isNotNull)
      .agg(percentile(col("price_gappy"),
        array(lit(0.495), lit(0.505))).as("band"))
      .head().getSeq[Double](0)
    surrogate >= band(0) && surrogate <= band(1)
  }

  /** Raw production-path probe for the median twin: the full imputed
    * frame (one sketch aggregate to fit, then a per-row transform).
    */
  def imputedOrdersMedian(t: Tables): DataFrame = {
    val gappy = gappyOrders(t)
    new Imputer().setStrategy("median")
      .setInputCols(Array("price_gappy")).setOutputCols(Array("price_imputed"))
      .fit(gappy).transform(gappy)
  }

  /** Raw production-path probe: the per-row indexed + one-hot-encoded
    * frame (what a downstream VectorAssembler would consume).
    */
  def onehotFeatures(t: Tables): DataFrame = {
    val orders = t.orders.na.drop(Seq("o_orderpriority"))
    val indexed = new StringIndexer()
      .setInputCol("o_orderpriority").setOutputCol("priority_index")
      .setHandleInvalid("skip")
      .fit(orders).transform(orders)
    new OneHotEncoder()
      .setInputCol("priority_index").setOutputCol("onehot").setDropLast(true)
      .fit(indexed).transform(indexed)
  }

  /** StringIndexer→OneHotEncoder→IndexToString verdict gate, one row per
    * priority. Oracle-recomputable: the per-category count AND the index
    * itself — frequencyDesc with alphabetic tie-break is exactly
    * `row_number() OVER (ORDER BY n DESC, value ASC) - 1`, and the sf0.01
    * fixture actually exercises the tie-break (2-HIGH and 3-MEDIUM both
    * count 3003). Verdicts from the fitted transformers: the encoded
    * vector is the correct dropLast one-hot of the index, and
    * IndexToString round-trips the index back to the original string.
    */
  def onehotGate(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val orders = t.orders.na.drop(Seq("o_orderpriority"))
    val indexer = new StringIndexer()
      .setInputCol("o_orderpriority").setOutputCol("priority_index")
      .setHandleInvalid("skip")
      .fit(orders)
    val numCat = indexer.labelsArray.head.length
    val counts = orders.groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val indexed = indexer.transform(orders.select("o_orderpriority").distinct())
    val encoded = new OneHotEncoder()
      .setInputCol("priority_index").setOutputCol("onehot").setDropLast(true)
      .fit(indexed)
      .transform(indexed)
    val back = new IndexToString()
      .setInputCol("priority_index").setOutputCol("priority_back")
      .setLabels(indexer.labelsArray.head)
      .transform(encoded)
    back.collect().map { r =>
      val pr = r.getAs[String]("o_orderpriority")
      val idx = r.getAs[Double]("priority_index").toLong
      val vec = r.getAs[org.apache.spark.ml.linalg.Vector]("onehot")
      val onehotOk = vec.size == numCat - 1 &&
        (if (idx < numCat - 1) vec.numNonzeros == 1 && vec(idx.toInt) == 1.0
         else vec.numNonzeros == 0) // dropLast: last category = all zeros
      val roundtripOk = r.getAs[String]("priority_back") == pr
      (pr, counts(pr), idx, (numCat - 1).toLong, onehotOk, roundtripOk)
    }.toSeq
      .toDF("o_orderpriority", "n_orders", "priority_index", "onehot_size",
        "onehot_ok", "roundtrip_ok")
  }

  /** The 2-feature vector VectorIndexer runs over: l_linenumber (7
    * distinct values 1..7 — categorical under maxCategories = 10) beside
    * l_quantity (50 distinct values — past the cap, so it must stay
    * continuous). Deliberately zero-free on the categorical slot:
    * VectorIndexer special-cases 0.0 to index 0 when present (to keep
    * sparse vectors sparse), so a zero-free column makes the category map
    * exactly "ascending-value rank", which a SQL oracle can restate.
    */
  private[graft] def assembledLineitems(t: Tables): DataFrame =
    new VectorAssembler()
      .setInputCols(Array("linenumber_d", "quantity_d")).setOutputCol("features")
      .transform(t.lineitem.select(
        col("l_linenumber").cast("double").as("linenumber_d"),
        col("l_quantity").cast("double").as("quantity_d")))

  private def fitVectorIndexer(t: Tables): org.apache.spark.ml.feature.VectorIndexerModel =
    new VectorIndexer()
      .setInputCol("features").setOutputCol("indexed").setMaxCategories(10)
      .fit(assembledLineitems(t))

  /** VectorIndexer verdict gate — the last imported-but-unwired reference
    * class (`notebook_to_py/recomendation-system.py:21-23` imports it and
    * never calls it; round-10 verdict residue item 1). One row per
    * distinct l_linenumber value. Oracle-recomputable: the per-value row
    * count AND the category index itself (ascending-value rank — see
    * [[assembledLineitems]] for why the zero-first quirk can't bite), and
    * n_categorical = 1 (l_quantity's 50 distinct values exceed
    * maxCategories, so only feature 0 may be categorical). Verdict from
    * the fitted model: transforming a representative row (the min
    * quantity seen with each value — deterministic) maps feature 0 to the
    * category index and passes feature 1 through untouched.
    *
    * Scale: the fit is VectorIndexer's single pass over the assembled
    * vectors (it tracks at most maxCategories+1 distinct values per
    * feature); everything collected here is O(#categories) = 7 rows.
    */
  def vectorIndexGate(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val model = fitVectorIndexer(t)
    val catMap = model.categoryMaps.getOrElse(0, Map.empty[Double, Int])
    val nCategorical = model.categoryMaps.size.toLong
    val reps = t.lineitem
      .groupBy(col("l_linenumber").cast("long").as("value"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_quantity").cast("double")).as("rep_qty"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val repFrame = new VectorAssembler()
      .setInputCols(Array("linenumber_d", "quantity_d")).setOutputCol("features")
      .transform(reps.toSeq.toDF("value", "n_rows", "rep_qty")
        .select(col("value"), col("value").cast("double").as("linenumber_d"),
          col("rep_qty").cast("double").as("quantity_d")))
    val indexed = model.transform(repFrame).collect()
      .map(r => r.getAs[Long]("value") ->
        r.getAs[org.apache.spark.ml.linalg.Vector]("indexed")).toMap
    reps.sortBy(_._1).map { case (v, n, qty) =>
      val idx = catMap.get(v.toDouble).map(_.toLong).getOrElse(-1L)
      val vec = indexed(v)
      val transformOk = vec.size == 2 && vec(0) == idx.toDouble && vec(1) == qty
      (v, n, idx, nCategorical, transformOk)
    }.toSeq
      .toDF("value", "n_rows", "category_index", "n_categorical", "transform_ok")
  }

  /** Raw production-path probe: the fully indexed frame (fit once, then a
    * per-row map over feature 0 with feature 1 passed through).
    */
  def vectorIndexedFeatures(t: Tables): DataFrame =
    fitVectorIndexer(t).transform(assembledLineitems(t))
}

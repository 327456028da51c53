package graft.ml

import graft.core.Tables
import graft.functions.TextFunctions.{stopwordRatio, tokens}
import org.apache.spark.ml.classification.DecisionTreeClassifier
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weak-label quality-classifier distillation — the fastText-style model
  * every large text pipeline trains so the RULES (cheap but rigid
  * thresholds) become a MODEL (smooth scores, retunable threshold):
  * rule-band labels (the [[graft.operators.TextOps.qualityFilter]] band:
  * token count in [20, 100], stopword ratio ≥ 0.05) supervise a
  * decision-tree classifier over three cheap per-doc statistics. A tree
  * is the right distiller for a band label — axis-aligned splits express
  * the interval exactly, where a linear model structurally cannot (an
  * interval is not a half-plane) — and MLlib's tree fit is deterministic
  * for a fixed seed and dataset.
  *
  * Scale shape: feature extraction is row-parallel (no shuffle); the fit
  * aggregates split statistics via treeAggregate (map-side partials);
  * scoring is again row-parallel. At 100 TB the fit runs on a sampled
  * slice and the MODEL broadcasts to score the corpus — the gate keeps
  * fit and score on the same frame because the point gated here is
  * agreement with the weak labels, which is scale-free.
  *
  * Gate shape: exact counts (`n_docs`, `n_weak_pos` — both restated by
  * the DuckDB oracle from the same rule band) plus two verdict booleans
  * the oracle states as constants; [[graft.GateInvariants]] re-fits and
  * recomputes both verdicts independently so the gate cannot
  * self-certify.
  */
object QualityClassifier {

  /** Per-doc cheap statistics + the rule-band weak label. */
  private[graft] def trainingFrame(t: Tables): DataFrame =
    t.documents.select(
        col("doc_id"),
        size(tokens(col("text"))).cast("double").as("f_tokens"),
        stopwordRatio(col("text")).as("f_stopword"),
        col("n_chars").cast("double").as("f_chars"))
      .withColumn("label",
        when(col("f_tokens") >= 20 && col("f_tokens") <= 100 &&
          col("f_stopword") >= 0.05, 1.0).otherwise(0.0))

  /** Raw stats: fit a depth-5 tree on the weak labels, score the same
    * corpus, return (n_docs, n_weak_pos, training accuracy).
    */
  private[graft] def stats(t: Tables): (Long, Long, Double) = {
    val df = trainingFrame(t).cache()
    try {
      val assembled = new VectorAssembler()
        .setInputCols(Array("f_tokens", "f_stopword", "f_chars"))
        .setOutputCol("features")
        .transform(df)
      val model = new DecisionTreeClassifier()
        .setMaxDepth(5)
        .setSeed(7L)
        .setLabelCol("label")
        .setFeaturesCol("features")
        .fit(assembled)
      val agg = model.transform(assembled).agg(
        count(lit(1)),
        sum(col("label")).cast("long"),
        sum(when(col("prediction") === col("label"), 1L).otherwise(0L))).head()
      (agg.getLong(0), agg.getLong(1),
        agg.getLong(2).toDouble / agg.getLong(0))
    } finally df.unpersist()
  }

  /** Gate query: one row — exact label counts + the distillation
    * verdicts (tree reproduces its weak teacher at ≥ 98%, and the task
    * was nondegenerate: both classes present).
    */
  def classifierGate(t: Tables): DataFrame = {
    val (n, pos, acc) = stats(t)
    val spark = t.spark
    import spark.implicits._
    Seq((n, pos, acc >= 0.98, pos > 0 && pos < n))
      .toDF("n_docs", "n_weak_pos", "tree_accuracy_high",
        "labels_nondegenerate")
  }
}

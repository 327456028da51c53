package graft.operators

import graft.core.Tables
import graft.functions.TextFunctions.{stopwordRatio, tokens}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed intake pipeline — the "which documents survive ingestion, and
  * why" decision table a training-data pipeline actually ships. One call
  * composes four independently hash-gated stages into a per-document
  * verdict with the FIRST failing reason:
  *
  *  1. `quality`      — token-length band + stopword share
  *                      (the [[TextOps.qualityFilter]] predicate);
  *  2. `repetition`   — Gopher-style top-token dominance + duplicate
  *                      bigram fraction ([[TextOps.repetitionStats]]);
  *  3. `duplicate`    — not the min-doc_id representative of its exact
  *                      md5 text group within the intake corpus
  *                      ([[DedupOps.exactDedup]] winners);
  *  4. `contaminated` — shares ≥ 1 word 3-gram with the held-out eval
  *                      source ([[DedupOps.decontaminate]], zero-leak
  *                      threshold — benchmarks are small, so any overlap
  *                      is suspect).
  *
  * Scale shape: every stage keeps its own gate's plan (digest group-by,
  * per-row projections, broadcast eval shingles); the composition only
  * adds doc_id equi-joins carrying booleans — no text is re-shuffled to
  * combine verdicts. Eval-source docs are not intake candidates and are
  * excluded up front.
  */
object PipelineOps {

  def intakeDecisions(
      t: Tables,
      evalSource: String = "src15",
      minTokens: Int = 20,
      maxTokens: Int = 100,
      minStopRatio: Double = 0.05): DataFrame = {
    val cand = t.documentsBalanced
      .filter(col("source") =!= evalSource)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).as("n_tokens"),
        stopwordRatio(col("text")).as("swr"),
        md5(col("text")).as("digest"))
    val winners = cand.groupBy("digest").agg(min("doc_id").as("winner"))
    val rep = TextOps.repetitionStats(t)
      .select(col("doc_id"), col("keep").as("rep_ok"))
    val leaked = DedupOps.decontaminate(t, evalSource)
      .select(col("doc_id"), lit(1).as("leaked"))

    cand
      .join(winners, Seq("digest"))
      // left: a zero-token doc has no dominance rows — it fails `quality`
      // first, so a missing rep verdict must not drop the row
      .join(rep, Seq("doc_id"), "left")
      .join(leaked, Seq("doc_id"), "left")
      .withColumn("reason",
        when(!(col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens &&
               col("swr") >= minStopRatio), "quality")
          .when(!coalesce(col("rep_ok"), lit(false)), "repetition")
          .when(col("doc_id") =!= col("winner"), "duplicate")
          .when(col("leaked").isNotNull, "contaminated")
          .otherwise("kept"))
      .select(col("doc_id"), col("source"), col("reason"),
        (col("reason") === "kept").as("keep"))
      .orderBy("doc_id")
  }

  /** Per-(source, reason) rollup of [[intakeDecisions]] — the intake
    * dashboard: how much of each feed survives, and what kills the rest.
    */
  def intakeStats(t: Tables, evalSource: String = "src15"): DataFrame =
    intakeDecisions(t, evalSource)
      .groupBy("source", "reason")
      .agg(count(lit(1)).as("n"))
      .orderBy("source", "reason")
}

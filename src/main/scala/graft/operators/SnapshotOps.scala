package graft.operators

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the incremental-ingest primitive: two corpus
  * snapshots (yesterday's crawl, today's crawl) diffed into
  * added / removed / changed / unchanged per document, so downstream
  * stages (dedup, quality, embedding) re-process ONLY the added+changed
  * slice instead of the whole corpus ([[DedupOps.incrementalDedup]] is
  * the consumer of exactly this slice).
  *
  * Scale shape: both sides project (doc_id, source, md5(text)) BEFORE the
  * full-outer join, so the shuffle carries 16-byte digests, never text —
  * the same digests-only rule every dedup exchange in this engine
  * follows. Status is decided per row from null-ness + digest equality;
  * the stats rollup is a tiny per-(source, status) aggregate.
  */
object SnapshotOps {

  /** Per-document diff of two (doc_id, source, text) snapshots. Documents
    * present in both with equal digests report `unchanged`; callers that
    * want the re-process slice filter `status IN ('added','changed')`.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val da = a.select(col("doc_id"), col("source").as("src_a"),
      md5(col("text")).as("dig_a"))
    val db = b.select(col("doc_id"), col("source").as("src_b"),
      md5(col("text")).as("dig_b"))
    da.join(db, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        coalesce(col("src_b"), col("src_a")).as("source"),
        when(col("dig_a").isNull, "added")
          .when(col("dig_b").isNull, "removed")
          .when(col("dig_a") =!= col("dig_b"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** The deterministic second snapshot the gate diffs against (a stand-in
    * for "today's crawl", derived purely from the fixture so the oracle
    * can restate it): doc_id % 7 == 0 dropped (removals), text upper-cased
    * where doc_id % 11 == 0 (changes), and every doc_id % 13 == 0 re-added
    * under doc_id + 2^40 (additions — the shift sits far above any
    * plausible doc_id, so re-added ids cannot collide with genuine ones
    * at any fixture scale). */
  private[operators] def syntheticSnapshotB(t: Tables): DataFrame = {
    val base = t.documents
      .filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 11 === 0, upper(col("text")))
          .otherwise(col("text")).as("text"))
    val added = t.documents
      .filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + (1L << 40)).as("doc_id"), col("source"), col("text"))
    base.unionByName(added)
  }

  /** Gate query: per-(source, status) counts of the fixture-vs-synthetic-B
    * diff. A doc_id divisible by both 7 and 11 is dropped before the text
    * change can apply — `removed` wins, which the oracle's derivation
    * reproduces structurally.
    */
  def snapshotDiffStats(t: Tables): DataFrame =
    snapshotDiff(t.documents.select("doc_id", "source", "text"), syntheticSnapshotB(t))
      .groupBy("source", "status")
      .agg(count(lit(1)).as("n"))
      .orderBy("source", "status")
}

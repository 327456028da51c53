package graft.operators

import graft.core.Tables
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index build and lookup — the secondary-index pattern a corpus
  * search layer keeps beside the primary table: (token, doc_id, doc
  * metadata) rows persisted once, so keyword queries read index rows
  * instead of scanning (and tokenizing) the corpus.
  *
  * Scale notes: the index is ~tokens-per-doc × corpus rows of small
  * fixed-width records — at 100 TB it would be written partitioned (or
  * bucketed) BY TOKEN hash so a keyword lookup prunes to one partition's
  * files via the same manifest machinery as
  * [[graft.sources.ParquetStats]]; the fixture-scale build here writes a
  * plain parquet dir and lets the parquet token min/max stats do the
  * pruning. Build cost is one corpus pass; lookups never touch `text`
  * again.
  */
object IndexOps {

  private val indexDirCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long), String]

  /** Materialize the inverted index for the fixture's documents (one
    * (token, doc_id, n_chars) row per DISTINCT token per doc), once per
    * fixture generation.
    */
  def invertedIndexDir(t: Tables): String =
    Tables.cachedPathPerGeneration(indexDirCache, t.dir, "documents.parquet") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_inverted_index").toString
      t.documents.filter(col("text").isNotNull)
        .select(col("doc_id"), col("n_chars"),
          explode(array_distinct(tokens(col("text")))).as("token"))
        .write.mode("overwrite").parquet(dir)
      dir
    }

  /** Keyword lookup answered from the STORED index — per probe token,
    * the matching-doc count, char mass, and doc-id extent. No corpus
    * scan, no tokenization at query time.
    */
  def indexLookup(t: Tables, probes: Seq[String]): DataFrame =
    t.spark.read.parquet(invertedIndexDir(t))
      .filter(col("token").isin(probes: _*))
      .groupBy("token")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("token")

  /** Gate query: three keyword lookups via the index, against an oracle
    * that SCANS (tokenize + membership per doc) — the hash proves the
    * stored index answers exactly what a full scan would.
    */
  def indexLookupGate(t: Tables): DataFrame =
    indexLookup(t, Seq("spark", "stream", "join"))

  // ---------------------------------------------------------------------
  // Token-clustered index layout — zone-map pruning on the postings
  // themselves (the composition that makes an inverted index work at
  // 100 TB: the index is ALSO a table, so the same manifest machinery
  // that prunes fact scans prunes index lookups).
  // ---------------------------------------------------------------------

  private val clusteredDirCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long), String]

  /** The inverted index rewritten range-clustered by token (8 files,
    * sorted within files), once per fixture generation — per-file token
    * [min,max] zone maps become disjoint-ish, so a keyword lookup opens
    * only the file(s) whose extent can contain the probe.
    */
  def clusteredIndexDir(t: Tables): String =
    Tables.cachedPathPerGeneration(clusteredDirCache, t.dir, "documents.parquet") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_index_clustered").toString
      t.spark.read.parquet(invertedIndexDir(t))
        .repartitionByRange(8, col("token"))
        .sortWithinPartitions("token")
        .write.mode("overwrite").parquet(dir)
      dir
    }

  /** Gate query: one keyword lookup answered by pruning the clustered
    * index with its own string zone maps ([[graft.sources.ParquetStats
    * .prunedScanString]] — files skipped before being OPENED), then
    * aggregating the kept postings. The rollup hash-matches the oracle's
    * tokenizing scan (pruning must be invisible in the result);
    * `skipped_some` is oracle-stated TRUE and GateInvariants-recomputed,
    * so a layout that stopped pruning fails loudly.
    */
  def prunedIndexLookupGate(t: Tables, probe: String = "spark"): DataFrame = {
    val (kept, n, total) = prunedIndexLookupRaw(t, probe)
    kept.groupBy("token")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .withColumn("skipped_some", lit(n < total))
      .orderBy("token")
  }

  /** Recompute seam: (pruned postings, files kept, files total). */
  private[graft] def prunedIndexLookupRaw(t: Tables, probe: String)
      : (DataFrame, Int, Int) = {
    val (df, kept, total) = graft.sources.ParquetStats
      .prunedScanString(t, clusteredIndexDir(t), "token", probe)
    (df, kept, total)
  }

  // ---------------------------------------------------------------------
  // Incremental index maintenance — postings refreshed from a CDC batch,
  // never a corpus rebuild.
  // ---------------------------------------------------------------------

  /** Postings (token, doc_id, n_chars) with n_chars derived from the
    * text itself, so the SAME derivation applies to base docs and CDC
    * after-images.
    */
  private[operators] def postings(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        explode(array_distinct(tokens(col("text")))).as("token"))

  /** Refresh an inverted index from a CDC changes feed WITHOUT
    * rebuilding: every touched doc's old postings anti-join out (the
    * touched set is |changes|-bound — broadcastable), then the
    * insert/update after-images contribute fresh postings. The corpus
    * text is never re-read; at 100 TB this is the difference between a
    * nightly index rebuild and a minutes-long refresh.
    */
  def incrementalIndexUpdate(index: DataFrame, changes: DataFrame): DataFrame = {
    val touched = changes.select("doc_id").distinct()
    index.join(broadcast(touched), Seq("doc_id"), "left_anti")
      .unionByName(postings(
        changes.filter(col("op").isin("insert", "update"))
          .select("doc_id", "text")))
  }

  /** Gate query: keyword lookups over the MAINTAINED index (base postings
    * + one CDC refresh) against an oracle that tokenize-scans its own
    * derivation of the next snapshot — the hash proves the refreshed
    * index is exactly the index a full rebuild of B would produce, on
    * the probed tokens.
    */
  def incrementalIndexLookupGate(t: Tables): DataFrame = {
    val base = postings(t.documents.select("doc_id", "text"))
    val refreshed = incrementalIndexUpdate(base, SnapshotOps.syntheticChanges(t))
    refreshed.filter(col("token").isin("spark", "stream", "join"))
      .groupBy("token")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("token")
  }
}

package graft.operators

import graft.SparkTestBase
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.functions._

class IndexOpsSpec extends SparkTestBase {

  test("index lookup equals a direct tokenizing scan for every probe") {
    val probes = Seq("spark", "stream", "join")
    val got = IndexOps.indexLookup(t, probes).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val direct = t.documents.filter(col("text").isNotNull)
      .select(col("doc_id"), col("n_chars"),
        explode(array_distinct(tokens(col("text")))).as("token"))
      .filter(col("token").isin(probes: _*))
      .groupBy("token")
      .agg(count(lit(1)), sum("n_chars").cast("long"),
        min("doc_id"), max("doc_id"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == direct)
    assert(got.keySet == probes.toSet, "every probe token occurs in the fixture")
  }

  test("the stored index is complete: row count equals the corpus' distinct-token mass") {
    val stored = spark.read.parquet(IndexOps.invertedIndexDir(t))
    assert(stored.columns.toSet == Set("doc_id", "n_chars", "token"))
    val expected = t.documents.filter(col("text").isNotNull)
      .select(size(array_distinct(tokens(col("text")))).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(stored.count() == expected)
    // (token, doc_id) is a key — no duplicate postings
    assert(stored.select("token", "doc_id").distinct().count() == expected)
  }

  test("incremental index refresh equals a full rebuild of the next snapshot") {
    val base = IndexOps.postings(t.documents.select("doc_id", "text"))
    val refreshed = IndexOps.incrementalIndexUpdate(
      base, SnapshotOps.syntheticChanges(t))
    val rebuild = IndexOps.postings(
      SnapshotOps.syntheticSnapshotB(t).select("doc_id", "text"))
    assert(refreshed.exceptAll(rebuild).isEmpty &&
      rebuild.exceptAll(refreshed).isEmpty,
      "maintained postings diverge from a full rebuild")
    // deleted docs leave no orphan postings
    val deleted = SnapshotOps.syntheticChanges(t)
      .filter(col("op") === "delete").select("doc_id")
    assert(refreshed.join(deleted, "doc_id").count() == 0)
  }

  test("lookups never scan the corpus: the plan reads the index dir only") {
    val plan = IndexOps.indexLookupGate(t).queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      "index lookup still scans the corpus")
    assert(plan.contains("graft_inverted_index"),
      "index lookup does not read the stored index")
  }
}

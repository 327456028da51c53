package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-graph primitives needed by the dedup pipeline. Spark has no
  * built-in graph operator surface (GraphX is RDD-era and not part of the
  * SQL engine), so connected components is implemented as iterative
  * relational algebra over the edge list — the standard DataFrame-native
  * formulation.
  */
object GraphOps {

  /** Connected components by min-label propagation.
    *
    * Input: an undirected edge list as (a, b) pairs (any column names,
    * positional). Output: one row per node — `id`, `label` (= the minimum
    * node id in its component).
    *
    * Every node starts labelled with itself; each round takes the min of
    * its own and its neighbours' labels; converged when nothing changes.
    * Rounds = component diameter, so near-dup graphs (near-cliques,
    * diameter ≲ 3) converge in 2–4 rounds; each round is one shuffle of
    * the cached edge list joined to current labels. `localCheckpoint`
    * truncates lineage so round N's plan does not replay rounds 1..N-1.
    * The driver loop reads ONE scalar per round (changed-label count) —
    * data stays on the executors. For adversarial long-chain graphs use a
    * large-star/small-star variant (O(log n) rounds); dup graphs don't
    * need it.
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 20): DataFrame = {
    val Array(ca, cb) = pairs.columns.take(2)
    // materialize the (possibly expensive) pair pipeline ONCE before the
    // union doubles it into an edge list — without this the upstream query
    // (e.g. the whole minhash pipeline) executes twice to fill the cache
    val p = pairs.select(col(ca).as("src"), col(cb).as("dst")).localCheckpoint(true)
    val edges = p
      .union(p.select(col("dst").as("src"), col("src").as("dst")))
      .cache()

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var rounds  = 0
    while (changed > 0 && rounds < maxRounds) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(edges("src"))
        .agg(min("label").as("nmin"))
      val updated = labels
        .join(neighborMin, labels("id") === neighborMin("src"), "left")
        .select(
          col("id"),
          col("label").as("old_label"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint(true)
      changed = updated.filter(col("label") < col("old_label")).count()
      labels = updated.select("id", "label")
      rounds += 1
    }
    require(changed == 0, s"label propagation did not converge in $maxRounds rounds")
    edges.unpersist()
    labels
  }

  /** [[connectedComponents]] plus per-component sizes, in the dedup output
    * shape: (doc_id, cluster_rep, cluster_size) ordered by doc_id.
    */
  def clusters(pairs: DataFrame): DataFrame = {
    val labels = connectedComponents(pairs)
    val sizes  = labels.groupBy("label").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("cluster_rep"), col("cluster_size"))
      .orderBy("doc_id")
  }
}

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
    * data stays on the executors. If the graph has not converged after
    * `maxRounds` (component diameter > maxRounds — e.g. a chain of
    * drifting near-duplicate revisions a→b→c→…), the method falls back to
    * [[starContractionComponents]], which needs only O(log n) rounds
    * regardless of diameter, instead of failing.
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

    // seed labels with the closed-neighbourhood min: one aggregation over
    // the edge list performs what used to be a distinct() PLUS the whole
    // first propagation round (3 shuffles + a checkpoint) — cliques are
    // fully labelled at seed time and only pay the convergence check.
    // Every node appears as `src` in the symmetrised edge list, so
    // coverage is complete, and the seed is a node id from the same
    // component, so min-propagation still converges to the component min.
    var labels = edges.groupBy("src")
      .agg(min("dst").as("nmin"))
      .select(col("src").as("id"), least(col("src"), col("nmin")).as("label"))
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
    edges.unpersist()
    if (changed == 0) labels
    else starContractionComponents(pairs) // diameter > maxRounds: O(log n)-round algorithm
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14 — public algorithm). Same output contract as
    * [[connectedComponents]]: one row per node, (`id`, `label` = min node
    * id in its component).
    *
    * Unlike min-label propagation (rounds = diameter), star contraction
    * halves every path each round, so a 1,000-node chain converges in
    * ~O(log n) ≈ 10 rounds. Each round is two grouped aggregations + two
    * joins on the current edge list — all hash-partitioned on the node id,
    * no driver-side data. Convergence is detected from two scalars per
    * round (edge count + sum of xxhash64 over the canonicalized edge set);
    * a false positive needs a 64-bit hash-sum collision between
    * consecutive rounds, which is negligible against the cost of an exact
    * `EXCEPT` every round at 100 TB.
    */
  def starContractionComponents(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    val Array(ca, cb) = pairs.columns.take(2)
    val p0 = pairs.select(col(ca).as("src"), col(cb).as("dst"))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint(true)
    val allNodes = p0.select(col("src").as("id"))
      .union(p0.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)

    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(
        count(lit(1)).as("n"),
        coalesce(sum(xxhash64(col("src"), col("dst"))), lit(0L)).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }

    var edges = p0.distinct().localCheckpoint(true)
    var sig    = checksum(edges)
    var rounds = 0
    var done   = false
    while (!done && rounds < maxRounds) {
      val next    = smallStar(largeStar(edges)).localCheckpoint(true)
      val nextSig = checksum(next)
      done = nextSig == sig
      edges = next
      sig = nextSig
      rounds += 1
    }
    require(done, s"star contraction did not converge in $maxRounds rounds")
    // converged edge set is a star forest: every edge is (child, root) with
    // child > root; roots (and any node only ever seen as a root) label themselves
    val starMap = edges.select(col("src").as("id"), col("dst").as("label"))
    allNodes.join(starMap, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
  }

  /** Large-star: every node attaches its strictly-larger neighbours to the
    * minimum of its closed neighbourhood. One agg + one join, both hash
    * partitioned on `src`.
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val mins = sym.groupBy("src").agg(min("dst").as("mn"))
      .select(col("src"), least(col("src"), col("mn")).as("m"))
    sym.filter(col("dst") > col("src"))
      .join(mins, "src")
      .select(col("dst").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Small-star: every node attaches its smaller-or-equal neighbours (and
    * itself) to the minimum among them. Edges are first oriented
    * large→small so each undirected edge is processed at its larger
    * endpoint.
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
    val mins = oriented.groupBy("src").agg(min("dst").as("m")) // m <= every dst <= src
    oriented.join(mins, "src")
      .select(col("dst").as("v"), col("m"))
      .union(mins.select(col("src").as("v"), col("m")))
      .filter(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
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

package graft.operators

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column- and distribution-profiling operators — the ANALYZE TABLE /
  * data-profiling layer that feeds optimizer statistics, manifest
  * pruning, and data drift monitoring.
  *
  * Scale shape: every profile here is aggregation-only — constant-size
  * state per partition, one low-cardinality exchange, no row-level
  * output. The histogram is the standard two-pass form (extent pass →
  * bucket pass); both passes are full scans but each shuffles only
  * #buckets (or 1) rows.
  */
object ProfileOps {

  /** Equi-width histogram of a numeric column: 10 buckets spanning
    * [min, max], the last bucket right-closed (the `least(…, 9)` clamp
    * puts x = max in bucket 9 instead of a phantom bucket 10). Bucket
    * arithmetic is pure IEEE ops on exact inputs — (x−mn)/((mx−mn)/10)
    * then floor — so DuckDB computes bit-identical buckets.
    */
  def histogram(df: DataFrame, column: String, buckets: Int = 10): DataFrame = {
    val extent = df.agg(
      min(col(column).cast("double")).as("mn"),
      max(col(column).cast("double")).as("mx"))
    df.filter(col(column).isNotNull)
      .crossJoin(broadcast(extent))
      .withColumn("bucket",
        least(floor((col(column).cast("double") - col("mn")) /
          ((col("mx") - col("mn")) / buckets)), lit(buckets - 1L)).cast("int"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(column).cast("double")).as("bucket_min"),
        max(col(column).cast("double")).as("bucket_max"))
      .orderBy("bucket")
  }

  /** Gate query: order-price histogram. */
  def priceHistogram(t: Tables): DataFrame = histogram(t.orders, "o_totalprice")

  /** ANALYZE-style per-column statistics for the orders table: row count,
    * null count, exact NDV, and typed min/max (long columns fill the
    * _long pair, double columns the _double pair, others neither — the
    * typed-zone-map convention from [[graft.sources.ParquetStats]]).
    * ONE pass over the table: the five NDVs ride one aggregate (Catalyst
    * plans a single Expand), so adding a column to the profile never adds
    * a scan.
    */
  def analyzeOrders(t: Tables): DataFrame = {
    val o = t.orders
    def nulls(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L))
    val wide = o.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("o_orderkey")).as("ndv_orderkey"),
      countDistinct(col("o_custkey")).as("ndv_custkey"),
      countDistinct(col("o_orderstatus")).as("ndv_status"),
      countDistinct(col("o_orderpriority")).as("ndv_priority"),
      countDistinct(col("o_totalprice")).as("ndv_price"),
      nulls("o_orderkey").as("nn_orderkey"),
      nulls("o_custkey").as("nn_custkey"),
      nulls("o_orderstatus").as("nn_status"),
      nulls("o_orderpriority").as("nn_priority"),
      nulls("o_totalprice").as("nn_price"),
      min(col("o_orderkey").cast("long")).as("mn_orderkey"),
      max(col("o_orderkey").cast("long")).as("mx_orderkey"),
      min(col("o_custkey").cast("long")).as("mn_custkey"),
      max(col("o_custkey").cast("long")).as("mx_custkey"),
      min(col("o_totalprice").cast("double")).as("mnd_price"),
      max(col("o_totalprice").cast("double")).as("mxd_price"))
    wide.select(col("n_rows"), expr(
      """stack(5,
        |  'o_orderkey',      ndv_orderkey, nn_orderkey, mn_orderkey, mx_orderkey, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  'o_custkey',       ndv_custkey,  nn_custkey,  mn_custkey,  mx_custkey,  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  'o_orderstatus',   ndv_status,   nn_status,   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  'o_orderpriority', ndv_priority, nn_priority, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  'o_totalprice',    ndv_price,    nn_price,    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), mnd_price, mxd_price
        |) AS (column, n_distinct, n_nulls, min_long, max_long, min_double, max_double)""".stripMargin))
      .select("column", "n_rows", "n_distinct", "n_nulls",
        "min_long", "max_long", "min_double", "max_double")
      .orderBy("column")
  }

  // ---------------------------------------------------------------------
  // Join-cardinality estimation — count-min inner product.
  // ---------------------------------------------------------------------

  /** One count-min sketch as a DATAFRAME: (row i, bucket, count) for
    * depth hash rows of `width` buckets. Built in one pass over the
    * table; the exchange carries at most depth×width partial counts per
    * input partition (map-side combine makes the sketch state, not the
    * data, cross the wire) — this is how a sketch is built when one
    * executor can't see all rows.
    */
  private[operators] def cmsTable(df: DataFrame, key: String,
                                  depth: Int, width: Int): DataFrame =
    df.filter(col(key).isNotNull)
      .select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("i"),
          pmod(xxhash64(col(key), lit(i)), lit(width.toLong)).as("bucket"))): _*))
        .as("rb"))
      .groupBy(col("rb.i").as("i"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Join-size estimate WITHOUT running the join: the count-min inner
    * product — Σ_b cntA(i,b)·cntB(i,b) per hash row, min over rows
    * (Cormode–Muthukrishnan). The estimate never under-counts (every
    * true matching pair lands in the same bucket on every row; collisions
    * only add), and E[overshoot] ≤ |A|·|B|/width per row. At 100 TB this
    * is the join-planning primitive: both sketches are depth×width
    * aggregates a planner keeps per column, and the estimate costs a
    * (i,bucket)-keyed join of two tiny tables — not a pass over either
    * input.
    */
  private[operators] def cmsJoinSizeRaw(a: DataFrame, aKey: String,
                                        b: DataFrame, bKey: String,
                                        depth: Int, width: Int): DataFrame = {
    val sa = cmsTable(a, aKey, depth, width)
    val sb = cmsTable(b, bKey, depth, width)
      .withColumnRenamed("cnt", "cnt_b")
    sa.join(sb, Seq("i", "bucket"))
      .groupBy("i")
      .agg(sum(col("cnt") * col("cnt_b")).as("ip"))
      .agg(min(col("ip")).cast("long").as("est_size"))
  }

  /** The gate's default sketch width — shared with `GateInvariants` so
    * the emitted `within_bound` and the independent recomputation use
    * definitionally the same slack.
    */
  val cmsJoinWidth: Int = 65536

  /** The Markov overshoot slack at the min over depth rows:
    * 5·|A|·|B|/width. One definition for the gate AND the invariant.
    */
  def cmsJoinSlack(nLeft: Long, nRight: Long, width: Int): Double =
    5.0 * nLeft * nRight / width

  /** Raw one-row estimate frame — the recompute seam for
    * `GateInvariants` and the spec: (n_left, n_right, exact_size,
    * est_size). `exact_size` comes from the frequency-vector dot product
    * (Σ_k fA(k)·fB(k)), never a materialized join.
    */
  def cmsJoinSizeEstimates(t: Tables, depth: Int = 5,
                           width: Int = cmsJoinWidth): DataFrame = {
    val a = t.lineitem.select(col("l_partkey").as("k"))
    val b = t.part.select(col("p_partkey").as("k"))
    val fa = a.groupBy("k").agg(count(lit(1)).as("fa"))
    val fb = b.groupBy("k").agg(count(lit(1)).as("fb"))
    val exact = fa.join(fb, "k")
      .agg(coalesce(sum(col("fa") * col("fb")), lit(0L)).cast("long")
        .as("exact_size"))
    val counts = a.agg(count(lit(1)).as("n_left"))
      .crossJoin(broadcast(b.agg(count(lit(1)).as("n_right"))))
    counts
      .crossJoin(broadcast(exact))
      .crossJoin(broadcast(cmsJoinSizeRaw(a, "k", b, "k", depth, width)))
  }

  /** Join-skew report — "which keys will dominate this join's output":
    * top-k keys of the events×events self-join on user_id ranked by
    * their output contribution f(k)² (the quantity AQE's skew-join
    * split and manual salting decide on). Aggregation + top-k only —
    * the join itself never runs; the report costs one groupBy and a
    * TakeOrderedAndProject.
    */
  def joinSkewTopK(t: Tables, k: Int = 10): DataFrame =
    t.events.filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
      .withColumn("contribution", col("n_events") * col("n_events"))
      .orderBy(col("contribution").desc, col("user_id").asc)
      .limit(k)
      .select("user_id", "n_events", "contribution")

  /** Gate query: lineitem⋈part cardinality estimated from sketches vs
    * the exact size. The oracle states the exact terms and TRUE for the
    * two verdicts; GateInvariants recomputes both from
    * [[cmsJoinSizeEstimates]]:
    *  - `never_under`: est ≥ exact (hard CMS guarantee);
    *  - `within_bound`: est ≤ exact + 5·|A|·|B|/width (Markov slack on
    *    the per-row expectation, taken at the min over depth rows).
    */
  def cmsJoinSizeGate(t: Tables, depth: Int = 5,
                      width: Int = cmsJoinWidth): DataFrame =
    cmsJoinSizeEstimates(t, depth, width).select(
      col("n_left"), col("n_right"), col("exact_size"),
      (col("est_size") >= col("exact_size")).as("never_under"),
      (col("est_size").cast("double") <= col("exact_size").cast("double") +
        lit(5.0) * col("n_left").cast("double") * col("n_right").cast("double") /
          lit(width.toDouble)).as("within_bound"))

  // ---------------------------------------------------------------------
  // Incremental statistics maintenance (round 12): ANALYZE without the
  // rescan. count / null-count / sum maintain under ANY CDC feed (signed
  // deltas — the agg_incremental_rollup machinery); min / max maintain
  // under INSERT-ONLY feeds (they only ever tighten monotonically — a
  // delete may retract the current extremum, forcing a rescan or a
  // sketch); exact NDV never maintains (the KMV/HLL sketch routes,
  // sketch_kmv_merge / sketch_hll_merge, are the mergeable substitute).
  // This gate exercises exactly the insert-monotone class.
  // ---------------------------------------------------------------------

  /** One stats row (count, per-column null counts, typed min/max) — the
    * per-column ANALYZE payload for a (source, n_chars) projection.
    */
  private[operators] def statsRow(df: DataFrame): DataFrame = df.agg(
    count(lit(1)).as("n_rows"),
    // coalesce: an EMPTY batch must contribute zero null-counts, not a
    // null that poisons the maintained sum (count is already 0; min/max
    // stay null and least/greatest skip nulls on both engines)
    coalesce(sum(when(col("n_chars").isNull, 1L).otherwise(0L)), lit(0L))
      .as("n_nulls_chars"),
    min(col("n_chars")).as("min_chars"),
    max(col("n_chars")).as("max_chars"),
    coalesce(sum(when(col("source").isNull, 1L).otherwise(0L)), lit(0L))
      .as("n_nulls_source"),
    min(col("source")).as("min_source"),
    max(col("source")).as("max_source"))

  /** Gate query: maintain the base corpus' column stats through the
    * INSERT-ONLY slice of the CDC feed — base stats + insert-batch stats
    * combined with add / least / greatest, the corpus never rescanned
    * (the insert batch is |changes|-bound; both stats frames are one
    * row). SELF-PROVING: the oracle states the same stats DIRECTLY over
    * base ∪ inserts, so the hash proves maintained == recomputed for
    * every column.
    */
  def incrementalColumnStats(t: Tables): DataFrame = {
    val base = t.documents.select(col("source"), col("n_chars"))
    val ins = SnapshotOps.syntheticChanges(t)
      .filter(col("op") === "insert")
      .select(col("source"), length(col("text")).cast("long").as("n_chars"))
    val b = statsRow(base)
    val i = statsRow(ins).withColumnsRenamed(
      Map("n_rows" -> "i_n_rows", "n_nulls_chars" -> "i_n_nulls_chars",
        "min_chars" -> "i_min_chars", "max_chars" -> "i_max_chars",
        "n_nulls_source" -> "i_n_nulls_source",
        "min_source" -> "i_min_source", "max_source" -> "i_max_source"))
    b.crossJoin(broadcast(i)).select(
      (col("n_rows") + col("i_n_rows")).as("n_rows"),
      (col("n_nulls_chars") + col("i_n_nulls_chars")).as("n_nulls_chars"),
      least(col("min_chars"), col("i_min_chars")).as("min_chars"),
      greatest(col("max_chars"), col("i_max_chars")).as("max_chars"),
      (col("n_nulls_source") + col("i_n_nulls_source")).as("n_nulls_source"),
      least(col("min_source"), col("i_min_source")).as("min_source"),
      greatest(col("max_source"), col("i_max_source")).as("max_source"))
  }
}

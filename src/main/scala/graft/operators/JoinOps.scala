package graft.operators

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import graft.functions.NumericFunctions.{decAvg, decSum, roundN}
import org.apache.spark.sql.functions._

/** Join / set-operation surface (SURVEY.md §2.3 — capability parity; the
  * reference is single-table, so semantics are standard SQL).
  *
  * Scale stance: dimension tables (region 5 rows, nation 25, supplier,
  * part) are always broadcast — at 100 TB the fact side never shuffles for
  * a dim join. Fact-to-fact joins (orders ⋈ lineitem) shuffle on the join
  * key and lean on AQE for skew splitting; both sides arrive hash-
  * partitioned on the key so downstream groupBy on the same key reuses the
  * exchange.
  */
object JoinOps {

  /** Star-schema rollup: customer ⋈ nation ⋈ region (both dims broadcast)
    * → per-region customer count + avg account balance.
    */
  def customersPerRegion(t: Tables): DataFrame =
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        count(lit(1)).as("num_customers"),
        roundN(decAvg(col("c_acctbal")), 2).as("avg_acctbal"))
      .orderBy("r_name")

  /** Fact ⋈ fact: revenue per order priority. The shuffle partitions both
    * sides on orderkey; the groupBy key is low-cardinality so the final
    * aggregate is a cheap second exchange of #groups rows per partition.
    */
  def revenueByPriority(t: Tables): DataFrame =
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        roundN(decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("num_items"))
      .orderBy("o_orderpriority")

  /** Broadcast dim join on the fact table: revenue by part brand. */
  def revenueByBrand(t: Tables): DataFrame =
    t.lineitem
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(roundN(decSum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy("p_brand")

  /** Snowflake star join (TPC-H Q5 shape): the fact table walks the
    * supplier → nation → region dimension chain, all three dims
    * broadcast — the fact side never shuffles for the joins; the only
    * exchange is the final low-cardinality rollup. At 100 TB this is the
    * canonical plan for dimensional enrichment: each executor streams its
    * fact partitions against replicated hash maps.
    */
  def supplierVolumeByRegion(t: Tables): DataFrame =
    t.lineitem
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        roundN(decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        countDistinct("s_suppkey").as("n_suppliers"))
      .orderBy("r_name", "n_name")

  /** LEFT SEMI = EXISTS: customers that have at least one order. */
  def customersWithOrders(t: Tables): DataFrame =
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")

  /** LEFT ANTI = NOT EXISTS: customers with no orders. */
  def customersWithoutOrders(t: Tables): DataFrame =
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** LEFT OUTER with null-patching coalesce: order count per customer
    * including zero-order customers.
    */
  def orderCountPerCustomer(t: Tables): DataFrame =
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("num_orders"))
      .orderBy("c_custkey")

  /** UNION ALL of two status slices, re-aggregated. */
  def unionSlices(t: Tables): DataFrame = {
    val f = t.orders.filter(col("o_orderstatus") === "F")
    val p = t.orders.filter(col("o_orderstatus") === "P")
    f.unionAll(p)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  /** EXCEPT (distinct): high-value order keys that are not 'F' status. */
  def exceptSlices(t: Tables): DataFrame = {
    val high = t.orders.filter(col("o_totalprice") > 200000).select("o_orderkey")
    val f    = t.orders.filter(col("o_orderstatus") === "F").select("o_orderkey")
    high.except(f)
  }

  /** INTERSECT (distinct): customers appearing in both halves of a split. */
  def intersectSlices(t: Tables): DataFrame = {
    val early = t.orders.filter(year(col("o_orderdate")) <= 1998).select("o_custkey")
    val late  = t.orders.filter(year(col("o_orderdate")) >= 1999).select("o_custkey")
    early.intersect(late)
  }

  /** EXCEPT ALL (multiset): each key keeps max(0, n_left − n_right)
    * copies — the bag difference the distinct EXCEPT collapses. Rolled up
    * to per-key copy counts so the gate output is deterministic.
    */
  def exceptAllSlices(t: Tables): DataFrame = {
    val early = t.orders.filter(year(col("o_orderdate")) <= 1998).select("o_custkey")
    val late  = t.orders.filter(year(col("o_orderdate")) >= 1999).select("o_custkey")
    early.exceptAll(late)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_copies"))
      .orderBy("o_custkey")
  }

  /** INTERSECT ALL (multiset): each key keeps min(n_left, n_right) copies. */
  def intersectAllSlices(t: Tables): DataFrame = {
    val early = t.orders.filter(year(col("o_orderdate")) <= 1998).select("o_custkey")
    val late  = t.orders.filter(year(col("o_orderdate")) >= 1999).select("o_custkey")
    early.intersectAll(late)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_copies"))
      .orderBy("o_custkey")
  }

  /** unionByName with allowMissingColumns — the heterogeneous-feed shape:
    * two extracts of the same entity with different column sets are
    * aligned BY NAME (positional union would silently mis-assign) and the
    * columns one side lacks are null-filled. The rollup counts non-null
    * per aligned column, so the gate pins exactly which side contributed
    * which column. Column alignment is resolved at plan time — zero
    * runtime cost over a plain union.
    */
  def unionByNameSlices(t: Tables): DataFrame = {
    val a = t.customer.filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val b = t.customer.filter(col("c_acctbal") <= 0)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    a.unionByName(b, allowMissingColumns = true)
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n"),
        count(col("c_acctbal")).as("n_with_balance"),
        count(col("c_name")).as("n_with_name"))
      .orderBy("c_mktsegment")
  }

  /** Salted equi-join for skewed keys: when one join-key value carries a
    * disproportionate share of the fact rows, the standard hash shuffle
    * sends that whole share to ONE reducer. Salting splits each fact row
    * into one of `salts` sub-keys and replicates the (small, but not
    * broadcastable) build side once per salt, so a hot key fans out over
    * `salts` reducers. AQE's skew-join handles this at runtime for sort-
    * merge joins; the explicit form works on any plan shape and any Spark
    * deployment, and is the pattern to reach for at 100 TB when a key's
    * share exceeds a single executor's memory.
    *
    * Semantics are exactly `fact.join(build, key)` (inner) — proven by the
    * equivalence spec. The salt column is derived from
    * monotonically_increasing_id, so rows spread evenly regardless of the
    * key distribution; its value never affects the result, only placement.
    */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!fact.columns.contains("_salt") && !build.columns.contains("_salt"),
      "saltedJoin reserves the _salt column; rename or drop it on the inputs first")
    val saltedFact = fact.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val explodedBuild = build.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(explodedBuild, Seq(key, "_salt")).drop("_salt")
  }

  /** [[saltedJoin]] on the correctness surface (round-10, was spec-only):
    * events joined to a 5-row category dim on `event_type` — a genuinely
    * skewed key (5 distinct values at ~20% of all rows each, so an
    * unsalted hash exchange lands the whole table on ≤5 reducers no
    * matter how wide the cluster), then a per-category rollup.
    *
    * The gate pins SEMANTICS: salting must be invisible in the result
    * (equal to the plain equi-join the DuckDB oracle states). The shuffle
    * mechanics — hot-task share halving under a forced sort-merge join —
    * are pinned separately in SkewStressSpec; at this dim size Spark
    * rightly broadcasts and the salt column is just carried, which is
    * exactly the right plan (salting only pays when the build side is too
    * big to broadcast AND the probe key is hot).
    */
  def saltedEventCategoryAgg(t: Tables, salts: Int = 8): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val dim = Seq(
      "click" -> "engagement", "view" -> "engagement",
      "purchase" -> "commerce", "signup" -> "commerce",
      "error" -> "system")
      .toDF("event_type", "category")
    saltedJoin(t.events.select(col("event_type"), col("value")), dim,
        "event_type", salts)
      .groupBy("category")
      .agg(count(lit(1)).as("n"),
        roundN(decSum(col("value")), 2).as("total_value"))
  }

  /** Scalar "subquery" done engine-side (ref flattens it by hand through the
    * driver, `data-understanding.py:229-232`): orders above the global mean
    * price, counted per status. The 1-row aggregate is broadcast.
    */
  def aboveAveragePrice(t: Tables): DataFrame = {
    // decAvg: the threshold must be the bit-identical double in both
    // engines, or a customer sitting within 1 ulp of the mean flips sides.
    val mean = t.orders.agg(decAvg(col("o_totalprice")).as("mean_price"))
    t.orders
      .crossJoin(broadcast(mean))
      .filter(col("o_totalprice") > col("mean_price"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_above_avg"))
      .orderBy("o_orderstatus")
  }
}

package graft.operators

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import graft.functions.NumericFunctions.{decAvg, roundN}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Window-function surface (SURVEY.md §2.5 W1–W2 plus the analytic
  * neighbourhood the reference never reaches: rank/lag/lead/frames).
  *
  * Scale stance: every window here is PARTITIONED (by custkey / segment) —
  * the work is one hash shuffle then per-partition sort, embarrassingly
  * parallel. The reference's global-order `row_number` (W1,
  * `data-understanding.py:211-214`) is a known single-partition hazard; it
  * only ever appears over already-aggregated tiny frames (see
  * CoreQueries.q3StatusShare) or is replaced by a partitioned window +
  * deterministic key sort.
  */
object WindowOps {

  /** W2 analogue: row_number per partition, top-3 customers by balance per
    * market segment. Unique custkey tiebreak keeps it deterministic.
    */
  def topCustomersPerSegment(t: Tables): DataFrame = {
    val w = Window
      .partitionBy("c_mktsegment")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    t.customer
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
  }

  /** Running total per customer over order time (frame agg). */
  def runningRevenuePerCustomer(t: Tables): DataFrame = {
    val w = Window
      .partitionBy("o_custkey")
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.orders
      // decimal-accumulated running sum: window frame sums are evaluated
      // incrementally in Spark but with a segment tree in some engines —
      // exact decimal accumulation makes the result order/algorithm-proof
      .withColumn(
        "running_total",
        roundN(sum(col("o_totalprice").cast(DecimalType(28, 6))).over(w)
          .cast(DoubleType), 2))
      .select("o_custkey", "o_orderkey", "running_total")
  }

  /** lag/lead analytics: price delta between consecutive orders of a customer. */
  def orderPriceDelta(t: Tables): DataFrame = {
    val w = Window
      .partitionBy("o_custkey")
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
    t.orders
      .withColumn("prev_price", lag("o_totalprice", 1).over(w))
      .withColumn(
        "price_delta",
        roundN(col("o_totalprice") - col("prev_price"), 2))
      .filter(col("prev_price").isNotNull)
      .select("o_custkey", "o_orderkey", "price_delta")
  }

  /** rank + dense_rank (ties handled differently by each — exercised on a
    * tie-prone integer column).
    */
  def partSizeRanks(t: Tables): DataFrame = {
    val w = Window.partitionBy("p_type").orderBy(desc("p_size"), asc("p_partkey"))
    t.part
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter(col("rnk") <= 5)
      .select("p_type", "p_partkey", "p_size", "rnk", "drnk")
  }

  /** ntile bucketing: quartile of order value within each year. */
  /** percent_rank + cume_dist per market segment over account balance —
    * the remaining SQL:2003 distribution window functions (rank /
    * dense_rank / ntile / lag cover the rest of the family in the gates
    * above). Both are value-based: ties receive identical ranks, so the
    * output is deterministic regardless of partition layout. One hash
    * shuffle on the segment key, then per-partition sort.
    */
  def distributionRanks(t: Tables): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    t.customer
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        roundN(percent_rank().over(w), 6).as("pct_rank"),
        roundN(cume_dist().over(w), 6).as("cum_dist"))
  }

  /** RANGE frame over a day ordinal: rolling 30-day spend per customer.
    * Unlike the ROWS frames above, a RANGE frame is value-based — all
    * peers with `day_ord` in [current−29, current] join the frame, so
    * same-day ties contribute identically regardless of their order and
    * the result is deterministic without a tiebreak column. The ordering
    * key is an integer day ordinal (days since 1992-01-01) rather than a
    * date: integer RANGE bounds mean both engines (and any executor
    * layout) agree on the frame exactly. One hash shuffle on the customer
    * key, then a per-partition sort — the sliding sum is computed
    * incrementally inside WindowExec, linear in partition size.
    */
  def rollingSpend30d(t: Tables): DataFrame = {
    val w = Window
      .partitionBy("o_custkey")
      .orderBy("day_ord")
      .rangeBetween(-29, 0)
    t.orders
      .withColumn(
        "day_ord",
        datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1992-01-01"))))
      .withColumn(
        "spend_30d",
        roundN(sum(col("o_totalprice").cast(DecimalType(28, 6))).over(w)
          .cast(DoubleType), 2))
      .select("o_custkey", "o_orderkey", "day_ord", "spend_30d")
  }

  /** first_value / last_value / nth_value over the full-partition frame:
    * each customer's first order price, latest order price, and second
    * order key. The frame must be UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING
    * — the default frame stops at CURRENT ROW, which silently turns
    * last_value into "current value" (the classic window-function trap;
    * pinned by the spec). Deterministic via the (date, orderkey) tiebreak;
    * the rn=1 filter collapses to one row per customer.
    */
  def firstLastOrderStats(t: Tables): DataFrame = {
    val ord = Window
      .partitionBy("o_custkey")
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t.orders
      .withColumn("first_price", first("o_totalprice").over(full))
      .withColumn("last_price", last("o_totalprice").over(full))
      .withColumn("second_key", nth_value(col("o_orderkey"), 2).over(full))
      .withColumn("rn", row_number().over(ord))
      .filter(col("rn") === 1)
      .select("o_custkey", "first_price", "last_price", "second_key")
  }

  def priceQuartiles(t: Tables): DataFrame = {
    val w = Window
      .partitionBy(year(col("o_orderdate")))
      .orderBy(asc("o_totalprice"), asc("o_orderkey"))
    t.orders
      .withColumn("quartile", ntile(4).over(w))
      .groupBy("quartile")
      .agg(
        count(lit(1)).as("n"),
        roundN(decAvg(col("o_totalprice")), 2).as("avg_price"))
      .orderBy("quartile")
  }
}

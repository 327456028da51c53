package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BucketedTablesSpec extends SparkTestBase {

  test("co-bucketed join runs with zero exchanges and matches the plain join") {
    // pay the shuffle once at write time...
    BucketedTables.writeBucketed(
      t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "bkt_orders", "o_orderkey", 8, Seq("o_orderkey"))
    BucketedTables.writeBucketed(
      t.lineitem.select("l_orderkey", "l_extendedprice"),
      "bkt_lineitem", "l_orderkey", 8, Seq("l_orderkey"))

    val bo = BucketedTables.table(spark, "bkt_orders")
    val bl = BucketedTables.table(spark, "bkt_lineitem")
    val joined = bl.join(bo, col("l_orderkey") === col("o_orderkey"))

    // ...and every subsequent key join is exchange-free (broadcast would
    // also hide an exchange; force the shuffle-join shape to prove it)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        "bucketed join should not re-shuffle either side")
      // correctness: same row count as the plain join
      val plain = t.lineitem.join(
        t.orders, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("aggregation on the bucket key needs no exchange either") {
    val bl = BucketedTables.table(spark, "bkt_lineitem")
    val agg = bl.groupBy("l_orderkey").agg(sum("l_extendedprice"))
    agg.collect()
    val p = agg.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"))
  }

  test("gated bucketed rollup: join side exchange-free, equals the shuffled twin") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = BucketedTables.revenueByPriorityBucketed(t)
      // the only hash exchange allowed is the final low-cardinality
      // rollup on o_orderpriority — the orderkey JOIN must not shuffle
      val p = bucketed.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
        !p.contains("Exchange hashpartitioning(o_orderkey"),
        "bucketed join re-shuffled a side on the join key")
      val got = bucketed.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      val want = graft.operators.JoinOps.revenueByPriority(t)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      assert(got.toSeq == want.toSeq, "bucketed rollup diverges from the shuffled twin")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CoreQueriesSpec extends SparkTestBase {

  test("q1: three return flags, counts sum to lineitem count, sorted desc") {
    val rows = CoreQueries.q1GroupCountAvg(t).collect()
    assert(rows.map(_.getString(0)).toSet == Set("A", "N", "R"))
    assert(rows.map(_.getLong(1)).sum == t.lineitem.count())
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted.reverse)
  }

  test("q2: exact median lies within group min/max") {
    val med = CoreQueries.q2MedianByPriority(t).collect()
    val bounds = t.orders
      .groupBy(upper(col("o_orderpriority")).as("priority"))
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    med.foreach { r =>
      val (lo, hi) = bounds(r.getString(0))
      assert(r.getDouble(2) >= lo && r.getDouble(2) <= hi)
    }
  }

  test("q3: percentages sum to ~100") {
    val pct = CoreQueries.q3StatusShare(t).collect().map(_.getDouble(2)).sum
    assert(math.abs(pct - 100.0) < 0.1)
  }

  test("filter algebra: chained filters == conjunction (Catalyst CombineFilters)") {
    val chained = t.lineitem
      .filter(col("l_quantity") >= 10).filter(col("l_quantity") <= 40).count()
    val conj = t.lineitem
      .filter(col("l_quantity") >= 10 && col("l_quantity") <= 40).count()
    assert(chained == conj)
  }

  test("topK == head of full sort") {
    val topk = CoreQueries.topKOrders(t).collect().map(_.getLong(0)).toSeq
    val full = t.orders.orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10).collect().map(_.getLong(0)).toSeq
    assert(topk == full)
  }

  test("castColumns: decimal and string casts preserve row count and null-safety") {
    val df = CoreQueries.castColumns(t)
    assert(df.count() == t.lineitem.count())
    assert(df.schema("price_dec").dataType.typeName == "decimal(20,2)")
    assert(df.filter(col("qty_int").isNull).count() == 0)
  }

  test("dedupExact removes duplicates idempotently") {
    val once = CoreQueries.dedupExact(t)
    assert(once.count() == once.dropDuplicates().count())
  }

  test("q1 plan pushes column pruning to the parquet scan") {
    val plan = CoreQueries.q1GroupCountAvg(t).queryExecution.executedPlan.toString
    assert(plan.contains("l_returnflag") && plan.contains("l_extendedprice"))
    // the scan must not read unrelated wide columns
    assert(!plan.contains("l_comment"))
  }

  test("aggGlobalSum returns exactly one row") {
    assert(CoreQueries.aggGlobalSum(t).count() == 1)
  }
}

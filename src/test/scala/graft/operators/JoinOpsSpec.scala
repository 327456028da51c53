package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class JoinOpsSpec extends SparkTestBase {

  test("semi + anti partition the customer table") {
    val semi = JoinOps.customersWithOrders(t).count()
    val anti = JoinOps.customersWithoutOrders(t).count()
    assert(semi + anti == t.customer.count())
  }

  test("customersPerRegion covers all regions and all customers") {
    val rows = JoinOps.customersPerRegion(t).collect()
    assert(rows.length == t.region.count())
    assert(rows.map(_.getLong(1)).sum == t.customer.count())
  }

  test("dim joins broadcast (no shuffle on the fact side for region/nation)") {
    val plan = JoinOps.customersPerRegion(t).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("left join keeps zero-order customers") {
    val df = JoinOps.orderCountPerCustomer(t)
    assert(df.count() == t.customer.count())
    val zero = df.filter(col("num_orders") === 0).count()
    assert(zero == JoinOps.customersWithoutOrders(t).count())
  }

  test("revenueByPriority totals match an unjoined sum") {
    // every lineitem has a parent order, so the join must not drop rows
    val joined = JoinOps.revenueByPriority(t).agg(sum("num_items")).head().getLong(0)
    assert(joined == t.lineitem.count())
  }

  test("except/intersect slices are disjoint/consistent") {
    val high = t.orders.filter(col("o_totalprice") > 200000).select("o_orderkey").distinct().count()
    val ex   = JoinOps.exceptSlices(t).count()
    assert(ex <= high)
    val inter = JoinOps.intersectSlices(t)
    assert(inter.count() == inter.distinct().count()) // INTERSECT is distinct
  }

  test("salted join is row-for-row equivalent to the plain equi-join") {
    val fact = t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
    val buildKeyed = t.customer.select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = fact.join(buildKeyed, Seq("o_custkey"))
    val salted = JoinOps.saltedJoin(fact, buildKeyed, "o_custkey", 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("aboveAveragePrice counts match a two-pass computation") {
    val mean = t.orders.agg(avg("o_totalprice")).head().getDouble(0)
    val expected = t.orders.filter(col("o_totalprice") > mean).count()
    val got = JoinOps.aboveAveragePrice(t).agg(sum("n_above_avg")).head().getLong(0)
    assert(got == expected)
  }

  test("unionByName aligns columns by name and null-fills the missing side") {
    val rows = JoinOps.unionByNameSlices(t).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nA = t.customer.filter(col("c_acctbal") > 5000).count()
    val nB = t.customer.filter(col("c_acctbal") <= 0).count()
    // each side contributes its own column and NULLs for the other's:
    // non-null balances come only from slice A, names only from slice B
    assert(rows.map(_._2).sum == nA + nB)
    assert(rows.map(_._3).sum == nA)
    assert(rows.map(_._4).sum == nB)
  }

  test("exceptAll/intersectAll: multiset copy counts match the bag formulas") {
    def keyCounts(maxYear: Boolean): Map[Long, Long] = {
      val f = if (maxYear) year(col("o_orderdate")) <= 1998 else year(col("o_orderdate")) >= 1999
      t.orders.filter(f).groupBy("o_custkey").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val (e, l) = (keyCounts(true), keyCounts(false))
    val gotExcept = JoinOps.exceptAllSlices(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantExcept = e.map { case (k, n) => k -> (n - l.getOrElse(k, 0L)) }
      .filter(_._2 > 0)
    assert(gotExcept == wantExcept)
    val gotIntersect = JoinOps.intersectAllSlices(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantIntersect = e.flatMap { case (k, n) =>
      val m = math.min(n, l.getOrElse(k, 0L)); if (m > 0) Some(k -> m) else None
    }
    assert(gotIntersect == wantIntersect)
    assert(gotExcept.nonEmpty && gotIntersect.nonEmpty)
  }
}

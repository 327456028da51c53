package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Catalyst's InjectRuntimeFilter) —
  * the shuffle-join analogue of partition pruning: when one side of a
  * shuffle equi-join carries a selective filter, Spark builds a
  * `bloom_filter_agg` over the creation side's join keys and injects
  * `might_contain(...)` as a pre-shuffle filter on the application side,
  * so most non-matching fact rows never reach the exchange. At 100 TB
  * this is the difference between shuffling the whole fact table and
  * shuffling only candidate rows; the engine relies on it being ONE conf
  * away (the thresholds exist because the bloom build costs a scan of the
  * creation side — worth it exactly when the application side dwarfs it,
  * which is the 100 TB shape and why the test lowers the
  * application-side threshold to fire at fixture scale).
  */
class RuntimeFilterSpec extends SparkTestBase {

  test("selective dim filter injects might_contain on the fact side; results unchanged") {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force the shuffle join shape
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = t.lineitem
      val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n$opt")
      // the probe must sit on the FACT (lineitem) side's keys
      assert(opt.contains("might_contain(scalar-subquery") &&
        opt.linesIterator.exists(l => l.contains("might_contain") && l.contains("l_orderkey")),
        s"bloom probe not on the fact join key:\n$opt")
      val filtered = j.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // same join with the filter machinery off — identical results
      confs.keys.foreach(spark.conf.unset)
      saved.foreach { case (k, vOpt) => vOpt.foreach(spark.conf.set(k, _)) }
      val plain = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(filtered == plain)
      assert(plain.values.sum > 0)
    } finally {
      confs.keys.foreach(k => if (spark.conf.getOption(k).isDefined) spark.conf.unset(k))
      saved.foreach { case (k, vOpt) => vOpt.foreach(spark.conf.set(k, _)) }
    }
  }
}

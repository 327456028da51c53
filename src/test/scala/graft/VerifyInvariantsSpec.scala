package graft

import graft.operators.CoreQueries
import org.apache.spark.sql.functions._

/** SamplingInvariants: the rows-only sampling gates' property harness must
  * accept the real queries and REJECT doctored outputs — otherwise it is
  * decoration, not a gate.
  */
class VerifyInvariantsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("real sampling queries satisfy their invariants") {
    SamplingInvariants.check("sample_orders",
      CoreQueries.sampleOrders(t), (s, d) => CoreQueries.sampleOrders(core.Tables(s, d)),
      spark, dir)
    SamplingInvariants.check("split_counts",
      CoreQueries.splitCounts(t), (s, d) => CoreQueries.splitCounts(core.Tables(s, d)),
      spark, dir)
    SamplingInvariants.check("sample_stratified",
      CoreQueries.stratifiedSample(t), (s, d) => CoreQueries.stratifiedSample(core.Tables(s, d)),
      spark, dir)
    SamplingInvariants.check("row_ids",
      CoreQueries.rowIds(t), (s, d) => CoreQueries.rowIds(core.Tables(s, d)),
      spark, dir)
  }

  test("doctored outputs are rejected") {
    val sample = CoreQueries.sampleOrders(t)
    // doubled sample: duplicate keys + count outside the binomial band
    intercept[IllegalArgumentException] {
      SamplingInvariants.check("sample_orders",
        sample.unionAll(sample), (s, d) => CoreQueries.sampleOrders(core.Tables(s, d)),
        spark, dir)
    }
    // foreign keys: not a subset of the source
    intercept[IllegalArgumentException] {
      SamplingInvariants.check("sample_orders",
        sample.withColumn("o_orderkey", col("o_orderkey") + 1000000000L),
        (s, d) => CoreQueries.sampleOrders(core.Tables(s, d)), spark, dir)
    }
    // lost split: counts no longer partition the source
    val splits = CoreQueries.splitCounts(t)
    intercept[IllegalArgumentException] {
      SamplingInvariants.check("split_counts",
        splits.withColumn("n", col("n") - 1),
        (s, d) => CoreQueries.splitCounts(core.Tables(s, d)), spark, dir)
    }
    // collapsed ids: row_id uniqueness violated
    intercept[IllegalArgumentException] {
      SamplingInvariants.check("row_ids",
        CoreQueries.rowIds(t).withColumn("row_id", lit(7L)),
        (s, d) => CoreQueries.rowIds(core.Tables(s, d)), spark, dir)
    }
  }
}

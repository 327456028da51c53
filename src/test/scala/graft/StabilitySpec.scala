package graft

import graft.operators.{CoreQueries, EventOps, JoinOps, PackingOps, SimilarityOps, SnapshotOps, TextOps}

/** Cross-engine stability, proven from the inside: the round-2 convention
  * is that every gated sum/avg over doubles accumulates in exact DECIMAL
  * (`NumericFunctions.decSum`/`decAvg`), which makes the result
  * independent of accumulation order. Accumulation order is exactly what
  * a different shuffle-partition count changes — so running the same
  * query under different partition counts and demanding BIT-EXACT equality
  * (Row equality compares doubles via doubleToLongBits) is a direct test
  * of the property that keeps the DuckDB oracle (and any other engine or
  * parallelism level) in agreement. A plain double sum fails this test
  * whenever a rounding edge sits near a group's total.
  */
class StabilitySpec extends SparkTestBase {

  test("decimal-accumulated aggregates are bit-exact across partition counts") {
    def run(): Seq[Seq[org.apache.spark.sql.Row]] = Seq(
      CoreQueries.q1GroupCountAvg(t),
      CoreQueries.aggGlobalSum(t),
      EventOps.userSessions(t),
      EventOps.hourlyTypeCounts(t),
      JoinOps.revenueByPriority(t),
      TextOps.qualityByLang(t),
      TextOps.tokenStats(t),
      // round-11 decimal/exact-arithmetic paths: bigram-LM scoring
      // (rounded-ln DECIMAL sums), sqrt-share budgets + running-total
      // draw, int8 quantized scoring, digest diff, CDC reconstruction
      TextOps.bigramPerplexity(t),
      PackingOps.sampleMixtureTemperature(t),
      SimilarityOps.quantizedTopK(t, 0L, 10),
      SnapshotOps.snapshotDiffStats(t),
      SnapshotOps.mergeApplyRoundtrip(t)
    ).map(_.collect().toSeq)

    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val a = run()
      spark.conf.set("spark.sql.shuffle.partitions", "29")
      val b = run()
      a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
        assert(x == y, s"query $i differs between 3 and 29 shuffle partitions")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Mergeable hash-sample quantile sketches ([[QuantileOps]]): the merge
  * identity (per-shard union == global sample), the storage round trip,
  * determinism, and the accuracy band on the fixture.
  */
class QuantileOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("merge identity: the union of per-shard samples IS the global sample") {
    // membership is a pure per-row predicate, so sampling each shard
    // independently and sampling the union must give the same set — run
    // both ways and compare as sets of doc_ids
    val global = QuantileOps.hashSample(t.documents)
      .select("doc_id").as[Long].collect().toSet
    val perShard = t.documents.select("source").distinct().as[String]
      .collect().flatMap { s =>
        QuantileOps.hashSample(t.documents.filter(col("source") === s))
          .select("doc_id").as[Long].collect()
      }.toSet
    assert(perShard == global)
    assert(global.nonEmpty, "fixture sample must not be empty")
  }

  test("sample rate lands in a 6-sigma binomial band around p = 1/4") {
    val n = t.documents.count()
    val got = QuantileOps.hashSample(t.documents).count()
    val p = 0.25
    val sigma = math.sqrt(n * p * (1 - p))
    assert(math.abs(got - n * p) <= 6 * sigma + 10,
      s"sample $got of $n far from p=1/4")
  }

  test("persisted sample table round-trips losslessly and is deterministic") {
    val stored = spark.read.parquet(QuantileOps.quantileSampleTableDir(t))
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toSet
    val fresh = QuantileOps.hashSample(t.documents)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toSet
    assert(stored == fresh)
  }

  test("gate: stored-sample quantiles within the 20% band of the exact quantiles") {
    val row = QuantileOps.quantileSketchGate(t).head()
    assert(row.getAs[Boolean]("p50_in_band"))
    val (s50, e50) = (row.getAs[Double]("s_p50"), row.getAs[Double]("e_p50"))
    assert(math.abs(s50 - e50) <= e50 * 0.2)
    // the verdict column is DERIVED, not asserted: recompute it
    assert(row.getAs[Boolean]("p50_in_band") ==
      (math.abs(s50 - e50) <= e50 * 0.2))
    assert(row.getAs[Long]("n_sample") > 0 &&
      row.getAs[Long]("n_sample") < row.getAs[Long]("n_total"))
  }

  test("per-source gate: every source's sample stats match a direct recompute") {
    val got = QuantileOps.quantileBySourceGate(t).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getLong(4)))
      .toMap
    val direct = QuantileOps.hashSample(t.documents)
      .groupBy("source")
      .agg(count(lit(1)), min("n_chars").cast("long"),
        max("n_chars").cast("long"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == direct)
    assert(got.nonEmpty)
  }
}

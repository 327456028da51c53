package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class KmvDistinctSpec extends SparkTestBase {
  import spark.implicits._

  private def estimate(df: org.apache.spark.sql.DataFrame, k: Int): Double =
    df.agg(call_function("graft_kmv_distinct", col("v"), lit(k)))
      .head().getDouble(0)

  test("exact under k distinct values, for any duplication") {
    val df = (0 until 1000).map(i => s"val_${i % 20}").toDF("v")
    assert(estimate(df, 32) == 20.0)
    assert(estimate(spark.emptyDataset[String].toDF("v"), 32) == 0.0)
  }

  test("estimate is partition-independent (the determinism the gate hashes)") {
    val vals = (0 until 5000).map(i => s"item_$i")
    val one = estimate(vals.toDF("v").coalesce(1), 32)
    val many = estimate(vals.toDF("v").repartition(32), 32)
    val dups = estimate((vals ++ vals ++ vals).toDF("v").repartition(7), 32)
    assert(one == many, s"partitioning changed the estimate: $one vs $many")
    assert(one == dups, s"duplication changed the estimate: $one vs $dups")
  }

  test("estimator accuracy is within the KMV error bound at k=32") {
    // standard error ≈ 1/sqrt(k-2) ≈ 18%; assert a generous 4σ envelope
    val n = 20000
    val est = estimate((0 until n).map(i => s"x$i").toDF("v"), 32)
    assert(math.abs(est - n) / n < 0.72, s"estimate $est for $n distinct")
  }

  test("merge truncates: grouped estimate equals the global bottom-k answer") {
    // two groups with disjoint value sets — each group's sketch must be
    // built from its own values only
    val df = ((0 until 3000).map(i => ("a", s"a$i")) ++
              (0 until 20).map(i => ("b", s"b$i")))
      .toDF("g", "v").repartition(13)
    val got = df.groupBy("g")
      .agg(call_function("graft_kmv_distinct", col("v"), lit(32)).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("b") == 20.0, "under-k group must be exact")
    val aOnly = estimate((0 until 3000).map(i => s"a$i").toDF("v"), 32)
    assert(got("a") == aOnly, "group sketch must equal its own global sketch")
  }

  test("shard-merge gate: merged per-source sketches equal the direct corpus sketch on the fixture") {
    val row = graft.operators.CoreQueries.sketchKmvMerge(t).head()
    assert(row.getAs[Boolean]("merge_equals_direct"),
      s"merged ${row.getAs[Double]("merged_estimate")} != direct ${row.getAs[Double]("direct_estimate")}")
    // n_exact is the real corpus distinct count, recomputed independently
    val nExact = t.documents.filter(col("text").isNotNull)
      .select(md5(col("text"))).distinct().count()
    assert(row.getAs[Long]("n_exact") == nExact)
    assert(row.getAs[Double]("merged_estimate") > 0.0)
  }

  test("shard-merge theorem: union bottom-k == bottom-k of merged shard sketches, driver-recomputed") {
    import spark.implicits._
    // 5 shards, overlapping values (shared docs across sources), > k distinct
    val docs = (0 until 400).map(i => (s"src${i % 5}", s"doc content ${i % 170}"))
      .toDF("source", "text").repartition(11)
    val row = graft.operators.CoreQueries.sketchKmvMergeOn(docs, 32).head()
    assert(row.getAs[Boolean]("merge_equals_direct"))
    assert(row.getAs[Long]("n_exact") == 170L)
    assert(row.getAs[Long]("n_sources") == 5L)
    // driver-side ground truth: k-th smallest md5 digest of the distinct
    // value set, the same estimator arithmetic
    val md = java.security.MessageDigest.getInstance("MD5")
    val digests = (0 until 170).map { i =>
      md.reset()
      md.digest(s"doc content $i".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    }.sorted
    val expected = 31.0 * 281474976710656.0 /
      java.lang.Long.parseLong(digests(31).substring(0, 12), 16).toDouble
    val expRounded = math.floor(expected * 100 + 0.5) / 100
    assert(row.getAs[Double]("direct_estimate") == expRounded,
      s"direct ${row.getAs[Double]("direct_estimate")} != driver $expRounded")
  }

  test("shard-merge gate: exact (and equal) both ways under k distinct values") {
    import spark.implicits._
    val docs = (0 until 100).map(i => (s"s${i % 3}", s"t${i % 12}"))
      .toDF("source", "text")
    val row = graft.operators.CoreQueries.sketchKmvMergeOn(docs, 32).head()
    assert(row.getAs[Double]("merged_estimate") == 12.0)
    assert(row.getAs[Double]("direct_estimate") == 12.0)
    assert(row.getAs[Boolean]("merge_equals_direct"))
  }

  test("registered in SQL via the extensions seam") {
    (0 until 100).map(i => s"s$i").toDF("v").createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      "SELECT graft_kmv_distinct(v, 32) FROM kmv_in").head().getDouble(0)
    assert(viaSql == estimate(spark.table("kmv_in"), 32))
  }
}

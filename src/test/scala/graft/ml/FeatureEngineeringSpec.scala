package graft.ml

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The round-10 feature-engineering transformers (Imputer, OneHotEncoder,
  * Bucketizer, with SQLTransformer and IndexToString in the plumbing):
  * each gate's oracle-recomputable quantities are recomputed here from
  * first principles, and the StringIndexer tie-break contract — the part
  * the DuckDB oracle leans on — gets a synthetic corpus with an EXACT
  * frequency tie.
  */
class FeatureEngineeringSpec extends SparkTestBase {

  test("bucketized price counts equal the explicit CASE recomputation") {
    val got = FeatureEngineering.bucketizedPriceCounts(t)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = t.orders.na.drop(Seq("o_totalprice"))
      .groupBy(
        when(col("o_totalprice") < 50000, 0L)
          .when(col("o_totalprice") < 150000, 1L)
          .when(col("o_totalprice") < 300000, 2L)
          .otherwise(3L).as("b"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"bucket counts diverge: $got vs $expected")
    assert(got.keySet == Set(0L, 1L, 2L, 3L),
      s"fixture should populate all four buckets, got ${got.keySet}")
  }

  test("impute gate: deterministic gaps, surrogate fill, exact-mean band") {
    val row = FeatureEngineering.imputeGate(t).head()
    val expectedGaps = t.orders
      .filter(pmod(col("o_orderkey"), lit(10L)) === 0).count()
    assert(row.getLong(0) == t.orders.count())
    assert(row.getLong(1) == expectedGaps && expectedGaps > 0)
    assert(row.getBoolean(2), "a gapped row was not filled with the surrogate")
    assert(row.getBoolean(3), "Imputer surrogate outside the DECIMAL-exact mean band")
  }

  test("onehot gate: index equals frequency rank, vectors and round-trip hold") {
    val rows = FeatureEngineering.onehotGate(t).collect()
    val counts = t.orders.na.drop(Seq("o_orderpriority"))
      .groupBy("o_orderpriority").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expectedIdx = counts.sortBy { case (v, c) => (-c, v) }
      .zipWithIndex.map { case ((v, _), i) => v -> i.toLong }.toMap
    assert(rows.length == counts.length)
    rows.foreach { r =>
      assert(r.getLong(2) == expectedIdx(r.getString(0)),
        s"index mismatch for ${r.getString(0)}")
      assert(r.getLong(3) == counts.length - 1L, "dropLast size wrong")
      assert(r.getBoolean(4), s"one-hot vector wrong for ${r.getString(0)}")
      assert(r.getBoolean(5), s"round-trip failed for ${r.getString(0)}")
    }
  }

  test("StringIndexer tie-break is alphabetic on an exact frequency tie") {
    import spark.implicits._
    // 'b-tied' and 'a-tied' both appear 40x (exact tie), 'c-common' 60x:
    // frequencyDesc puts c-common first, then the tie resolves
    // ALPHABETICALLY — a-tied before b-tied — which is precisely what the
    // oracle's ORDER BY n DESC, value ASC restates. The sf0.01 driver
    // fixture ties 2-HIGH/3-MEDIUM at 3003, so this contract carries a
    // real gate, not just this synthetic.
    val dir = java.nio.file.Files.createTempDirectory("graft_tie_").toString
    val rows = (1L to 60L).map(i => (i, "c-common")) ++
      (61L to 100L).map(i => (i, "b-tied")) ++
      (101L to 140L).map(i => (i, "a-tied"))
    rows.toDF("o_orderkey", "o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val tt = graft.core.Tables(spark, dir)
    val got = FeatureEngineering.onehotGate(tt).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("c-common" -> 0L, "a-tied" -> 1L, "b-tied" -> 2L),
      s"tie-break not (count desc, value asc): $got")
  }
}

package graft.plans

import graft.SparkTestBase
import graft.operators.SimilarityOps
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** graft_q8_pack / graft_q8_dot — int8 embedding quantization.
  * Correctness of the exact floor-rule codes (driver-side byte-for-byte
  * recompute over the real fixture), codegen participation + interpreted
  * agreement, null/zero/mismatch semantics, and the properties the int8
  * index is FOR: bounded cosine approximation error and full top-k recall
  * at fixture scale.
  */
class Q8Spec extends SparkTestBase {
  import spark.implicits._

  private def packRef(xs: Array[Double]): Array[Byte] = {
    val ma = xs.foldLeft(0.0)((m, v) => math.max(m, math.abs(v)))
    if (ma == 0.0) new Array[Byte](xs.length)
    else xs.map(x => math.floor(x * 127.0 / ma + 0.5).toByte)
  }

  test("known-vector codes: extremes hit ±127, zero stays 0") {
    val r = spark.sql(
      "SELECT graft_q8_pack(array(3.0d, -1.5d, 0.75d, 0.0d)) AS q").head()
    // 3.0 → floor(127.5) = 127; -1.5 → floor(-63.5 + 0.5) = -63;
    // 0.75 → floor(31.75 + 0.5) = 32; 0.0 → 0
    assert(r.getAs[Array[Byte]](0).toSeq == Seq[Byte](127, -63, 32, 0))
    assert(r.getAs[Array[Byte]](0).toSeq ==
      packRef(Array(3.0, -1.5, 0.75, 0.0)).toSeq)
  }

  test("null array → null; null element → null; length mismatch dot → null; zero vector packs to zero bytes") {
    val r = spark.sql(
      """SELECT
        |  graft_q8_pack(cast(null as array<double>))            AS nullarr,
        |  graft_q8_pack(array(1.0d, cast(null as double)))      AS nullelem,
        |  graft_q8_dot(graft_q8_pack(array(1.0d, 2.0d)),
        |               graft_q8_pack(array(1.0d)))              AS mismatch,
        |  graft_q8_pack(array(0.0d, 0.0d, 0.0d))                AS zero,
        |  graft_q8_dot(graft_q8_pack(array(1.0d, -2.0d)),
        |               graft_q8_pack(array(1.0d, -2.0d)))       AS selfdot
        |""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getAs[Array[Byte]](3).toSeq == Seq[Byte](0, 0, 0))
    // [1,-2] → ma=2 → q=[64,-127] (floor(63.5+0.5)=64) → 64²+127²
    assert(r.getLong(4) == 64L * 64L + 127L * 127L)
  }

  test("pack and dot stay inside whole-stage codegen and agree with interpreted eval") {
    // Range source so ConvertToLocalRelation can't pre-fold the projection
    val df = spark.range(100)
      .selectExpr("array(cast(id as double), cast(id % 7 as double) - 3.0d, 5.0d) AS v")
      .selectExpr("v", "graft_q8_dot(graft_q8_pack(v), graft_q8_pack(v)) AS d")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_q8_pack") && plan.contains("*(1) Project"),
      s"q8 expressions should sit inside a whole-stage-codegen Project:\n$plan")
    df.collect().foreach { r =>
      val xs = r.getSeq[Double](0).toArray
      val q = packRef(xs)
      assert(r.getLong(1) == q.map(b => b.toLong * b.toLong).sum)
      // interpreted path: direct expression eval
      val lit = Literal.create(ArrayData.toArrayData(xs), ArrayType(DoubleType))
      val packed = Q8Pack(lit).eval(null).asInstanceOf[Array[Byte]]
      assert(packed.toSeq == q.toSeq, s"interpreted pack of ${xs.toSeq}")
      assert(Q8Dot(Literal(packed), Literal(packed)).eval(null) ==
        q.map(b => b.toLong * b.toLong).sum)
    }
  }

  test("fixture embeddings: packed bytes equal the floor-rule reference byte-for-byte") {
    import graft.functions.VectorFunctions.toDoubleArr
    val rows = t.embeddings
      .select(col("vec_id"), toDoubleArr(col("embedding")).as("emb"),
        call_function("graft_q8_pack", toDoubleArr(col("embedding"))).as("q8"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = packRef(r.getSeq[Double](1).toArray)
      assert(r.getAs[Array[Byte]](2).toSeq == expect.toSeq,
        s"vec_id ${r.getLong(0)}")
    }
  }

  test("quantizedTopK: 4x-packed scoring keeps full top-10 recall and ≤0.01 cosine error at fixture scale") {
    val brute = SimilarityOps.bruteForceTopK(t, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val quant = SimilarityOps.quantizedTopK(t, 0L, 10).collect()
    assert(quant.length == 10)
    // observed max |cos_q − cos| is ~2e-3 on both sf0.001 and sf0.01
    // (int8 on 64 dims; the worst-case bound is ≈ 2/127 ≈ 0.016);
    // 0.01 leaves headroom without letting a real regression through
    assert(quant.map(_.getDouble(4)).max <= 0.01)
    val hits = quant.map(_.getLong(0)).count(brute.contains)
    assert(hits == 10, s"quantized top-10 lost ${10 - hits} true neighbors")
    // scores arrive descending on the rounded quantized key
    val scores = quant.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse)
  }
}

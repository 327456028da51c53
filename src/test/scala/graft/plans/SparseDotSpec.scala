package graft.plans

import graft.SparkTestBase
import graft.ml.Recommender
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** graft_sparse_dot: sorted-merge O(nnz) dot over (indices, values) pairs.
  * Correctness (incl. null semantics and bit-equality with the dense
  * loop), whole-stage codegen participation, Recommender parity, and the
  * measured dense-vs-sparse A/B at a synthetic 65,536-dim vocabulary the
  * round-3 verdict asked for.
  */
/** Synthetic corpus generator: dim 65,536, nnz 32. Row `id`'s nonzeros sit
  * at d = x*2048 + (id mod 2048), x = 0..31, value
  * ((id*31 + x*7) mod 97 + 1)/97. The dense twin materializes all 32,768
  * doubles; nonzero positions and accumulation order are identical, so
  * scores must be bit-equal. (Top-level object: the Dataset.map closures
  * must not capture the non-serializable suite.)
  */
object SparseDotFixture extends Serializable {
  val dim = 65536
  val nnz = 32
  def sparseVal(id: Long, x: Int): Double = ((id * 31 + x * 7) % 97 + 1).toDouble / 97.0
  def sparseRow(id: Long): (Long, Array[Int], Array[Double]) = {
    val off = (id % 2048).toInt
    (id, Array.tabulate(nnz)(x => x * 2048 + off), Array.tabulate(nnz)(x => sparseVal(id, x)))
  }
  def denseRow(id: Long): (Long, Array[Double]) = {
    val off = (id % 2048).toInt
    val arr = new Array[Double](dim)
    (0 until nnz).foreach(x => arr(x * 2048 + off) = sparseVal(id, x))
    (id, arr)
  }
}

class SparseDotSpec extends SparkTestBase {
  import spark.implicits._

  test("sorted-merge dot on known vectors, null semantics") {
    val r = spark.sql(
      """SELECT
        |  graft_sparse_dot(array(0,2,5), array(1.0d,2.0d,3.0d),
        |                   array(2,5),   array(10.0d,1.0d))       AS hit,
        |  graft_sparse_dot(array(0,1),   array(1.0d,2.0d),
        |                   array(2,3),   array(5.0d,6.0d))        AS disjoint,
        |  graft_sparse_dot(array(0,1),   array(1.0d),
        |                   array(0),     array(1.0d))             AS mismatch,
        |  graft_sparse_dot(cast(null as array<int>), array(1.0d),
        |                   array(0),     array(1.0d))             AS nullarr,
        |  graft_sparse_dot(array(0,1),   array(1.0d, cast(null as double)),
        |                   array(1),     array(2.0d))             AS nullelem
        |""".stripMargin).head()
    assert(r.getDouble(0) == 2.0 * 10.0 + 3.0 * 1.0)
    assert(r.getDouble(1) == 0.0)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("stays inside whole-stage codegen") {
    // depend on the range column so ConvertToLocalRelation can't pre-fold
    val df = spark.range(1).selectExpr(
      "graft_sparse_dot(array(0, int(id) + 3), array(1.0d, 2.0d), array(3), array(4.0d)) AS s")
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project [graft_sparse_dot"))
    assert(df.head().getDouble(0) == 8.0)
  }

  test("recommender sparse scoring == dense scoring bit-exactly") {
    val dense  = Recommender.similarDocs(t, 0L, 5).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    val sparse = Recommender.similarDocsSparse(t, 0L, 5).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(sparse.toSeq == dense.toSeq)
  }

  test("0-nnz dense vector scores 0.0, not null (sequence(0,-1) edge)") {
    import org.apache.spark.ml.linalg.Vectors
    val df = Seq(
      (0L, Vectors.dense(Array.empty[Double])),         // the guarded edge
      (1L, Vectors.sparse(4, Array.empty[Int], Array.empty[Double])),
      (2L, Vectors.dense(1.0, 0.0, 2.0, 0.0))
    ).toDF("id", "v")
    val u = unwrap_udt(col("v"))
    val scored = df.select(col("id"),
      call_function("graft_sparse_dot",
        Recommender.sparseIdx(u), u.getField("values"),
        array(lit(0), lit(2)), array(lit(3.0), lit(5.0))).as("s"))
      .collect().map { r =>
        assert(!r.isNullAt(1), s"null score for id ${r.getLong(0)}")
        r.getLong(0) -> r.getDouble(1)
      }.toMap
    assert(scored == Map(0L -> 0.0, 1L -> 0.0, 2L -> 13.0))
  }

  import SparseDotFixture._

  private lazy val sparseCorpus: DataFrame = spark.range(0, 2000)
    .map(id => sparseRow(id)).toDF("id", "idx", "vs").cache()

  private lazy val denseCorpus: DataFrame = spark.range(0, 2000)
    .map(id => denseRow(id)).toDF("id", "arr").cache()

  // query = the id=5 pattern: full overlap with every row where id%2048==5
  private lazy val qIdx = sparseRow(5L)._2
  private lazy val qVal = sparseRow(5L)._3
  private lazy val qDense = denseRow(5L)._2

  test("synthetic large-vocab corpus: sparse and dense scores bit-equal") {
    val qS = Seq((qIdx, qVal)).toDF("q_idx", "q_val")
    val qD = Seq(Tuple1(qDense)).toDF("q_arr")
    val s = sparseCorpus.crossJoin(broadcast(qS))
      .select(col("id"), call_function("graft_sparse_dot",
        col("idx"), col("vs"), col("q_idx"), col("q_val")).as("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val d = denseCorpus.crossJoin(broadcast(qD))
      .select(col("id"), call_function("graft_dot", col("arr"), col("q_arr")).as("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s == d)
    // sanity: the overlapping rows really score nonzero
    assert(s.count(_._2 != 0.0) == 2000 / 2048 + 1)
  }

  test("A/B at dim=65536 nnz=32: sparse merge-dot beats densified dense-dot") {
    // 16 query vectors per run: 32k dot evaluations, so the dense side
    // reads 16 x 2000 x 65536 = 2.1G doubles and compute dominates the
    // ~150 ms fixed job overhead that otherwise drowns the comparison
    val qS = (0 until 16).map(i => sparseRow(i * 7L + 5L)).map(r => (r._2, r._3))
      .toDF("q_idx", "q_val")
    val qD = (0 until 16).map(i => Tuple1(denseRow(i * 7L + 5L)._2)).toDF("q_arr")
    // materialize both cached inputs before timing
    sparseCorpus.count(); denseCorpus.count()
    def time(f: => Unit): Long = {
      val t0 = System.nanoTime(); f; System.nanoTime() - t0
    }
    def sparseRun(): Unit = sparseCorpus.crossJoin(broadcast(qS))
      .select(sum(call_function("graft_sparse_dot",
        col("idx"), col("vs"), col("q_idx"), col("q_val")))).head()
    def denseRun(): Unit = denseCorpus.crossJoin(broadcast(qD))
      .select(sum(call_function("graft_dot", col("arr"), col("q_arr")))).head()
    sparseRun(); denseRun() // warm codegen caches
    val tSparse = (1 to 3).map(_ => time(sparseRun())).min
    val tDense  = (1 to 3).map(_ => time(denseRun())).min
    info(f"sparse ${tSparse / 1e6}%.1f ms vs dense ${tDense / 1e6}%.1f ms " +
      f"(${tDense.toDouble / tSparse}%.1fx) at dim=$dim nnz=$nnz, 16 queries")
    // observed ~0.2 s sparse vs ~3 s dense (>10x); assert 2x so the guard
    // holds even on a heavily loaded shared host
    assert(tSparse * 2 < tDense,
      f"sparse ${tSparse / 1e6}%.1f ms not 2x faster than dense ${tDense / 1e6}%.1f ms")
    sparseCorpus.unpersist(); denseCorpus.unpersist()
  }
}

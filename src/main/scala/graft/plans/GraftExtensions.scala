package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Engine extension installer — the public `SparkSessionExtensions` seam.
  * Activate with `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`); the
  * custom expressions then resolve by name in SQL and via
  * `call_function("graft_dot", ...)` in the DataFrame API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "graft_l2norm"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        L2Norm(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_sparse_dot"),
      new ExpressionInfo(classOf[SparseDotProduct].getName, "graft_sparse_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SparseDotProduct(args(0), args(1), args(2), args(3))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContainsString].getName, "graft_bloom_contains"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BloomContainsString(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZOrder2].getName, "graft_zorder"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ZOrder2(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_q8_pack"),
      new ExpressionInfo(classOf[Q8Pack].getName, "graft_q8_pack"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Q8Pack(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_q8_dot"),
      new ExpressionInfo(classOf[Q8Dot].getName, "graft_q8_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Q8Dot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "graft_kmv_distinct"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other =>
            throw new IllegalArgumentException(
              s"graft_kmv_distinct k must be a literal, got $other")
        }
        KmvDistinct(args(0), k)
      }))
  }
}

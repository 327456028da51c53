package graft.plans

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/** `graft_kmv_distinct(str, k)` — a KMV (k-minimum-values / bottom-k)
  * distinct-count sketch as a Catalyst `TypedImperativeAggregate`: the
  * aggregate-side extension seam, complementing the codegen scalar
  * expressions (`graft_dot`, `graft_bloom_contains`, …). Runs under
  * ObjectHashAggregateExec with real partial aggregation: per-partition
  * buffers hold at most k digests, `merge` is set-union + truncate, and
  * only k strings per group cross the exchange — the same map-side
  * combine shape as a built-in aggregate, at any group count.
  *
  * The sketch keeps the k lexicographically smallest md5 hex digests of
  * the DISTINCT input values (a `TreeSet` — duplicate values hash to the
  * same digest and vanish, which is what makes this a distinct counter).
  * Estimate: with u_k = (first 12 nibbles of the k-th smallest digest) /
  * 16^12, the standard KMV estimator (k−1)/u_k; under k distinct values
  * the sketch IS the value set and the count is exact.
  *
  * Two properties matter for the gate:
  *  - DETERMINISM: "k smallest of a set" is independent of partitioning,
  *    merge order and duplication — so unlike HLL the estimate itself
  *    hash-gates, and the DuckDB oracle recomputes it bit-for-bit
  *    (md5 is engine-portable; row_number over the sorted digests finds
  *    the same k-th value).
  *  - EXACT ARITHMETIC: k = 32 and 12 nibbles keep (k−1)·16^12 under
  *    2^53, so the numerator is an exact double and the single division
  *    is IEEE-identical across engines.
  *
  * Reference scope note: the reference has no sketches at all; this
  * completes the engine's sketch tier (HLL `approx_count_distinct`, GK
  * percentiles, bloom, CMS) with the one whose estimate is reproducible
  * enough to hash.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  require(k >= 2 && k <= 4096, s"k must be in [2, 4096], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  // one digest instance per deserialized expression copy (= per task, so
  // single-threaded); getInstance + format-string hex per row costs more
  // than the hash itself
  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  private def md5hex(s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    val hex = KmvDistinct.HexChars
    var i = 0
    while (i < 16) {
      val b = d(i) & 0xff
      out(i * 2) = hex(b >>> 4)
      out(i * 2 + 1) = hex(b & 0xf)
      i += 1
    }
    new String(out)
  }

  private def insert(buf: java.util.TreeSet[String], digest: String): Unit = {
    if (buf.size < k) { buf.add(digest); () }
    else if (digest.compareTo(buf.last) < 0) {
      if (buf.add(digest)) { buf.pollLast(); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[String], input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) insert(buf, md5hex(v.toString))
    buf
  }

  override def merge(
      buf: java.util.TreeSet[String],
      other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  /** First 12 nibbles as an exact double in (0, 16^12). */
  private def nibbleValue(digest: String): Double =
    java.lang.Long.parseLong(digest.substring(0, 12), 16).toDouble

  override def eval(buf: java.util.TreeSet[String]): Any =
    if (buf.size < k) buf.size.toDouble
    else ((k - 1).toDouble * 281474976710656.0) / nibbleValue(buf.last)

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(buf.size * 32)
    buf.forEach(d => { sb.append(d); () })
    sb.toString.getBytes(StandardCharsets.US_ASCII)
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val buf = new java.util.TreeSet[String]()
    val s = new String(bytes, StandardCharsets.US_ASCII)
    var i = 0
    while (i + 32 <= s.length) { buf.add(s.substring(i, i + 32)); i += 32 }
    buf
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_distinct expects a STRING child, got ${child.dataType}")
    }
  override def prettyName: String = "graft_kmv_distinct"
}

object KmvDistinct {
  private val HexChars = "0123456789abcdef".toCharArray
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(str, serialized_filter)` — codegen membership
  * probe of a string against a pre-built `org.apache.spark.util.sketch
  * .BloomFilter`, carried as a foldable BINARY literal.
  *
  * This is the native replacement for the one UDF the engine ever had
  * (the incremental-dedup tier-2 prefilter): a `udf(bf.value
  * .mightContainString _)` breaks whole-stage codegen for its stage —
  * every probe row is boxed through a Scala closure. This expression keeps
  * the probe inside the generated code: the filter deserializes ONCE per
  * plan (lazy, from the literal) and each row costs two xxhash64 passes
  * over the already-in-register UTF8String bytes.
  *
  * Distribution: the literal bytes travel in the task binary, which Spark
  * broadcasts once per stage — the same wire cost as the explicit
  * `sparkContext.broadcast` the UDF used. This literal-child seam is how
  * Spark ships its own runtime-injected bloom filters
  * (`InjectRuntimeFilter`), so it inherits that scale story: sane up to
  * the same sketch sizes Spark itself broadcasts.
  *
  * Null semantics: null string → null. Probing hashes the string's UTF-8
  * bytes (`mightContainBinary`), which is exactly what `putString`/
  * `mightContainString` hash — bit-identical to the UDF it replaces.
  */
case class BloomContainsString(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType) {
      TypeCheckFailure(s"$prettyName needs a STRING probe value, got ${left.dataType}")
    } else if (right.dataType != BinaryType || !right.foldable) {
      TypeCheckFailure(s"$prettyName needs a foldable BINARY serialized filter")
    } else if (right.eval() == null) {
      TypeCheckFailure(s"$prettyName filter bytes must not be null")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }

  // One deserialization per plan instance; @transient so the expression
  // tree serializes only the bytes (the literal child) to executors and
  // each rebuilds lazily on first probe.
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(right.eval().asInstanceOf[Array[Byte]]))

  override def nullSafeEval(value: Any, filterBytes: Any): Any =
    bloom.mightContainBinary(value.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the deserialized filter from the generated class (the
    // reference array serializes it to executors — BloomFilterImpl is
    // Serializable; this mirrors Spark's BloomFilterMightContain codegen)
    val bloomRef = ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (value, _) =>
      s"${ev.value} = $bloomRef.mightContainBinary($value.getBytes());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

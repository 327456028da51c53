package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/** Int8 scalar quantization for dense embeddings — the storage/bandwidth
  * lever for vector workloads at 100 TB: a 64-dim fp32 embedding is 256
  * bytes; its symmetric-int8 form is 64 bytes (4×), and candidate scoring
  * becomes an integer multiply-accumulate instead of an fp32 one. A 100 TB
  * embedding corpus scans, shuffles, and caches as 25 TB; the fp32
  * originals are only touched by the final exact rerank of the shortlist
  * (see `SimilarityOps.quantizedTopK`).
  *
  * Quantization rule (per vector, symmetric, zero-preserving):
  *
  *   ma  = max_i |x_i|            (0 ⇒ the all-zero code)
  *   q_i = floor(x_i * 127.0 / ma + 0.5)   ∈ [-127, 127]
  *
  * Every step is ONE IEEE-754 operation in a fixed order (multiply, divide,
  * add, floor), so the integer codes — and therefore every quantized score
  * derived from them — are bit-identical on any engine that states the same
  * arithmetic. The DuckDB oracle restates the rule verbatim over
  * `DOUBLE[]` lists, which is what lets `ann_quantized` hash-gate an
  * int8 index end-to-end (approximation error included) rather than
  * settling for verdict booleans. q_i stays in [-127, 127] without a
  * clamp: |x_i| ≤ ma bounds |x_i·127/ma| by 127 up to one rounding, and
  * floor(127.0000001 + 0.5) = 127, floor(-127.0000001 + 0.5) = -127.
  *
  * [[Q8Pack]] emits the codes as BinaryType (one signed byte per element —
  * the genuinely 4×-compact representation, not an array<int> that would
  * re-inflate to 4 bytes/element); [[Q8Dot]] scores two packed vectors with
  * an exact long accumulator (|Σ q_a·q_b| ≤ dim·127² — overflow-free below
  * dim ≈ 5.7·10¹⁴). Both are whole-stage-codegen expressions, registered
  * as `graft_q8_pack` / `graft_q8_dot` via [[GraftExtensions]].
  *
  * Null semantics follow [[DotProduct]]: null input → null, null element →
  * null, packed-length mismatch → null.
  */
case class Q8Pack(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_q8_pack"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ma = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = math.abs(x.getDouble(i))
      if (v > ma) ma = v
      i += 1
    }
    val out = new Array[Byte](n)
    if (ma != 0.0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(x.getDouble(i) * 127.0 / ma + 0.5).toByte
        i += 1
      }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // freshName locals: nullSafeExec pastes unbraced for non-nullable
      // inputs, so two instances in one generated method would collide
      val n = ctx.freshName("n")
      val ma = ctx.freshName("ma")
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $ma = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = Math.abs($a.getDouble($i));
         |  if ($v > $ma) $ma = $v;
         |}
         |if (!${ev.isNull}) {
         |  byte[] $out = new byte[$n];
         |  if ($ma != 0.0) {
         |    for (int $i = 0; $i < $n; $i++) {
         |      $out[$i] = (byte) Math.floor($a.getDouble($i) * 127.0 / $ma + 0.5);
         |    }
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact integer dot product of two [[Q8Pack]]-packed vectors: Σ qa_i·qb_i
  * over signed bytes, accumulated in long. The quantized cosine is then
  * `q8dot(a,b) / (sqrt(q8dot(a,a)) · sqrt(q8dot(b,b)))` — integer sums
  * under correctly-rounded sqrt and one division, deterministic on any
  * engine. Length mismatch → null (dimension drift is a data bug, not a 0).
  */
case class Q8Dot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_q8_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) return null
    var s = 0L
    var i = 0
    while (i < x.length) {
      s += x(i) * y(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    $s += $a[$i] * $b[$i];
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

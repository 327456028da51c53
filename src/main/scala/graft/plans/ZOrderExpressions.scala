package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Morton (z-order) interleave — the multi-dimensional clustering key
  * behind OPTIMIZE/ZORDER-style data layout: sort-and-write by
  * `graft_zorder(x, y)` and contiguous file ranges become bounding BOXES
  * over BOTH dimensions, so parquet min/max (or any zone-map) skipping
  * works for predicates on either column. A single-dimension sort gives
  * tight ranges on the sort key and full-width ranges on everything else;
  * the z-curve trades a little of the first for two-sided skipping — the
  * layout lever that matters when a 100 TB fact table is probed by
  * customer one day and by date the next (`ZOrderSpec` measures exactly
  * this two-sided-span property on the fixture).
  *
  * Semantics: bit 2i of the result is bit i of `x`, bit 2i+1 is bit i of
  * `y`, over the LOW 32 bits of each input (callers' dimension values must
  * be non-negative and < 2³² — ids, day numbers, bucketed doubles). Nulls
  * propagate. Implemented as the classic mask-spread (5 shift/mask rounds
  * per operand, branch-free) in both the interpreted eval and `doGenCode`,
  * so the expression stays inside whole-stage codegen — same design
  * rationale as [[DotProduct]].
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName locals: see DotProduct — unbraced nullSafeExec paste
      // means two instances in one generated method must not collide.
      // The mask-spread rounds are emitted inline (not a helper call): a
      // Scala companion method has no Java static forwarder when a
      // companion class exists, and janino compiles plain Java
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      def rounds(v: String): String =
        s"""
           |$v &= 0xFFFFFFFFL;
           |$v = ($v | ($v << 16)) & 0x0000FFFF0000FFFFL;
           |$v = ($v | ($v << 8)) & 0x00FF00FF00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0F0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x3333333333333333L;
           |$v = ($v | ($v << 1)) & 0x5555555555555555L;
         """.stripMargin
      s"""
         |long $xs = $a;
         |long $ys = $b;
         |${rounds(xs)}
         |${rounds(ys)}
         |${ev.value} = $xs | ($ys << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Low 32 bits of `v` spread onto the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}

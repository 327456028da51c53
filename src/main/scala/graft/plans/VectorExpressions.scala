package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Custom Catalyst expressions for dense-vector math (SURVEY.md §4.2
  * extension territory).
  *
  * The built-in way to express a dot product —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is semantically fine but
  * higher-order functions are CodegenFallback: every element evaluation is
  * an interpreted virtual call with boxed doubles. These expressions emit a
  * tight primitive loop via `doGenCode`, keeping ANN scoring inside
  * whole-stage codegen. Registered as SQL functions `graft_dot` /
  * `graft_l2norm` through [[GraftExtensions]] (the public
  * `SparkSessionExtensions.injectFunction` seam).
  *
  * Null semantics mirror the higher-order formulation: null input array →
  * null; mismatched lengths or a null element → null (zip_with pads with
  * null and `null * x` poisons the fold).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // locals via freshName: with a non-nullable input nullSafeExec pastes
      // this body unbraced, so two instances in one generated method (e.g.
      // a dot and two norms composing a cosine) would otherwise collide on
      // duplicate declarations, fail janino, and fall back to interpreted
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** sqrt(Σ xᵢ²) with the same codegen/null story as [[DotProduct]]. */
case class L2Norm(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i)
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // freshName for the same duplicate-declaration reason as DotProduct
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |if (!${ev.isNull}) ${ev.value} = Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted-merge sparse dot product over (indices, values) array pairs —
  * `graft_sparse_dot(idx_a, val_a, idx_b, val_b)`. O(nnz_a + nnz_b)
  * regardless of the nominal dimension, vs [[DotProduct]]'s O(dim): at a
  * TF-IDF vocabulary of 10⁵+ with nnz ≈ document length, densifying via
  * `vector_to_array` materializes |vocab| doubles per row just to multiply
  * mostly zeros. Indices MUST be strictly ascending within each vector
  * (MLlib `SparseVector` guarantees this); values at matching indices are
  * multiplied in ascending index order, so the accumulation order — and
  * therefore the IEEE result — is identical to the dense loop's (adding
  * the skipped 0.0 terms is exact).
  *
  * Null semantics follow [[DotProduct]]: any null input array → null;
  * indices/values length mismatch within a side → null; a null element
  * reached by the merge → null.
  */
case class SparseDotProduct(idxA: Expression, valA: Expression,
                            idxB: Expression, valB: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def first: Expression  = idxA
  override def second: Expression = valA
  override def third: Expression  = idxB
  override def fourth: Expression = valB

  override def inputTypes: Seq[DataType] = Seq(
    ArrayType(IntegerType), ArrayType(DoubleType),
    ArrayType(IntegerType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sparse_dot"

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val ia = a.asInstanceOf[ArrayData]; val va = b.asInstanceOf[ArrayData]
    val ib = c.asInstanceOf[ArrayData]; val vb = d.asInstanceOf[ArrayData]
    val na = ia.numElements(); val nb = ib.numElements()
    if (na != va.numElements() || nb != vb.numElements()) return null
    var s = 0.0
    var i = 0
    var j = 0
    while (i < na && j < nb) {
      if (ia.isNullAt(i) || va.isNullAt(i) || ib.isNullAt(j) || vb.isNullAt(j)) return null
      val xi = ia.getInt(i); val xj = ib.getInt(j)
      if (xi == xj) { s += va.getDouble(i) * vb.getDouble(j); i += 1; j += 1 }
      else if (xi < xj) i += 1
      else j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ia, va, ib, vb) => {
      // freshName locals for the same duplicate-declaration reason as
      // DotProduct (nullSafeExec pastes unbraced for non-nullable inputs)
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val xi = ctx.freshName("xi"); val xj = ctx.freshName("xj")
      s"""
         |int $na = $ia.numElements();
         |int $nb = $ib.numElements();
         |if ($na != $va.numElements() || $nb != $vb.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  int $i = 0;
         |  int $j = 0;
         |  while ($i < $na && $j < $nb) {
         |    if ($ia.isNullAt($i) || $va.isNullAt($i) || $ib.isNullAt($j) || $vb.isNullAt($j)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    int $xi = $ia.getInt($i);
         |    int $xj = $ib.getInt($j);
         |    if ($xi == $xj) { $s += $va.getDouble($i) * $vb.getDouble($j); $i++; $j++; }
         |    else if ($xi < $xj) $i++;
         |    else $j++;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(idxA = newFirst, valA = newSecond, idxB = newThird, valB = newFourth)
}

package graft.core

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd scalar distance kernels over `array<float>` columns.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) are
  * CodegenFallback: every evaluation goes through the interpreter and
  * allocates an intermediate array — measurably dominant in pairwise
  * workloads (the sf0.1 near-dup join spent 17 of 51 bench seconds there).
  * These expressions generate a tight primitive loop inside whole-stage
  * codegen instead: no allocation, no boxing, direct `getFloat` reads.
  *
  * Numeric contract (must stay bit-identical to the HOF forms and the
  * DuckDB oracle — SURVEY.md §7.4 risk 5): each element widened to double,
  * strict left-to-right accumulation, products/differences in double.
  * Vectors are assumed non-null-element (`containsNull=false` in the chunk
  * store schema); length mismatch folds over the shorter prefix.
  */
abstract class FloatVecFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  /** Java source for one loop step: accumulate into `acc` from floats `x`
    * and `y`. */
  protected def stepCode(acc: String, x: String, y: String): String
  /** Interpreted twin of stepCode. */
  protected def step(acc: Double, x: Float, y: Float): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc = step(acc, x.getFloat(i), y.getFloat(i)); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  ${stepCode(acc, x, y)}
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Σ (aᵢ−bᵢ)² — squared Euclidean distance (the reference's L2 space,
  * /root/reference/app.py:73-76). */
case class FloatVecSquaredL2(left: Expression, right: Expression) extends FloatVecFold {
  override def prettyName: String = "vec_squared_l2"
  override protected def stepCode(acc: String, x: String, y: String): String =
    s"double d = $x - $y; $acc += d * d;"
  override protected def step(acc: Double, x: Float, y: Float): Double = {
    val d = x.toDouble - y.toDouble; acc + d * d
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity in one fused pass: dot, |a|² and |b|² accumulate in a
  * single loop (the composed dot/norm·norm form traverses both arrays three
  * times). Arithmetic is ordered exactly like the composed form —
  * Σab / (√Σa² · √Σb²), each Σ a left-to-right double fold — so results
  * are bit-identical to it and to the DuckDB oracle. */
case class FloatVecCosineSim(left: Expression, right: Expression) extends FloatVecFold {
  override def prettyName: String = "vec_cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; aa += xi * xi; bb += yi * yi
      i += 1
    }
    dot / (math.sqrt(aa) * math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val aa = ctx.freshName("aa"); val bb = ctx.freshName("bb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $aa = 0.0; double $bb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $aa += $x * $x; $bb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
       """.stripMargin
    })

  // unused by the overridden eval/codegen, required by the base contract
  override protected def stepCode(acc: String, x: String, y: String): String = ""
  override protected def step(acc: Double, x: Float, y: Float): Double = acc
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ aᵢ·bᵢ — dot product. */
case class FloatVecDot(left: Expression, right: Expression) extends FloatVecFold {
  override def prettyName: String = "vec_dot"
  override protected def stepCode(acc: String, x: String, y: String): String =
    s"$acc += $x * $y;"
  override protected def step(acc: Double, x: Float, y: Float): Double =
    acc + x.toDouble * y.toDouble
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

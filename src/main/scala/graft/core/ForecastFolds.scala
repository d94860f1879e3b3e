package graft.core

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** LINEAR-state trajectory folds for the integer forecasting recursions
  * (holt_linear / holt_winters).
  *
  * The SQL HOF form (`aggregate(xs, array(), (a, x) -> array_append(a,
  * step(element_at(a, -1), x)))`) carries the FULL accumulated
  * trajectory as fold state, so every step copies it to append one
  * struct — O(days²) element copies per series (round-11 verdict
  * finding #2). Harmless at the calendar-bounded daily grain, quadratic
  * the moment anyone reuses the pattern at finer grain. These
  * expressions walk the collected array ONCE with O(1) recursion state
  * and append into a pre-sized output array — O(days), any grain
  * (ForecastFoldsSpec pins a 50k-step series sub-second).
  *
  * Numeric contract (must stay bit-identical to the HOF forms and the
  * DuckDB `WITH RECURSIVE` oracles): all-BIGINT state, every divide a
  * `div`-style integral division truncating toward ZERO — exactly
  * Scala's `Long./` — including on negative trend/seasonal values (the
  * round-10 probed pin). Evaluation is interpreted (CodegenFallback):
  * the expression runs ONCE per series on a post-aggregation frame of a
  * handful of rows, so codegen would buy nothing.
  */
abstract class TrajectoryFold extends UnaryExpression with CodegenFallback {

  /** Required input element fields (name -> type), in order. */
  protected def inputFields: Seq[(String, DataType)]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.fields.length == inputFields.length &&
          st.fields.zip(inputFields).forall { case (f, (n, t)) =>
            f.name == n && f.dataType == t } =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<${inputFields.map {
        case (n, t) => s"$n: ${t.simpleString}" }.mkString(", ")}>>, " +
        s"got ${other.catalogString}")
  }
}

/** Holt linear (double-exponential, α = β = ½) trajectory over a SORTED
  * (day, rev) series: l_t = ⌊(y_t + l_{t−1} + b_{t−1})/2⌋,
  * b_t = ⌊(b_{t−1} + (l_t − l_{t−1}))/2⌋; first element seeds
  * (l, b) = (y_0, 0). Output mirrors the input order with (lvl, trd)
  * appended. */
case class HoltLinearTrajectory(child: Expression) extends TrajectoryFold {

  override def prettyName: String = "holt_linear_fold"

  override protected def inputFields: Seq[(String, DataType)] =
    Seq("day" -> DateType, "rev" -> LongType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("day", DateType, nullable = false),
    StructField("rev", LongType, nullable = false),
    StructField("lvl", LongType, nullable = false),
    StructField("trd", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Any](n)
    var lvl = 0L
    var trd = 0L
    var i = 0
    while (i < n) {
      val x = xs.getStruct(i, 2)
      val day = x.getInt(0)
      val rev = x.getLong(1)
      if (i == 0) { lvl = rev; trd = 0L }
      else {
        val l0 = lvl
        lvl = (rev + lvl + trd) / 2
        trd = (trd + (lvl - l0)) / 2
      }
      out(i) = new GenericInternalRow(Array[Any](day, rev, lvl, trd))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Holt-Winters additive-seasonal (α = β = γ = ½, 7-slot weekly
  * component) trajectory over a SORTED (day, rev, dow) series:
  * l_t = ⌊(y − s_dow + l + b)/2⌋, b as Holt,
  * s_dow' = ⌊(y − l_t + s_dow)/2⌋; seeds (y_0, 0, zeros). The output
  * carries the full post-update seasonal vector per step (a 7-element
  * copy — the fold state itself stays O(1)). */
case class HoltWintersTrajectory(child: Expression) extends TrajectoryFold {

  override def prettyName: String = "holt_winters_fold"

  override protected def inputFields: Seq[(String, DataType)] =
    Seq("day" -> DateType, "rev" -> LongType, "dow" -> LongType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("day", DateType, nullable = false),
    StructField("rev", LongType, nullable = false),
    StructField("dow", LongType, nullable = false),
    StructField("lvl", LongType, nullable = false),
    StructField("trd", LongType, nullable = false),
    StructField("s", ArrayType(LongType, containsNull = false),
      nullable = false))), containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Any](n)
    var lvl = 0L
    var trd = 0L
    val s = new Array[Long](7)
    var i = 0
    while (i < n) {
      val x = xs.getStruct(i, 3)
      val day = x.getInt(0)
      val rev = x.getLong(1)
      val dow = x.getLong(2).toInt
      if (i == 0) { lvl = rev; trd = 0L }
      else {
        val l0 = lvl
        lvl = (rev - s(dow) + lvl + trd) / 2
        trd = (trd + (lvl - l0)) / 2
        s(dow) = (rev - lvl + s(dow)) / 2
      }
      out(i) = new GenericInternalRow(Array[Any](day, rev, dow.toLong, lvl,
        trd, new GenericArrayData(java.util.Arrays.copyOf(s, 7))))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

package graft.core

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen'd Catalyst expression —
  * the standard name/entity matching metric (record linkage,
  * survivorship) that Spark ships no built-in for (`levenshtein` exists;
  * Jaro–Winkler's transposition-tolerant, prefix-boosted score is the
  * one the entity-resolution literature actually uses — Winkler 1990,
  * public). Same (b)-tier extension rationale as [[NfcNormalize]]: a
  * Scala UDF would box rows and break whole-stage codegen; this
  * expression's generated code calls the static kernel directly inside
  * the codegen'd stage.
  *
  * Semantics pinned to the classic algorithm with DuckDB's edge
  * convention (empty input → 0.0 even for two empties), verified
  * equal to `jaro_winkler_similarity` at e6 rounding over 750+ probe
  * pairs: match window ⌊max(|a|,|b|)/2⌋−1, transpositions = half the
  * out-of-order matches, boost threshold 0.7, prefix scale 0.1 over at
  * most 4 leading characters. Comparison is per UTF-16 char — for
  * supplementary-plane text (surrogate pairs) the unit differs from a
  * codepoint-based engine; the entity-matching domain this serves
  * (names, titles, catalog strings) is BMP text. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.core.JaroWinkler.similarity($a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler = copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static kernel shared by interpreted eval and generated code. */
  def similarity(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0 // DuckDB convention, incl. "" vs ""
    if (s1 == s2) return 1.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, l2)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!f2(j) && s1.charAt(i) == s2.charAt(j)) {
          f1(i) = true; f2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val j = (m.toDouble / l1 + m.toDouble / l2 + (m - half).toDouble / m) / 3.0
    if (j > 0.7) {
      var l = 0
      val max = math.min(4, math.min(l1, l2))
      while (l < max && s1.charAt(l) == s2.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }
}

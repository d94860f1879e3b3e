package graft.core

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd Catalyst expression —
  * the canonicalization step a multilingual corpus pipeline runs before
  * ANY fingerprint/dedup pass: composed (U+00E9) and decomposed
  * (U+0065 U+0301) spellings of the same text are byte-distinct, so
  * md5/minhash/simhash all see two documents until normalization folds
  * them (Unicode Standard Annex #15, public). Spark ships no
  * normalization built-in; a Scala UDF would box every row and block
  * whole-stage codegen, so this is the (b)-tier extension point from
  * the build rules: a real `Expression` whose generated code calls the
  * JDK's `java.text.Normalizer` directly inside the codegen'd pipeline
  * stage. NFC output is canonically unique, deterministic across JVMs
  * (the Unicode tables ship with the JDK and are version-stable for
  * the canonical forms), and idempotent. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.NFC));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the text
  * canonicalization step a multilingual corpus scrub runs before any
  * hashing or dedup: visually-identical strings with different codepoint
  * sequences (precomposed é vs e + combining accent) hash differently
  * and silently defeat exact dedup unless every document is normalized
  * to one canonical form first.
  *
  * Spark ships no normalization function, and this engine's zero-UDF
  * rule makes a Catalyst expression the right vehicle: `nullSafeEval` +
  * `doGenCode` both dispatch to one static Java helper (the
  * [[Md5Hash32]] pattern), so the expression stays inside whole-stage
  * codegen. ASCII fast path: NFC cannot change pure-ASCII text, and
  * `Normalizer.isNormalized` is a cheap scan — the common web-corpus row
  * pays one pass, no allocation.
  *
  * DuckDB exposes the same operation as `nfc_normalize`, so plans using
  * this stay oracle-checkable on non-ASCII fixtures. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalizeJava(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.NfcNormalize.normalizeJava($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def normalizeJava(s: UTF8String): UTF8String = {
    // pure ASCII (every UTF-8 byte < 0x80) is always NFC — scan raw
    // bytes so the common-case row never decodes to java.lang.String
    val nb = s.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < nb) { if ((s.getByte(i) & 0x80) != 0) ascii = false; i += 1 }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization of a string column — the canonical-
 * composition pass every text-dedup pipeline runs before fingerprinting:
 * visually identical strings with different codepoint sequences (é as
 * U+00E9 vs e + combining U+0301) must hash identically or every
 * fingerprint/shingle/fingerprint-join operator silently under-counts
 * duplicates on real-world text.
 *
 * Spark ships no normalization builtin; a Scala UDF would box every row
 * and fall out of codegen. This expression calls `java.text.Normalizer`
 * through a shared kernel from both the interpreted and generated paths
 * — with a fast path that skips allocation entirely for ASCII-only
 * strings (the overwhelming majority of web text), detected on the raw
 * UTF-8 bytes without decoding.
 */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NfcNormalize].getName, "graft_nfc")

  /** Shared kernel for the interpreted and generated paths. */
  def compute(s: UTF8String): UTF8String = {
    // ASCII bytes are all < 0x80 and NFC-invariant — return the input
    // untouched (no decode, no allocation)
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }
}

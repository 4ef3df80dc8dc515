package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Whitespace tokenizer kernel: the single-space split with empties
 * removed that every text operator starts from
 * ([[graft.operators.TextAnalysis.tokens]]).
 *
 * The declarative form — `filter(split(text, " "), t => t =!= "")` —
 * pays a regex split that MATERIALIZES every empty segment of a
 * multi-space run, then an interpreted higher-order `filter` pass with
 * a boxed lambda call per segment. This kernel scans the UTF-8 bytes
 * once and emits only the non-empty segments. Splitting on the raw
 * 0x20 byte is UTF-8-safe: continuation and lead bytes of multi-byte
 * code points are all ≥ 0x80, so a space byte is always a real space.
 *
 * Bit-parity with the reference (InterpretedParitySpec): null → null;
 * "" → empty array (split yields [""], filter drops it); multiple/
 * leading/trailing spaces collapse; non-space whitespace (tab,
 * newline, NBSP) is NOT a separator — exactly the single-space split
 * contract the DuckDB oracles replay with `string_split(text, ' ')`.
 */
case class Tokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_tokens"

  override protected def nullSafeEval(text: Any): Any =
    Tokens.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.plans.Tokens.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Tokens =
    copy(child = newChild)
}

object Tokens {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Tokens].getName, "graft_tokens")

  /** Shared kernel for the interpreted and generated paths. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](8)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        if (i > start) out.add(UTF8String.fromBytes(bytes, start, i - start))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

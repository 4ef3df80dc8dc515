package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Contiguous word n-gram kernel: every space-joined `n`-token window
 * IN ORDER, frequencies kept — the string-producing sibling of
 * [[WindowHashes]] (same window walk, grams instead of hashes) and the
 * compiled replacement for [[graft.operators.TextAnalysis.ngrams]]'
 * (n−1)-deep `zip_with` chain, which paid n−1 interpreted HOF passes
 * and a full intermediate array allocation per pass.
 *
 * Bit-parity with the declarative chain (InterpretedParitySpec):
 * null tokens array → null; arrays shorter than `n` → empty; grams
 * containing a null token drop and later positions compact — exactly
 * the chain's trailing `filter(isNotNull)`.
 *
 * `n` must be a foldable positive int.
 */
case class WindowGrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<string>, foldable int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_window_grams"

  override protected def nullSafeEval(toks: Any, n: Any): Any =
    WindowGrams.compute(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.WindowGrams.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WindowGrams =
    copy(left = newLeft, right = newRight)
}

object WindowGrams {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WindowGrams].getName, "graft_window_grams")

  private val SEP = UTF8String.fromString(" ")

  /** Shared kernel for the interpreted and generated paths — the same
    * null-dropping window walk as [[WindowHashes.compute]], emitting
    * the joined gram instead of its hash. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (n < 1 || len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](len - n + 1)
    var filled = 0
    var i = 0
    while (i <= len - n) {
      var g: UTF8String =
        if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      var j = 1
      while (g != null && j < n) {
        g = if (toks.isNullAt(i + j)) null
            else UTF8String.concat(g, SEP, toks.getUTF8String(i + j))
        j += 1
      }
      if (g != null) {
        out(filled) = g
        filled += 1
      }
      i += 1
    }
    new GenericArrayData(
      if (filled == out.length) out else java.util.Arrays.copyOf(out, filled))
  }
}

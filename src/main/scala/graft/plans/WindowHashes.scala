package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Positional sliding-window hash kernel: from a token array, the
 * xxhash64 of every space-joined `n`-token window IN ORDER — the
 * order-preserving, frequency-keeping sibling of
 * [[SortedShingleHashes]] (which sorts and dedups for set-similarity).
 * `posexplode(graft_window_hashes(toks, n))` is bit-identical to
 * `posexplode(filter(ngrams-zip_with-chain)) + xxhash64(gram)` —
 * including position compaction when null-bearing grams drop — at a
 * fraction of the interpreted-HOF cost (no per-step array allocations,
 * no boxed lambda calls). The entry point of the repeated-span /
 * ExactSubstr family ([[graft.operators.Dedup.repeatedSpans]]).
 *
 * `n` must be a foldable positive int. Token arrays shorter than `n`
 * yield an empty array.
 */
case class WindowHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<string>, foldable int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_window_hashes"

  override protected def nullSafeEval(toks: Any, n: Any): Any =
    WindowHashes.compute(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.WindowHashes.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WindowHashes =
    copy(left = newLeft, right = newRight)
}

object WindowHashes {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WindowHashes].getName, "graft_window_hashes")

  private val SEP = UTF8String.fromString(" ")

  /** Shared kernel for the interpreted and generated paths. Grams
    * containing a null token are dropped and later positions compact —
    * exactly the declarative chain's `filter(isNotNull)` semantics
    * (with split()-derived tokens nulls only pad the tail, so
    * positions are the window start indices). */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (n < 1 || len < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](len - n + 1)
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
        out(filled) = XXH64.hashUnsafeBytes(g.getBaseObject, g.getBaseOffset,
          g.numBytes, 42L)
        filled += 1
      }
      i += 1
    }
    new GenericArrayData(
      if (filled == out.length) out else java.util.Arrays.copyOf(out, filled))
  }
}

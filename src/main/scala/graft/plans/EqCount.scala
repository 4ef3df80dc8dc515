package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/**
 * Positional equality count of two long arrays — the MinHash signature
 * agreement estimator `size(filter(zip_with(a, b, _ === _), identity))`
 * in one compiled pass. That chain allocated a boolean array and a
 * filtered copy and paid two interpreted HOF passes per VERIFIED
 * CANDIDATE PAIR — the inner loop of every banded-LSH dedup
 * verification (one-shot pairs, keep-first, incremental state).
 *
 * Bit-parity with the chain (InterpretedParitySpec): positions beyond
 * the shorter array and positions where either side is null compare to
 * null and are NOT counted (zip_with null-pads the shorter side; a
 * null never passes the filter). Null array on either side → null.
 */
case class EqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, array<bigint>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_eq_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    EqCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.EqCount.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EqCount =
    copy(left = newLeft, right = newRight)
}

object EqCount {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[EqCount].getName, "graft_eq_count")

  /** Shared kernel for the interpreted and generated paths. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c
  }
}

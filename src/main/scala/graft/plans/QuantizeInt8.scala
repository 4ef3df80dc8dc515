package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructField, StructType}

/**
 * Symmetric int8 quantization kernel: `struct(scale, codes)` where
 * `scale = max(|x|)` (1.0 for null/empty/all-zero vectors) and
 * `codes(i) = floor(x/scale·127 + 0.5)` — the
 * [[graft.operators.Similarity.quantizeInt8]] contract in ONE compiled
 * two-pass loop instead of three interpreted higher-order functions
 * (abs-transform, array_max, code-transform; the code pass re-evaluated
 * the scale subtree per element).
 *
 * Bit-parity with the declarative reference (InterpretedParitySpec):
 * null vector → struct(1.0, null) (the HOF chain's transform-of-null,
 * NOT a null struct — the expression is non-nullable exactly like the
 * `struct(...)` it replaces); empty/all-zero → scale 1.0; null ELEMENTS
 * are skipped by the max and quantize to null codes; −0.0 inputs
 * produce |x| = 0.0. Finite-input contract: a NaN/Inf component throws
 * (the engine's ANSI sessions error in the declarative form's
 * floor/cast too; this kernel makes the error unconditional).
 */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = true),
      nullable = true)))

  override def nullable: Boolean = false

  override def prettyName: String = "graft_quantize_int8"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    QuantizeInt8.compute(if (v == null) null else v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val code = code"""
      ${childGen.code}
      InternalRow ${ev.value} = graft.plans.QuantizeInt8.compute(
        ${childGen.isNull} ? null :
          (org.apache.spark.sql.catalyst.util.ArrayData) ${childGen.value});
    """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[QuantizeInt8].getName, "graft_quantize_int8")

  /** Shared kernel for the interpreted and generated paths. */
  def compute(arr: ArrayData): InternalRow = {
    // pass 1: max |x| under Spark's double ordering (NaN greatest),
    // null elements skipped — exactly array_max(transform(abs))
    var maxAbs = 0.0
    var seen = false
    if (arr != null) {
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val a = Math.abs(arr.getDouble(i))
          if (!seen) { maxAbs = a; seen = true }
          else if (a > maxAbs ||
            (java.lang.Double.isNaN(a) && !java.lang.Double.isNaN(maxAbs))) {
            maxAbs = a
          }
        }
        i += 1
      }
    }
    val scale = if (!seen || maxAbs == 0.0) 1.0 else maxAbs
    // pass 2: codes; |x| ≤ scale ⇒ |code| ≤ 127, so overflow is
    // impossible for finite inputs — a non-finite code is a contract
    // violation and errors like the ANSI floor/cast it replaces
    val codes: ArrayData = if (arr == null) null else {
      val n = arr.numElements()
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val d = Math.floor(arr.getDouble(i) / scale * 127.0 + 0.5)
          if (d.isNaN || d < Int.MinValue.toDouble || d > Int.MaxValue.toDouble)
            throw new ArithmeticException(
              s"graft_quantize_int8: non-finite input (code $d)")
          out(i) = d.toInt
        }
        i += 1
      }
      new GenericArrayData(out)
    }
    new GenericInternalRow(Array[Any](scale, codes))
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * 64-bit SimHash signature kernel: per bit, the majority vote of the
 * input token hashes (Charikar 2002; the Dedup.simHash64 contract).
 *
 * The declarative formulation materializes 64 independent
 * `aggregate()` higher-order functions over the hash array — 64
 * interpreted passes per document, each paying a boxed lambda call per
 * element (the same interpreted-HOF tax the r13 LshBucket kernel
 * removed from the bucket stage). This kernel computes every vote in
 * ONE compiled pass: per element, increment a 64-slot ones-counter at
 * each set bit (popcount-proportional via the x & (x-1) trick), then
 * assemble the signature as bit i set iff 2·ones(i) > n — exactly
 * `sum(±1) > 0`, since vote(i) = 2·ones(i) − n.
 *
 * Bit-parity with the HOF reference (InterpretedParitySpec):
 * null array → null; empty array → 0L (all votes 0, not > 0); a null
 * ELEMENT votes −1 on every bit (the HOF's `when(null & mask ≠ 0)
 * .otherwise(-1)` three-valued collapse) — here: contributes no ones
 * but still counts in n.
 */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(hashes: Any): Any =
    SimHash64.compute(hashes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.SimHash64.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimHash64].getName, "graft_simhash64")

  /** Shared kernel for the interpreted and generated paths. */
  def compute(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val ones = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        var x = hashes.getLong(i)
        while (x != 0L) {
          ones(java.lang.Long.numberOfTrailingZeros(x)) += 1
          x &= x - 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      // vote(b) = ones − (n − ones) > 0  ⇔  2·ones > n
      if (2L * ones(b) > n) sig |= 1L << b
      b += 1
    }
    sig
  }
}

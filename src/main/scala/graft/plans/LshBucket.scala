package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * `graft_lsh_bucket(vec, planes_flat, dim)` — all hyperplane sign bits
 * of one LSH table in ONE compiled loop: bucket = Σ_p (proj_p ⋖ 0 ? 0 :
 * 1<<p) with proj_p = Σ_d vec[d]·planes[p·dim+d].
 *
 * Why a kernel when `graft_dot` already exists: a bucket is nPlanes
 * dots, a row computes nTables buckets, and whole-stage codegen INLINES
 * every dot loop into the consume method — 48+ unrolled loops push the
 * generated method past HotSpot's HugeMethodLimit (8 KB bytecode), so
 * the hottest stage of every LSH operator (q41/q61/q126) ran in
 * INTERPRETED bytecode: profiled at ~140 ns per vector element at sf16,
 * ~15× compiled speed. This expression is one small JIT-friendly loop;
 * the arithmetic is bit-identical to the `dot`-per-plane formulation
 * (same d-ascending summation per plane, null vector elements
 * contribute 0, and the sign test replicates Spark's NaN-is-largest /
 * -0.0 == 0.0 comparison semantics via `!(proj < 0)`).
 *
 * `planes_flat` is the row-major nPlanes×dim constant (foldable);
 * `dim` a positive int literal; at most 63 planes (bits of a BIGINT).
 */
case class LshBucket(first: Expression, second: Expression,
                     third: Expression) extends TernaryExpression {

  private def vec = first
  private def planes = second
  private def dimExpr = third

  @transient private lazy val dim: Int =
    dimExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = {
    def isDoubleArray(e: Expression) = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!isDoubleArray(vec) || !isDoubleArray(planes))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, array<double>, int), got " +
          s"(${vec.dataType.simpleString}, ${planes.dataType.simpleString})")
    else if (!planes.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: planes must be a constant")
    else if (!dimExpr.foldable || dimExpr.dataType != IntegerType ||
      dimExpr.eval() == null ||
      dimExpr.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: dim must be a positive int literal")
    else {
      val nElems = planes.eval().asInstanceOf[ArrayData].numElements()
      val d = dimExpr.eval().asInstanceOf[Number].intValue()
      // a flat matrix whose length is not an exact nPlanes×dim would
      // silently truncate the trailing plane under integer division —
      // reject at analysis (direct SQL use of graft_lsh_bucket can
      // hand-build the constant)
      if (nElems == 0 || nElems % d != 0)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: planes length ($nElems) must be a non-zero " +
            s"multiple of dim ($d)")
      else if (nElems / d > 63)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: at most 63 planes, got ${nElems / d}")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  /** The constant hyperplanes as one primitive array — hoisted ONCE
    * (driver side) so neither eval path pays per-element unboxing on
    * the literal's GenericArrayData. */
  @transient private lazy val planesArr: Array[Double] =
    planes.eval().asInstanceOf[ArrayData].toDoubleArray()

  override protected def nullSafeEval(v: Any, p: Any, d: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val pl = planesArr
    val dm = dim
    val nPlanes = pl.length / dm
    val n = math.min(x.numElements(), dm)
    var bucket = 0L
    var pi = 0
    while (pi < nPlanes) {
      var s = 0.0
      var i = 0
      val off = pi * dm
      while (i < n) {
        if (!x.isNullAt(i)) s += x.getDouble(i) * pl(off + i)
        i += 1
      }
      if (!(s < 0)) bucket |= 1L << pi
      pi += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val pl = ctx.addReferenceObj("lshPlanes", planesArr, "double[]")
      val pi = ctx.freshName("pi")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val b = ctx.freshName("b")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |long $b = 0L;
         |for (int $pi = 0; $pi < ${planesArr.length / dim}; $pi++) {
         |  double $s = 0.0;
         |  int $off = $pi * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$v.isNullAt($i)) {
         |      $s += $v.getDouble($i) * $pl[$off + $i];
         |    }
         |  }
         |  if (!($s < 0)) $b |= 1L << $pi;
         |}
         |${ev.value} = $b;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LshBucket =
    copy(first = f, second = s, third = t)
}

object LshBucket {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[LshBucket].getName, "graft_lsh_bucket")
}

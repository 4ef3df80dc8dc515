package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Codegen'd dot product of two `array<double>` columns.
 *
 * Why a custom Catalyst expression: the built-in formulation
 * `aggregate(zip_with(a, b, (x, y) -> x*y), 0d, (acc, x) -> acc + x)`
 * is correct but runs on the *interpreted* higher-order-function path
 * (HOFs have no whole-stage codegen), paying per-element lambda-eval
 * overhead — measured at ~20-40× the cost of this compiled loop on the
 * MinHash workload before it was restructured. Brute-force kNN over an
 * embedding corpus is exactly a dot-product-per-row hot loop, so this is
 * the one place the engine drops below the DataFrame API (SURVEY §7:
 * custom `Expression` only where built-ins can't express it efficiently).
 *
 * Folds left-to-right in index order — bit-identical to the HOF
 * formulation and to a sequential C loop, so results are reproducible
 * across partitionings and engines. Extra elements of a longer array are
 * ignored; null elements contribute 0 (embeddings are dense).
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        s += x.getDouble(i) * y.getDouble(i)
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DotProduct].getName, "graft_dot")
}

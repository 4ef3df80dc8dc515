package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Membership-count kernel: how many elements of a string array belong
 * to a LITERAL string set — `size(filter(toks, _.isin(set: _*)))` in
 * one compiled pass with the set hoisted into a hash set once per
 * plan. The declarative chain re-evaluated an O(|set|) `isin` chain
 * per token in an interpreted HOF pass per call — and the language-ID
 * scorer ([[graft.operators.TextAnalysis.langId]]) makes four such
 * calls per document.
 *
 * Bit-parity (InterpretedParitySpec): null array → null; null elements
 * never count (isin(null) is null, filter drops it).
 */
case class CountIn(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) => true
      case _ => false
    }
    if (!ok) TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<string>, array<string>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if (!right.foldable) TypeCheckResult.TypeCheckFailure(
      s"$prettyName set must be a literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_count_in"

  /** The literal set, hoisted once. UTF8String hashes/compares by
    * bytes, so set semantics match Spark string equality exactly. */
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val s = new java.util.HashSet[UTF8String](arr.numElements() * 2)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i))
      i += 1
    }
    s
  }

  private def count(toks: ArrayData): Int = {
    val n = toks.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i) && set.contains(toks.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def nullSafeEval(toks: Any, setArr: Any): Any =
    count(toks.asInstanceOf[ArrayData])

  /** Public bridge for generated code. */
  def countForCodegen(toks: ArrayData): Int = count(toks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("countIn", this, classOf[CountIn].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $self.countForCodegen($t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountIn =
    copy(left = newLeft, right = newRight)
}

object CountIn {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CountIn].getName, "graft_count_in")
}

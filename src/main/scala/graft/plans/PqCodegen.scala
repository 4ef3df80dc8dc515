package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/**
 * Compact codegen kernels for the PQ family.
 *
 * Why they exist: the declarative formulations — `greatest` over m·k
 * per-centroid score structs for encoding, and an m-term nested
 * `element_at` addition chain for the ADC distance — are correct but
 * UNROLL into the generated Java. At the q113/q114/q122 config
 * (m=16, k=16) the fused encode+ADC stage emits a >10,000-line
 * `processNext()` that janino fails to compile; the failure is not
 * cached, so EVERY execution of the plan re-paid a multi-second
 * compile attempt on the driver before falling back to interpreted
 * eval (measured: the whole pq_adc digest branch floor sat at ~3.4 s
 * warm, dominated by exactly this). These expressions generate
 * fixed-size LOOPS over a broadcast-referenced model array instead —
 * a few dozen lines of Java regardless of m·k — so the stage stays
 * inside whole-stage codegen.
 *
 * Bit-parity contract (PqParitySpec asserts both, eval ≡ codegen and
 * new ≡ unrolled formulation):
 *  - encode scores are `graft_dot(sub, centroid) − Σc²/2` with the
 *    same left-to-right fold and the same Scala-side constant fold
 *    for the half-norm; the argmax scans centroids in ascending id
 *    with a strictly-greater replacement under Spark's double
 *    ordering (`x == y → equal` so −0.0 ≡ 0.0, NaN greatest) —
 *    exactly `greatest(struct(score, −id)…)`'s tie-to-earliest.
 *  - a NULL input vector encodes to the all-zero code word (the
 *    `greatest` chain yields centroid 0 per subspace when every
 *    score is null), so the expression is non-nullable, like the
 *    `array(...)` it replaces.
 *  - ADC accumulates `tables(j)(codes(j))` left-to-right, never
 *    reassociated — the composite-oracle replay depends on it.
 */
case class PqEncodeCodes(left: Expression, right: Expression)
    extends BinaryExpression {

  /** left = vector column; right = foldable codebooks literal
    * `array<array<array<double>>>` (subspace → code → centroid). */
  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cbOk = right.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false
    }
    if (!vecOk || !cbOk) TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<array<array<double>>>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if (!right.foldable) TypeCheckResult.TypeCheckFailure(
      s"$prettyName codebooks must be a literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_pq_encode"

  /** Codebooks as primitive arrays, extracted once from the literal. */
  @transient private lazy val cb: Array[Array[Array[Double]]] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val out = Array.tabulate(arr.numElements()) { j =>
      val book = arr.getArray(j)
      Array.tabulate(book.numElements()) { c =>
        book.getArray(c).toDoubleArray()
      }
    }
    require(out.nonEmpty && out.forall(_.nonEmpty),
      s"$prettyName: empty codebooks")
    val sd = out(0)(0).length
    require(out.forall(_.forall(_.length == sd)),
      s"$prettyName: ragged codebook centroid lengths")
    out
  }
  @transient private lazy val subDim: Int = cb(0)(0).length
  /** `Σc²/2` per centroid, the same Scala fold the unrolled
    * formulation folded into its literal — bit-identical constants. */
  @transient private lazy val half: Array[Array[Double]] =
    cb.map(_.map(c => c.map(x => x * x).sum / 2))

  private def encodeVec(v: ArrayData): ArrayData = {
    val m = cb.length
    val out = new Array[Int](m)
    if (v != null) {
      val len = v.numElements()
      var j = 0
      while (j < m) {
        val off = j * subDim
        val book = cb(j)
        val halves = half(j)
        var bestS = 0.0
        var bestC = -1
        var c = 0
        while (c < book.length) {
          val cent = book(c)
          var s = 0.0
          val n = math.min(cent.length, math.max(0, len - off))
          var i = 0
          while (i < n) {
            if (!v.isNullAt(off + i)) s += v.getDouble(off + i) * cent(i)
            i += 1
          }
          s -= halves(c)
          // Spark double ordering: == first (−0.0 ≡ 0.0), else IEEE
          // total order (NaN greatest); strict > keeps the earliest
          // centroid on ties, like greatest(struct(s, −c)…)
          if (bestC < 0 ||
              (if (s == bestS) 0 else java.lang.Double.compare(s, bestS)) > 0) {
            bestS = s; bestC = c
          }
          c += 1
        }
        out(j) = bestC
        j += 1
      }
    }
    // null vector: every subspace score is null, greatest ties to
    // centroid 0 — the zero-initialized array already says that
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    encodeVec(if (v == null) null else v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = left.genCode(ctx)
    val self = ctx.addReferenceObj("pqEncode", this,
      classOf[PqEncodeCodes].getName)
    val v = ctx.freshName("pqVec")
    val code = code"""
      ${childGen.code}
      org.apache.spark.sql.catalyst.util.ArrayData $v =
        ${childGen.isNull} ? null : ${childGen.value};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        $self.encodeForCodegen($v);
    """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  /** Public bridge for generated code (the per-row loop itself is a
    * single JIT-friendly JVM method; keeping it here rather than
    * inlining into janino source keeps the generated class tiny AND
    * lets C2 optimize the hot loop). */
  def encodeForCodegen(v: ArrayData): ArrayData = encodeVec(v)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeCodes =
    copy(left = newLeft, right = newRight)
}

object PqEncodeCodes {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PqEncodeCodes].getName, "graft_pq_encode")
}

/**
 * ADC distance: `Σ_j tables(j)(codes(j))`, accumulated left-to-right.
 * Null child → null; a null code or table row or cell → null (the
 * `element_at` chain's propagation); an out-of-range code errors like
 * the ANSI `element_at` it replaces.
 */
case class PqAdcDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val tOk = left.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    val cOk = right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (tOk && cOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<array<double>>, array<int>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc_dist"

  /** Null also arises from null ELEMENTS (a null code, table row, or
    * cell), not just null children — without this the planner elides
    * the null check when both inputs are non-null literals. */
  override def nullable: Boolean = left.nullable || right.nullable || {
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(_, cellNull), rowNull), ArrayType(_, codeNull)) =>
        cellNull || rowNull || codeNull
      case _ => true
    }
  }

  override protected def nullSafeEval(t: Any, c: Any): Any = {
    val tables = t.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (tables.numElements() < m)
      throw new IllegalArgumentException(
        s"$prettyName: ${tables.numElements()} distance tables for $m codes")
    var s = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j) || tables.isNullAt(j)) return null
      val row = tables.getArray(j)
      val ci = codes.getInt(j)
      if (ci < 0 || ci >= row.numElements())
        throw new IllegalArgumentException(
          s"$prettyName: code $ci out of range for a ${row.numElements()}-entry table")
      if (row.isNullAt(ci)) return null
      s += row.getDouble(ci)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) => {
      val m = ctx.freshName("m"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val row = ctx.freshName("row")
      val ci = ctx.freshName("ci")
      s"""
         |int $m = $c.numElements();
         |if ($t.numElements() < $m)
         |  throw new IllegalArgumentException(
         |    "graft_adc_dist: " + $t.numElements() + " distance tables for " + $m + " codes");
         |double $s = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  if ($c.isNullAt($j) || $t.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $t.getArray($j);
         |  int $ci = $c.getInt($j);
         |  if ($ci < 0 || $ci >= $row.numElements())
         |    throw new IllegalArgumentException(
         |      "graft_adc_dist: code " + $ci + " out of range for a " + $row.numElements() + "-entry table");
         |  if ($row.isNullAt($ci)) { ${ev.isNull} = true; break; }
         |  $s += $row.getDouble($ci);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDist =
    copy(left = newLeft, right = newRight)
}

object PqAdcDist {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PqAdcDist].getName, "graft_adc_dist")
}

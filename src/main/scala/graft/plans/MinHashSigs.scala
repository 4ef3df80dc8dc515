package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * All-k MinHash signature of one row's shingle set in a single pass —
 * `sig(i) = min over shingles of ((x·a_i + b_i) mod (2⁶¹−1))`.
 *
 * Why an expression: a signature is a PER-ROW function of the row's
 * shingle set, but the aggregate formulation (explode → groupBy(doc) →
 * k `min` columns — kept as `Dedup.minHashSignaturesAgg`, the
 * reference semantics this kernel is spec-tested against) pays an
 * exploded row per shingle, k aggregate buffers per doc, and a full
 * EXCHANGE keyed on doc id. At 100 TB that shuffle is the signature
 * stage's entire cost; this kernel keeps the narrow one-pass shape —
 * scan → project — with zero shuffle and zero row amplification.
 *
 * Inputs: `left` is either the pre-hashed shingle set (`array<bigint>`,
 * e.g. `graft_shingle_hashes` output — any caller-chosen base hash) or
 * the raw shingle strings (`array<string>`), in which case the kernel
 * applies the SQL-portable md5 base hash — bit-identical to
 * `conv(substring(md5(cast(s as binary)), 1, 15), 16, 10)` (the first
 * 60 bits of the digest), the form the driver's DuckDB oracle replays.
 * Either way each element is folded to `x = pmod(h, 2³¹−1)` first, so
 * the `x·a + b` products stay inside the 2⁶³ budget. `right` is the
 * foldable `[[a_i, b_i], …]` parameter schedule.
 *
 * Null elements are skipped (they hash to null and `min` ignores
 * null); a null or effectively-empty set yields NULL — callers drop
 * those rows, matching the aggregate formulation where a doc with no
 * shingles simply has no group.
 */
case class MinHashSigs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val elemOk = left.dataType match {
      case ArrayType(LongType, _) | ArrayType(StringType, _) => true
      case _ => false
    }
    val paramOk = right.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => true
      case _ => false
    }
    if (!elemOk || !paramOk) TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>|array<string>, " +
        s"array<array<bigint>>), got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString})")
    else if (!right.foldable) TypeCheckResult.TypeCheckFailure(
      s"$prettyName params must be a literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  private val Mod: Long = Int.MaxValue.toLong // 2^31 - 1
  private val P: Long = (1L << 61) - 1

  @transient private lazy val isStringInput: Boolean = left.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  @transient private lazy val (as: Array[Long], bs: Array[Long]) = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val k = arr.numElements()
    require(k > 0, s"$prettyName: empty parameter schedule")
    val a = new Array[Long](k); val b = new Array[Long](k)
    var i = 0
    while (i < k) {
      val pair = arr.getArray(i)
      require(pair != null && pair.numElements() == 2,
        s"$prettyName: parameter $i is not an [a, b] pair")
      a(i) = pair.getLong(0); b(i) = pair.getLong(1)
      i += 1
    }
    (a, b)
  }

  @transient private lazy val tlMd5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** First 60 bits of md5(utf8 bytes), then pmod 2³¹−1 — bit-identical
    * to `pmod(conv(substring(md5(s), 1, 15), 16, 10), 2147483647)`. */
  private def md5X(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = tlMd5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v >>> 4) % Mod // non-negative, plain % ≡ pmod
  }

  private def pmod(h: Long, m: Long): Long = {
    val r = h % m
    if (r < 0) r + m else r
  }

  def computeForCodegen(arr: ArrayData): ArrayData = {
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x =
          if (isStringInput) md5X(arr.getUTF8String(i))
          else pmod(arr.getLong(i), Mod)
        any = true
        var j = 0
        while (j < k) {
          val t = x * as(j) + bs(j) // x < 2³¹, a < 2³¹, b < 2⁶¹ — no overflow
          val m = { val r = t % P; if (r < 0) r + P else r }
          if (m < mins(j)) mins(j) = m
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def nullSafeEval(e: Any, p: Any): Any =
    computeForCodegen(e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhash", this, classOf[MinHashSigs].getName)
    nullSafeCodeGen(ctx, ev, (e, _) => {
      val res = ctx.freshName("mhRes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  $self.computeForCodegen($e);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSigs =
    copy(left = newLeft, right = newRight)
}

object MinHashSigs {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashSigs].getName, "graft_minhash")
}

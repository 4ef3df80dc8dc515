package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * SQL-portable 60-bit content hash kernel: the first 15 hex digits of
 * the md5 digest as a non-negative long — bit-identical to
 * `conv(substring(md5(cast(c as binary)), 1, 15), 16, 10)` (the
 * [[graft.operators.Dedup.md5Hash60]] oracle basis; DuckDB replays the
 * same hex-prefix fold).
 *
 * The declarative chain materializes a 32-char hex string per value,
 * substrings it, and re-parses 15 hex chars back to a long — three
 * allocations and a char-wise parse on the hot hash of every
 * driver-oracled dedup/fingerprint query. This kernel reads the first
 * 60 bits straight off the digest: big-endian u64 of bytes 0–7,
 * shifted right 4.
 */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary or string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_md5h60"

  @transient private lazy val isString = child.dataType == StringType

  override protected def nullSafeEval(v: Any): Any =
    if (isString) Md5Hash60.computeUtf8(v.asInstanceOf[UTF8String])
    else Md5Hash60.computeBytes(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isString) "computeUtf8" else "computeBytes"
    defineCodeGen(ctx, ev, v => s"graft.plans.Md5Hash60.$fn($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Md5Hash60].getName, "graft_md5h60")

  private val tlMd5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def computeBytes(b: Array[Byte]): Long = {
    val md = tlMd5.get()
    md.reset()
    val d = md.digest(b)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4 // first 60 bits, non-negative
  }

  def computeUtf8(s: UTF8String): Long = computeBytes(s.getBytes)
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused shingle-set kernel: from a token array, the ASCENDING-SORTED,
 * DISTINCT xxhash64 values of all space-joined `n`-gram shingles — in
 * one pass, one output allocation.
 *
 * Why: the declarative formulation
 * `array_sort(transform(array_distinct(zip_with-chain), xxhash64))`
 * walks the token array through four interpreted higher-order functions,
 * allocating an intermediate array at every step and paying a boxed
 * lambda call per element — it was the dominant cost of every
 * set-similarity query (q34/q35/q36/q39 all start here). This kernel
 * emits the same sorted hash set with a single primitive `long[]` and
 * `Arrays.sort`, and is semantically identical (element hashing uses
 * Spark's own XXH64 with the builtin's seed 42, so
 * `xxhash64('a b') = graft_shingle_hashes(['a','b'], 2)[0]` exactly;
 * distinct-by-string equals distinct-by-hash absent 64-bit collisions,
 * which would anyway only perturb a set size by one).
 *
 * `n` must be a foldable positive int. Tokens shorter than `n` yield an
 * empty array (matching the null-padded `zip_with` chain's filter).
 */
case class SortedShingleHashes(left: Expression, right: Expression)
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

  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(toks: Any, n: Any): Any =
    SortedShingleHashes.compute(toks.asInstanceOf[ArrayData],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.SortedShingleHashes.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedShingleHashes =
    copy(left = newLeft, right = newRight)
}

object SortedShingleHashes {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SortedShingleHashes].getName, "graft_shingle_hashes")

  private val SEP = UTF8String.fromString(" ")

  /** Shared kernel for the interpreted and generated paths. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (n < 1 || len < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](len - n + 1)
    // grams containing a null token are dropped (fewer hashes out), the
    // exact semantics of the declarative zip_with chain whose
    // filter(isNotNull) removes null-bearing grams — the input type
    // admits ArrayType(String, containsNull=true)
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
    java.util.Arrays.sort(out, 0, filled)
    var w = 0; var r = 0; var prev = 0L
    while (r < filled) {
      val v = out(r)
      if (w == 0 || v != prev) { out(w) = v; prev = v; w += 1 }
      r += 1
    }
    new GenericArrayData(
      if (w == out.length) out else java.util.Arrays.copyOf(out, w))
  }
}

package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/**
 * Bounded KMV state: the `k` smallest DISTINCT hash values seen so far.
 * A TreeSet gives O(log k) insert/evict and O(1) access to the current
 * k-th minimum (`last`), and distinctness for free — duplicate hashes
 * must not occupy two of the k slots or the estimator reads low.
 */
final class KmvState(val k: Int) {
  private[plans] val mins = new java.util.TreeSet[java.lang.Long]()

  def insert(h: Long): Unit = {
    if (mins.size < k) { mins.add(h); () }
    else if (h < mins.last()) {
      if (mins.add(h)) { mins.remove(mins.last()); () }
    }
  }

  def merge(other: KmvState): Unit = {
    val it = other.mins.iterator()
    while (it.hasNext) insert(it.next())
  }
}

/**
 * `graft_kmv(hash60, k)` — k-minimum-values distinct-count sketch
 * (Bar-Yossef et al. 2002) as a mergeable partial aggregate: each map
 * task forwards at most `k` longs per group, so a 100 TB distinct-count
 * costs one bounded-payload exchange, like HLL++.
 *
 * Unlike HLL++ the whole estimate is REPLAYABLE by an external SQL
 * engine: the state is the k smallest distinct values of an md5-derived
 * 60-bit hash ([[graft.operators.Dedup.md5Hash60]]), and the estimator
 * is plain arithmetic over them —
 *
 *   d < k  →  d                      (sketch not full: exact)
 *   else   →  floor((k-1) · 2^60 / h_k)   (h_k = k-th smallest hash)
 *
 * which any engine reproduces with a window min-k + one double divide
 * (the driver oracle does exactly that). Standard error ≈ 1/sqrt(k-2).
 * The hash is taken as an INPUT column rather than computed in here so
 * the oracle and the engine share one hash definition.
 *
 * Estimate-only accuracy caveat: distinct hashes undercount true
 * distincts by birthday collisions in [0, 2^60) — negligible below
 * ~10^8 distincts per group and inherent to the sketch's contract.
 */
case class KmvSketch(
    left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] with BinaryLike[Expression] {

  private def hash = left

  private lazy val k: Int = right.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = {
    if (hash.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: hash must be bigint, got ${hash.dataType.simpleString}")
    else if (!right.foldable || right.dataType != IntegerType ||
      right.eval() == null || right.eval().asInstanceOf[Number].intValue() < 2)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: k must be an int literal >= 2")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = false

  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buf: KmvState, input: InternalRow): KmvState = {
    val h = hash.eval(input)
    if (h != null) buf.insert(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvState, other: KmvState): KmvState = {
    buf.merge(other); buf
  }

  override def eval(buf: KmvState): Any = {
    val d = buf.mins.size
    if (d < k) d.toLong
    else {
      val hk = buf.mins.last().longValue()
      // h_k = 0 needs k distinct hashes <= 0, impossible for k >= 2 on
      // non-negative hashes — but guard the divide anyway
      if (hk <= 0L) d.toLong
      else math.floor((k - 1).toDouble * 1152921504606846976.0 /* 2^60 */
        / hk.toDouble).toLong
    }
  }

  override def serialize(buf: KmvState): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.mins.size * 8)
    bb.putInt(buf.k).putInt(buf.mins.size)
    val it = buf.mins.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = ByteBuffer.wrap(bytes)
    val state = new KmvState(bb.getInt())
    val n = bb.getInt()
    (0 until n).foreach(_ => state.insert(bb.getLong()))
    state
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KmvSketch =
    copy(left = l, right = r)
}

object KmvSketch {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[KmvSketch].getName, "graft_kmv")
}

package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded top-k state: at most `k` (score, id) pairs, ordered best-first
 * by (score desc, id asc). The priority queue keeps the WORST element at
 * its head so an incoming candidate evicts in O(log k).
 */
final class TopKState(val k: Int) {
  // "worse ranks greater": lower score first; among equal scores the
  // larger id is worse (ties resolve to the smaller id, matching the
  // window formulation's ORDER BY cosine DESC, neighbor_id ASC)
  private val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  private[plans] val pq = mutable.PriorityQueue.empty(worstFirst)

  def insert(score: Double, id: Long): Unit = {
    if (pq.size < k) pq.enqueue((score, id))
    else if (worstFirst.compare((score, id), pq.head) < 0) {
      pq.dequeue(); pq.enqueue((score, id))
    }
  }

  def merge(other: TopKState): Unit =
    other.pq.foreach { case (s, i) => insert(s, i) }

  /** Best-first (score desc, id asc). */
  def sorted: Array[(Double, Long)] = pq.dequeueAll.reverse.toArray
}

/**
 * `graft_topk(score, id, k)` — mergeable bounded top-k aggregate:
 * `array<struct<score double, id bigint>>`, best `k` rows by
 * (score desc, id asc).
 *
 * Why it exists: the window formulation of per-query top-k
 * (`row_number() OVER (PARTITION BY query_id ORDER BY score DESC)`)
 * shuffles EVERY scored row to the query's reducer — for kNN that is
 * |corpus| × |queries| rows through the exchange. As a partial-merge
 * aggregate, each map task forwards at most k pairs per query
 * (16 bytes each), so the shuffle volume drops from the full scored
 * cross product to k·|queries|·nPartitions — the shape that survives a
 * 100× corpus. Exact same result as the window: ties break on the
 * smaller id, deterministically.
 */
case class TopKByScore(
    first: Expression, second: Expression, third: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] with TernaryLike[Expression] {

  private def score = first
  private def id = second

  private lazy val k: Int = third.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: score must be double, got ${score.dataType.simpleString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: id must be bigint, got ${id.dataType.simpleString}")
    else if (!third.foldable || third.dataType != IntegerType ||
      third.eval() == null || third.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: k must be a positive int literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buf: TopKState, input: InternalRow): TopKState = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKState, other: TopKState): TopKState = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKState): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKState): Array[Byte] = {
    val rows = buf.sorted
    val bb = ByteBuffer.allocate(8 + rows.length * 16)
    bb.putInt(buf.k).putInt(rows.length)
    rows.foreach { case (s, i) => bb.putDouble(s).putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = ByteBuffer.wrap(bytes)
    val state = new TopKState(bb.getInt())
    val n = bb.getInt()
    (0 until n).foreach(_ => state.insert(bb.getDouble(), bb.getLong()))
    state
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): TopKByScore =
    copy(first = f, second = s, third = t)
}

object TopKByScore {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TopKByScore].getName, "graft_topk")
}

package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k (score, id) pairs per group — a custom
  * `TypedImperativeAggregate` (the optional extension SURVEY.md §7.4
  * anticipates for similarity top-k).
  *
  * Why not a window? `row_number() OVER (PARTITION BY g ORDER BY score)`
  * materializes and SORTS every group's candidate set before discarding
  * all but k — O(n log n) per group and full candidate shuffle. This
  * aggregate keeps a k-bounded min-heap per group: O(n log k) work,
  * O(k) state, and it composes with partial aggregation — each map task
  * sends at most k pairs per group into the shuffle, so exchanged bytes
  * are O(groups × k) regardless of candidate count. That asymmetry is
  * the difference between "works" and "works at 100 TB" for per-group
  * neighbor selection.
  *
  * Deterministic total order: (score DESC, id ASC) — ties on score keep
  * the smaller id; result is the sorted array of `struct<score, id>`.
  * Scores compare via `java.lang.Double.compare`, a TOTAL order that
  * ranks NaN greatest — matching how both Spark and DuckDB place NaN
  * first under ORDER BY score DESC (a primitive `>` comparator is
  * non-total under NaN: it would silently drop NaN entries from a full
  * heap and can make the final sort throw).
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"graft_topk: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType | FloatType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk expects (double/float score, long/int id), got ($s, $i)")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_topk"

  // total (score DESC, id ASC) precedence: true when `a` ranks before `b`.
  // `+ 0.0` collapses -0.0 to +0.0 first (NaN passes through): engine
  // ORDER BY treats signed zeros as EQUAL and falls to the id tie-break,
  // while a raw Double.compare would let the sign decide — a latent
  // divergence from the window-formulation oracles this aggregate twins
  private def ranksBefore(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1 + 0.0, b._1 + 0.0)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  // "worst-first" ordering: head of the queue is the entry to evict —
  // last in rank order (lowest score / NaN-aware, largest id on ties)
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.fromLessThan[(Double, Long)](ranksBefore)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
                    e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      val score = s match {
        case f: java.lang.Float => f.toDouble
        case d: java.lang.Double => d.doubleValue()
        case o => o.asInstanceOf[Number].doubleValue()
      }
      val id = i.asInstanceOf[Number].longValue()
      offer(buf, (score, id))
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)])
      : mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortWith(ranksBefore)
    new GenericArrayData(sorted.map(t => InternalRow(t._1, t._2)))
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getDouble, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

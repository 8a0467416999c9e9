package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary — the mergeable-sketch engine
  * behind a ClickHouse-`topK`-style heavy-hitters query. Keeps at most
  * `k` (item → counter) entries per group; the classic stream update
  * decrements ALL counters when a new item arrives at capacity, and the
  * merge (Agarwal et al., "Mergeable Summaries") adds counters then
  * subtracts the (k+1)-th largest so at most k survive. Both operations
  * preserve the guarantee that matters:
  *
  *   any item with true count > n / (k+1) is IN the summary,
  *
  * regardless of input order, partial/merge tree shape, or partition
  * layout. The summary's counters and its extra (sub-threshold) members
  * ARE order-dependent — so [[eval]] exposes only the candidate id set,
  * and the consuming query re-counts candidates EXACTLY and filters on
  * the threshold, making the end-to-end answer deterministic and
  * oracle-checkable while the sketch does the scale work: O(k) state per
  * task, O(k·tasks) shuffled bytes, where an exact group-by would
  * shuffle every distinct item.
  *
  * Items may be integral (int/long, normalized to long) or strings (the
  * dashboard "top symbols" shape); the result element type follows the
  * input. Null inputs are ignored (SQL aggregate convention). Internal
  * keys are boxed in a k-bounded map — the capacity work is O(k) either
  * way, so the generic map costs nothing the sketch's own decrement
  * pass doesn't already pay.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    withCounts: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  require(k > 0, s"graft_mg: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_mg expects a long/int/string item, got $t")
    }

  private def isString: Boolean = child.dataType == StringType

  /** Result element type: strings stay strings, integrals normalize to
    * long. */
  private def idType: DataType = if (isString) StringType else LongType

  /** `graft_mg`: candidate ids only (see class doc). `graft_mg_pairs`
    * (`withCounts`): (id, cnt) structs — the MERGEABLE partial form for
    * sketch stores that keep merging across batches; counters are
    * lower bounds with order-dependent noise ≤ n/(k+1), so this form is
    * for state, not for directly-compared results. */
  override def dataType: DataType =
    if (withCounts)
      ArrayType(StructType(Seq(
        StructField("id", idType, nullable = false),
        StructField("cnt", LongType, nullable = false))),
        containsNull = false)
    else ArrayType(idType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String =
    if (withCounts) "graft_mg_pairs" else "graft_mg"

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty[Any, Long]

  /** The one MG reduction both paths share: subtract `amount` from every
    * counter, drop the non-positive — update's decrement-all and merge's
    * cut-subtraction must stay in lockstep or the two error accountings
    * silently diverge. */
  private def subtractAndPrune(buf: mutable.HashMap[Any, Long],
                               amount: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[Any]
    buf.mapValuesInPlace((_, c) => c - amount)
    buf.foreach { case (i, c) => if (c <= 0L) dead += i }
    dead.foreach(buf.remove)
  }

  override def update(buf: mutable.HashMap[Any, Long],
                      input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item: Any = v match {
        // UTF8String may be a reused buffer view — copy to an immutable
        // key; integrals normalize so int and long inputs summarize alike
        case s: UTF8String => s.toString
        case n: Number => n.longValue()
        case other => other
      }
      if (buf.contains(item)) buf(item) += 1L
      else if (buf.size < k) buf(item) = 1L
      else
        // decrement-all: drains one "vote" from every tracked item in
        // lieu of tracking the newcomer — O(k), amortized O(1)/item
        // since each stored vote is drained at most once
        subtractAndPrune(buf, 1L)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Any, Long],
                     other: mutable.HashMap[Any, Long])
      : mutable.HashMap[Any, Long] = {
    other.foreach { case (i, c) => buf(i) = buf.getOrElse(i, 0L) + c }
    if (buf.size > k)
      // subtract the (k+1)-th largest counter from everything — the
      // mergeable-summaries reduction: ≤ k survive, total error across
      // any merge tree stays ≤ n/(k+1)
      subtractAndPrune(buf,
        buf.values.toArray.sorted(Ordering[Long].reverse).apply(k))
    buf
  }

  /** Candidate ids ascending; with `withCounts`, (id, cnt) structs in
    * the same id order. Entries sort ONCE as (key, cnt) pairs, with one
    * UTF8String conversion per string key at emission. */
  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val entries: Array[(Any, Long)] =
      if (isString)
        buf.toArray.map { case (i, c) => (i.asInstanceOf[String], c) }
          .sortBy(_._1)
          .map { case (s, c) => (UTF8String.fromString(s): Any, c) }
      else
        buf.toArray.map { case (i, c) => (i.asInstanceOf[Long], c) }
          .sortBy(_._1)
          .map { case (i, c) => (i: Any, c) }
    if (withCounts)
      new GenericArrayData(entries.map { case (id, c) =>
        InternalRow(id, c).asInstanceOf[Any]
      })
    else new GenericArrayData(entries.map(_._1))
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] =
    if (isString) {
      val entries = buf.toArray.map { case (i, c) =>
        (i.asInstanceOf[String].getBytes(StandardCharsets.UTF_8), c)
      }
      val bb = ByteBuffer.allocate(
        4 + entries.map(e => 4 + e._1.length + 8).sum)
      bb.putInt(entries.length)
      entries.foreach { case (bytes, c) =>
        bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
      }
      bb.array()
    } else {
      val bb = ByteBuffer.allocate(4 + buf.size * 16)
      bb.putInt(buf.size)
      buf.foreach { case (i, c) =>
        bb.putLong(i.asInstanceOf[Long]); bb.putLong(c)
      }
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    if (isString) (0 until n).foreach { _ =>
      val len = bb.getInt
      val strBytes = new Array[Byte](len)
      bb.get(strBytes)
      buf(new String(strBytes, StandardCharsets.UTF_8)) = bb.getLong
    }
    else (0 until n).foreach(_ => buf(bb.getLong) = bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren(0))
}

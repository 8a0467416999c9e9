package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise sum of `array<long>` columns per group — a custom
  * `TypedImperativeAggregate` for vector-shaped integer accumulation
  * (simhash bit votes, per-dimension counters, histogram merges).
  *
  * Why not explode? The built-in route is
  * `posexplode → groupBy(key, pos) → sum → groupBy(key) → collect+sort` —
  * it multiplies the row count by the vector width (32× for simhash),
  * pays TWO shuffles, and the second one re-sorts every group's positions.
  * This aggregate keeps one `Array[Long]` per group: O(width) state,
  * single shuffle, and it composes with partial aggregation — each map
  * task contributes one width-length vector per group to the exchange
  * regardless of input rows. Long arithmetic is exact, so unlike a
  * double vector-sum the result is association-order independent and
  * safely oracle-comparable.
  *
  * Width is taken from the first non-null input; mismatched widths throw
  * (vector width is a schema-level invariant of the caller). The buffer
  * tracks "has any input arrived" separately from the width-0 vector, so
  * a group of empty arrays sums to an empty array (not NULL) and an
  * empty-vs-nonempty mix still trips the width check.
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorSum.Buf] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_sum expects array<long>/array<int>, got $t")
  }

  private lazy val elemType = child.dataType match {
    case ArrayType(et, _) => et
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_vec_sum"

  /** `v == null` until the first non-null input fixes the width. */
  override def createAggregationBuffer(): VectorSum.Buf =
    new VectorSum.Buf(null)

  private def add(buf: VectorSum.Buf, arr: ArrayData): VectorSum.Buf = {
    val n = arr.numElements()
    if (buf.v == null) buf.v = new Array[Long](n)
    else require(buf.v.length == n,
      s"graft_vec_sum: vector width mismatch (${buf.v.length} vs $n)")
    val target = buf.v
    var i = 0
    elemType match {
      case LongType =>
        while (i < n) {
          if (!arr.isNullAt(i)) target(i) += arr.getLong(i)
          i += 1
        }
      case IntegerType =>
        while (i < n) {
          if (!arr.isNullAt(i)) target(i) += arr.getInt(i)
          i += 1
        }
    }
    buf
  }

  override def update(buf: VectorSum.Buf, input: InternalRow): VectorSum.Buf = {
    val v = child.eval(input)
    if (v == null) buf else add(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: VectorSum.Buf,
                     other: VectorSum.Buf): VectorSum.Buf =
    if (other.v == null) buf
    else if (buf.v == null) { buf.v = other.v; buf }
    else {
      require(buf.v.length == other.v.length,
        s"graft_vec_sum: vector width mismatch (${buf.v.length} vs ${other.v.length})")
      var i = 0
      while (i < buf.v.length) { buf.v(i) += other.v(i); i += 1 }
      buf
    }

  /** Null (SQL aggregate-over-no-rows convention) when no input arrived;
    * an empty array when inputs arrived and were width-0. */
  override def eval(buf: VectorSum.Buf): Any =
    if (buf.v == null) null else new GenericArrayData(buf.v)

  override def serialize(buf: VectorSum.Buf): Array[Byte] = {
    if (buf.v == null) Array(0: Byte)
    else {
      val bb = ByteBuffer.allocate(1 + 4 + buf.v.length * 8)
      bb.put(1: Byte)
      bb.putInt(buf.v.length)
      buf.v.foreach(bb.putLong)
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): VectorSum.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    if (bb.get() == 0) new VectorSum.Buf(null)
    else {
      val n = bb.getInt
      val v = new Array[Long](n)
      var i = 0
      while (i < n) { v(i) = bb.getLong; i += 1 }
      new VectorSum.Buf(v)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSum =
    copy(child = newChildren(0))
}

object VectorSum {
  /** Aggregation state: `v == null` ⇔ no non-null input yet (distinct
    * from a width-0 vector, which is a legitimate sum). */
  final class Buf(var v: Array[Long])
}

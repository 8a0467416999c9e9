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
  * (vector width is a schema-level invariant of the caller).
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

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

  /** Empty sentinel until the first non-null input fixes the width. */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def add(buf: Array[Long], arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val target =
      if (buf.length == 0) new Array[Long](n)
      else {
        require(buf.length == n,
          s"graft_vec_sum: vector width mismatch (${buf.length} vs $n)")
        buf
      }
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
    target
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else add(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other.length == 0) buf
    else if (buf.length == 0) other
    else {
      require(buf.length == other.length,
        s"graft_vec_sum: vector width mismatch (${buf.length} vs ${other.length})")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

  /** Null (SQL aggregate-over-no-rows convention) when no input arrived. */
  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSum =
    copy(child = newChildren(0))
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Shared bit math for the engine's Bloom filter pair
  * ([[BloomAggregate]] builds, [[BloomMightContain]] probes).
  *
  * Wire format (the aggregate's eval output AND its shuffle
  * serialization — one format, so a persisted filter is probe-able
  * as-is): `[int32 k][int64 mBits][mBits/64 × int64 words]`,
  * big-endian (ByteBuffer default). Probes read k and m from the
  * header, so filter sizing is a build-time decision invisible to
  * consumers.
  *
  * Hashing: the input is already a 64-bit hash (the engine feeds
  * `xxhash64(...)` columns), so the k probe positions come from
  * Kirsch–Mitzenmacher double hashing — `bit_i = (h1 + i·h2) mod m`
  * with h1/h2 two independent splitmix64 finalizer mixes of the input.
  * Deterministic across JVMs and partition orders (no seeds from
  * time/random), which keeps every query over it replayable.
  */
object GraftBloom {

  private final val Golden = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer (Steele et al., "Fast splittable pseudorandom
    * number generators", public domain constants) — full-avalanche
    * 64→64 mix. */
  def mix(v0: Long): Long = {
    var v = v0 + Golden
    v = (v ^ (v >>> 30)) * 0xbf58476d1ce4e5b9L
    v = (v ^ (v >>> 27)) * 0x94d049bb133111ebL
    v ^ (v >>> 31)
  }

  final val HeaderBytes = 4 + 8

  /** The double-hash bases — one definition shared by build and probe
    * so the two sides cannot drift. */
  def h1(v: Long): Long = mix(v)
  def h2(v: Long): Long = mix(v + Golden) | 1L

  // manual big-endian reads: ByteBuffer.wrap would allocate a
  // HeapByteBuffer per PROBE — per row of a corpus-sized filter scan
  private def readInt(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private def readLong(b: Array[Byte], o: Int): Long =
    (readInt(b, o).toLong << 32) | (readInt(b, o + 4).toLong & 0xffffffffL)

  /** Probe: true when every one of the k bit positions for `v` is set.
    * Called from both interpreted eval and generated code; allocation-
    * free. */
  def contains(bloom: Array[Byte], v: Long): Boolean = {
    val k = readInt(bloom, 0)
    val m = readLong(bloom, 4)
    val a = h1(v)
    val b = h2(v)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(a + i * b, m)
      val word = readLong(bloom, HeaderBytes + 8 * (bit >>> 6).toInt)
      if ((word & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

}

/** `graft_bloom_agg(hash, mBits, k)` — build a Bloom filter over a
  * 64-bit hash column as a `binary` value.
  *
  * Why an aggregate and not `DataFrameStatFunctions.bloomFilter`: the
  * stat helper collects the filter to the DRIVER and hands back a
  * sketch object — unusable inside a plan without a UDF (banned by the
  * engine's zero-UDF parity rule, SURVEY §2.8). This aggregate keeps
  * the build distributed (map-side partials of m bits each, merged by
  * bitwise OR — the classic mergeable-sketch shape) and its output is
  * a plan-level value: broadcast it with a 1-row crossJoin and probe
  * with [[BloomMightContain]] inside whole-stage codegen.
  *
  * Sizing is the caller's contract: for n expected distinct keys and
  * target false-positive rate p, m ≈ −n·ln p / (ln 2)² bits and
  * k ≈ (m/n)·ln 2 (k=7 at 10 bits/key ⇒ p ≈ 0.8%). False positives
  * are SAFE in every engine use — the filter only pre-prunes an exact
  * join that removes them — so undersizing degrades performance, never
  * correctness. mBits is capped at 2³¹ (256 MB) — past that a
  * partitioned semi-join beats a broadcast filter anyway.
  */
case class BloomAggregate(
    child: Expression,
    mBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(mBits > 0, s"graft_bloom_agg: mBits must be positive, got $mBits")
  require(numHashes > 0 && numHashes <= 64,
    s"graft_bloom_agg: k must be in [1, 64], got $numHashes")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg expects a long/int hash value, got $t")
    }

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = false

  override def prettyName: String = "graft_bloom_agg"

  private val words = (mBits + 63) >>> 6
  // hash positions are taken mod the FULL padded word capacity so no
  // tail bits are wasted and probe-side m (read from the header) is
  // exactly the modulus used at build time
  private val m: Long = words.toLong * 64L

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Number].longValue()
      val a = GraftBloom.h1(h)
      val b = GraftBloom.h2(h)
      var i = 0
      while (i < numHashes) {
        val bit = java.lang.Long.remainderUnsigned(a + i * b, m)
        buf((bit >>> 6).toInt) |= 1L << (bit & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(GraftBloom.HeaderBytes + 8 * buf.length)
    bb.putInt(numHashes)
    bb.putLong(m)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt; bb.getLong
    val buf = new Array[Long](words)
    var i = 0
    while (i < words) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAggregate =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomAggregate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAggregate =
    copy(child = newChildren.head)
}

/** `graft_bloom_contains(bloom, hash)` — codegen'd membership probe
  * against a [[BloomAggregate]]-built filter. One-sided: `true` means
  * MAYBE present (false-positive rate set at build time), `false`
  * means definitely absent — so it is only ever a pre-filter in front
  * of an exact operator. The k/m parameters ride in the filter's
  * header, so this expression needs no sizing arguments and a
  * persisted filter from a previous run probes identically.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, long), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(bloom: Any, v: Any): Any =
    GraftBloom.contains(bloom.asInstanceOf[Array[Byte]],
      v.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, v) =>
      s"${ev.value} = graft.functions.GraftBloom.contains($b, (long) $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

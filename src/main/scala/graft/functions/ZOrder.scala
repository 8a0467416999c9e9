package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) interleave of two 32-bit dimension buckets into one
  * 64-bit sort key — the multi-dimensional clustering key behind the
  * store's zone-mapped layout ([[graft.store.ZoneMap]]).
  *
  * Sorting rows by `graft_zorder(bucket_a, bucket_b)` places rows close
  * in BOTH dimensions into the same neighborhood of the sort, so a
  * range-partitioned write yields files whose per-file min/max envelopes
  * are narrow in both columns at once — a single-column sort gives
  * perfect envelopes in the leading column and useless ones in every
  * other (the measured gap in ZoneSpec). This is the same trick behind
  * ClickHouse's multi-column ORDER BY granule index and Delta/Iceberg
  * OPTIMIZE ZORDER, expressed as one codegen'd expression.
  *
  * Bit spreading uses the standard mask-shift doubling sequence (public
  * "Bit Twiddling Hacks" / Morton-code construction): each 32-bit input
  * is spread to even bit positions, the second shifted up one, OR'd.
  * Inputs are BUCKETS (non-negative, caller-quantized); negative values
  * are rejected at runtime — a silent mask would interleave garbage. */
case class ZOrder(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two int/long bucket values, got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_zorder"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Number].longValue(),
      b.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder.interleave((long) $a, (long) $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder =
    copy(left = newLeft, right = newRight)
}

object ZOrder {

  /** Spread the low 32 bits of v to the even bit positions of a long. */
  private def spread(v0: Long): Long = {
    var v = v0 & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton code: a's bits at even positions, b's at odd. */
  def interleave(a: Long, b: Long): Long = {
    if (a < 0 || b < 0 || a > 0xffffffffL || b > 0xffffffffL)
      throw new IllegalArgumentException(
        s"graft_zorder: bucket out of [0, 2^32) range: ($a, $b)")
    spread(a) | (spread(b) << 1)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{
  And, EqualTo, Expression, GreaterThan, GreaterThanOrEqual,
  IntegralDivide, LessThan, LessThanOrEqual, Literal, MicrosToTimestamp}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: push timestamp comparisons through the engine's
  * nano-epoch conversion so they reach the parquet scan.
  *
  * The driver corpus stores `events.ts` as TIMESTAMP(NANOS), which the
  * session reads as an epoch-nano long and converts with
  * `timestamp_micros(ts div 1000)` ([[graft.Tables.events]]). A filter
  * written against the CONVERTED column —
  * `timestamp_micros(ts div 1000) >= T` — cannot be pushed into the scan
  * (the datasource only translates predicates on bare columns), so every
  * SQL-path query over the view would full-scan at any scale. The
  * DataFrame builders dodge this by pre-filtering the raw long
  * ([[graft.Tables.events]] `sinceMicros`); this rule closes the gap for
  * everything else by rewriting, inside Filter conditions:
  *
  *   timestamp_micros(x div 1000) >= T  →  x >= micros(T) * 1000
  *   timestamp_micros(x div 1000) >  T  →  x >  micros(T) * 1000 + 999
  *   timestamp_micros(x div 1000) <  T  →  x <  micros(T) * 1000
  *   timestamp_micros(x div 1000) <= T  →  x <= micros(T) * 1000 + 999
  *   timestamp_micros(x div 1000) =  T  →  x BETWEEN micros(T) * 1000
  *                                           AND micros(T) * 1000 + 999
  *
  * (plus the mirrored literal-on-left orientations). Equivalence: for
  * x ≥ 0, `x div 1000` is floor division, so each line is the standard
  * integer-bound shift; for x < 0 (impossible for epochs in the corpus,
  * but kept safe) Spark's `div` truncates toward zero, which agrees with
  * every rewritten comparison as long as micros(T) ≥ 1 — the rule
  * therefore fires only for positive timestamp literals, and only when
  * micros(T)·1000 cannot overflow. Null semantics are preserved: both
  * sides are null exactly when `x` is null.
  */
object NanoTsPushdownRule extends Rule[LogicalPlan] {

  private val MaxSafe = Long.MaxValue / 1000L - 1000L

  /** `x` of `timestamp_micros(x div 1000)`. */
  private def nanoOfMicrosDiv(e: Expression): Option[Expression] = e match {
    case m: MicrosToTimestamp => m.child match {
      case d: IntegralDivide if d.left.dataType == LongType =>
        d.right match {
          case Literal(v: Long, LongType) if v == 1000L => Some(d.left)
          case Literal(v: Int, _) if v == 1000 => Some(d.left)
          case _ => None
        }
      case _ => None
    }
    case _ => None
  }

  private def usOf(l: Literal): Option[Long] = l match {
    case Literal(us: Long, TimestampType) if us >= 1L && us <= MaxSafe =>
      Some(us)
    case _ => None
  }

  /** The micros bucket [us] covers nanos [us·1000, us·1000+999] — EVERY
    * arm's arithmetic reduces to these two bounds, pinned here once. */
  private def nsLo(us: Long): Literal = Literal(us * 1000L, LongType)
  private def nsHi(us: Long): Literal = Literal(us * 1000L + 999L, LongType)

  /** `x BETWEEN us·1000 AND us·1000+999` — null when `x` is null, like
    * the EqualTo it replaces. */
  private def nsRange(x: Expression, us: Long): Expression =
    And(GreaterThanOrEqual(x, nsLo(us)), LessThanOrEqual(x, nsHi(us)))

  /** Rewrite `e cmp l` to `mk(x, us)` when `e` is the nano conversion
    * and `l` a safe timestamp literal; otherwise keep `orig`. */
  private def rw(e: Expression, l: Literal, orig: Expression)(
      mk: (Expression, Long) => Expression): Expression =
    (nanoOfMicrosDiv(e), usOf(l)) match {
      case (Some(x), Some(us)) => mk(x, us)
      case _ => orig
    }

  // every output is normalized to column-on-left; the mirrored
  // orientations flip the comparator (T cmp e  ⟺  e cmp' T), they do
  // NOT flip operand order
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val rewritten = cond.transformUp {
        case c @ EqualTo(e, l: Literal) => rw(e, l, c)(nsRange)
        case c @ EqualTo(l: Literal, e) => rw(e, l, c)(nsRange)
        case c @ GreaterThanOrEqual(e, l: Literal) =>
          rw(e, l, c)((x, us) => GreaterThanOrEqual(x, nsLo(us)))
        case c @ GreaterThan(e, l: Literal) =>
          rw(e, l, c)((x, us) => GreaterThan(x, nsHi(us)))
        case c @ LessThan(e, l: Literal) =>
          rw(e, l, c)((x, us) => LessThan(x, nsLo(us)))
        case c @ LessThanOrEqual(e, l: Literal) =>
          rw(e, l, c)((x, us) => LessThanOrEqual(x, nsHi(us)))
        case c @ GreaterThanOrEqual(l: Literal, e) => // T ≥ e ⟺ e ≤ T
          rw(e, l, c)((x, us) => LessThanOrEqual(x, nsHi(us)))
        case c @ GreaterThan(l: Literal, e) =>        // T > e ⟺ e < T
          rw(e, l, c)((x, us) => LessThan(x, nsLo(us)))
        case c @ LessThan(l: Literal, e) =>           // T < e ⟺ e > T
          rw(e, l, c)((x, us) => GreaterThan(x, nsHi(us)))
        case c @ LessThanOrEqual(l: Literal, e) =>    // T ≤ e ⟺ e ≥ T
          rw(e, l, c)((x, us) => GreaterThanOrEqual(x, nsLo(us)))
      }
      if (rewritten.fastEquals(cond)) f else Filter(rewritten, child)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: derive the `month` partition predicate from a literal
  * `ts` lower bound over the engine's partitioned-store layout
  * (`month = yyyyMM(ts)`, [[graft.store.Store.writeTrades]]).
  *
  * ClickHouse prunes `PARTITION BY toYYYYMM(ts)` partitions directly
  * from a `ts` predicate because it knows the partition expression
  * (reference: sql/V1__create_trades_table.sql:14). Spark's datasource
  * only prunes on predicates naming the partition column itself — a
  * query filtering `ts >= X` over the store would list and stat every
  * month. This rule closes that gap: any Filter whose relation carries
  * BOTH `ts: timestamp` and `month: string` (the store layout contract)
  * and whose condition has a literal `ts` lower bound but no `month`
  * predicate gains `month >= yyyyMM(bound)` — which the file index then
  * uses to skip whole partition directories before the scan.
  *
  * Conservative by construction: fires ONLY on a Filter sitting directly
  * on a file-source relation whose PARTITION schema is `month: string`
  * and whose data schema carries `ts: timestamp` — never on join
  * outputs, views, or other plans that merely happen to expose columns
  * with those names; only for lower bounds (a TTL'd table's dominant
  * pattern); never twice (the added month predicate suppresses
  * re-application). The derived key goes through
  * [[graft.store.Store.monthLowerBound]] — the session-zone key of the
  * bound minus the zone-skew margin — so the added predicate is implied
  * by `month = yyyyMM_W(ts) ∧ ts ≥ X` for ANY zone W the writer used,
  * not just the reading session's: an optimizer rewrite must never turn
  * an unenforceable write-zone assumption into silently dropped rows.
  * Cost of the margin: at most one extra month survives pruning when
  * the bound lands within 27 h after a month boundary.
  *
  * Install at build time via [[GraftExtensions]]
  * (`injectOptimizerRule`) or on a live session with
  * [[GraftFunctions.installRules]] (`spark.experimental.extraOptimizations`).
  */
object MonthPruningRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _))
        if isStoreLayout(fs) =>
      val tsAttr = child.output.find(a =>
        a.name.equalsIgnoreCase("ts") && a.dataType == TimestampType)
      // partition type inference may surface yyyyMM keys as int OR
      // string (readers often re-cast in a Project above); numeric and
      // lexicographic order agree for fixed-width yyyyMM, so both work
      val monthAttr = child.output.find(a =>
        a.name.equalsIgnoreCase("month") &&
          (a.dataType == StringType || a.dataType == IntegerType))
      (tsAttr, monthAttr) match {
        case (Some(ts), Some(month)) if !referencesAttr(cond, month) =>
          tsLowerBoundMicros(cond, ts) match {
            case Some(us) =>
              val key = yyyymm(us)
              val lit = month.dataType match {
                case StringType =>
                  Literal(UTF8String.fromString(key), StringType)
                case _ => Literal(key.toInt, IntegerType)
              }
              Filter(And(cond, GreaterThanOrEqual(month, lit)), child)
            case None => f
          }
        case _ => f
      }
  }

  /** The store layout contract — OPT-IN, not duck-typed: the relation
    * must have been opened with the `graft.monthFromTs` reader option
    * ([[graft.store.Store.readTrades]] sets it), which asserts
    * `month = yyyyMM(ts)` actually holds for this data. A schema-only
    * check (month partition + ts column) would also fire on foreign
    * tables whose `month` derives from a DIFFERENT timestamp — and an
    * optimizer rewrite that guesses the layout turns that guess into
    * silently dropped rows. The shape checks stay as defense in depth. */
  private def isStoreLayout(fs: HadoopFsRelation): Boolean =
    fs.options.get("graft.monthFromTs").contains("true") &&
      fs.partitionSchema.fields.exists(f =>
        f.name.equalsIgnoreCase("month") &&
          (f.dataType == StringType || f.dataType == IntegerType)) &&
      fs.dataSchema.fields.exists(f =>
        f.name.equalsIgnoreCase("ts") && f.dataType == TimestampType)

  private def referencesAttr(e: Expression, a: Attribute): Boolean =
    e.references.contains(a)

  /** Largest literal lower bound on `ts` provable from the condition's
    * top-level conjuncts (timestamp literals are epoch-micros Longs). */
  private def tsLowerBoundMicros(cond: Expression,
                                 ts: Attribute): Option[Long] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val bounds = conjuncts(cond).collect {
      case GreaterThanOrEqual(a: Attribute, Literal(v: Long, TimestampType))
        if a.semanticEquals(ts) => v
      case GreaterThan(a: Attribute, Literal(v: Long, TimestampType))
        if a.semanticEquals(ts) => v
      case EqualTo(a: Attribute, Literal(v: Long, TimestampType))
        if a.semanticEquals(ts) => v
      case EqualTo(Literal(v: Long, TimestampType), a: Attribute)
        if a.semanticEquals(ts) => v
      case LessThanOrEqual(Literal(v: Long, TimestampType), a: Attribute)
        if a.semanticEquals(ts) => v
      case LessThan(Literal(v: Long, TimestampType), a: Attribute)
        if a.semanticEquals(ts) => v
    }
    bounds.maxOption
  }

  /** Writer-zone-safe month lower bound for `ts >= us` (see class doc). */
  private def yyyymm(us: Long): String =
    graft.store.Store.monthLowerBound(
      us, java.time.ZoneId.of(conf.sessionLocalTimeZone))
}

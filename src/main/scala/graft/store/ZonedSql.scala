package graft.store

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

/** SQL surface for the zone-mapped store:
  *
  * {{{
  *   SELECT ... FROM graft_zoned_trades(
  *     '/path/to/store', 'sym_lo', 'sym_hi', 'ts_lo', 'ts_hi')
  * }}}
  *
  * Bounds are inclusive and come in pairs — pass both of a dimension's
  * bounds, or `''` for both to leave that dimension unconstrained;
  * timestamps are ISO-8601 instants (e.g. '2024-01-10T00:00:00Z'). The
  * table function
  * resolves to the SAME plan [[Store.readTradesZoned]] builds — the
  * zone-map file prune runs during ANALYSIS (one small job over the
  * index, the cost every zoned read pays), and the row-level
  * re-application of the bounds rides inside the returned plan, so SQL
  * callers get pruning + correctness with no API change. Registered by
  * [[graft.functions.GraftFunctions.register]] next to `graft_asof` —
  * the engine's rule that a SQL surface ships with whatever plans it.
  */
object ZonedSql {

  val identifier: FunctionIdentifier = FunctionIdentifier("graft_zoned_trades")

  val info: ExpressionInfo = new ExpressionInfo(
    ZoneMap.getClass.getName, "graft_zoned_trades")

  val builder: Seq[Expression] => LogicalPlan = { children =>
    require(children.length == 5,
      "graft_zoned_trades expects (path, sym_lo, sym_hi, ts_lo, ts_hi)," +
        s" got ${children.length} arguments")
    val names = Seq("path", "sym_lo", "sym_hi", "ts_lo", "ts_hi")
    def str(i: Int): String = children(i) match {
      case Literal(s, StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"graft_zoned_trades: ${names(i)} must be a string literal, got $other")
    }
    def opt(i: Int): Option[String] = Some(str(i)).filter(_.nonEmpty)
    def us(i: Int): Option[Long] = opt(i).map { s =>
      try {
        val t = java.time.Instant.parse(s)
        t.getEpochSecond * 1000000L + t.getNano / 1000L
      } catch {
        case e: java.time.format.DateTimeParseException =>
          throw new IllegalArgumentException(
            s"graft_zoned_trades: ${names(i)} must be an ISO-8601 " +
              s"instant like 2024-01-10T00:00:00Z, got '$s'", e)
      }
    }
    val symbols = (opt(1), opt(2)) match {
      case (None, None) => None
      case (Some(lo), Some(hi)) => Some((lo, hi))
      case _ => throw new IllegalArgumentException(
        "graft_zoned_trades: sym_lo and sym_hi must both be set or both ''")
    }
    val ts = (us(3), us(4)) match {
      case (None, None) => None
      case (Some(lo), Some(hi)) => Some((lo, hi))
      case _ => throw new IllegalArgumentException(
        "graft_zoned_trades: ts_lo and ts_hi must both be set or both ''")
    }
    Store.readTradesZoned(SparkSession.active, str(0), ts, symbols)
      .queryExecution.logical
  }

  def injection: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) = (identifier, info, builder)
}

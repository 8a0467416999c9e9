package graft.queries

/** Shared DuckDB-oracle SQL fragments. Each fragment mirrors a Spark-side
  * builder exactly (same expressions, same aliases) so results hash-match.
  */
object Sql {

  /** The events→trades role-cast (FIXTURES.md §B), lockstep with
    * [[graft.Tables.trades]]. `CAST(ts AS TIMESTAMP)` normalizes DuckDB's
    * TIMESTAMP_NS read of the parquet to microseconds, matching Spark's
    * TimestampType. */
  val tradesCte: String =
    """trades AS (
      |  SELECT event_type AS symbol,
      |         event_id AS trade_id,
      |         value AS price,
      |         abs(value) / CAST(1000 AS DOUBLE) AS qty,
      |         CAST(ts AS TIMESTAMP) AS ts,
      |         CAST(event_id % 2 AS INTEGER) AS is_buyer_maker
      |  FROM events
      |)""".stripMargin

  /** Deterministic query-time anchor, lockstep with [[graft.Tables.asOf]]. */
  val anchorCte: String =
    "anchor AS (SELECT max(CAST(ts AS TIMESTAMP)) AS t_anchor FROM events)"

  /** `WITH trades AS (…), anchor AS (…)` prelude for the trade queries. */
  val tradesWith: String = s"WITH $tradesCte,\n$anchorCte"

  /** The string-type spelling is the ONLY dialect difference in these
    * formulas: DuckDB accepts `VARCHAR`, Spark SQL only `STRING`. Both
    * renderings share one formula below so the twins cannot drift. */
  val DuckStr = "VARCHAR"
  val SparkStr = "STRING"

  /** Decimal → double via the exact digit string (DuckDB's direct cast
    * double-rounds above 2^53) — see [[graft.ops.Ops]] `decToDouble`. */
  private def d2d(expr: String, strTy: String = DuckStr): String =
    s"CAST(CAST($expr AS $strTy) AS DOUBLE)"

  /** Order-insensitive exact double sum — see [[graft.ops.Ops.dsum]]. */
  def dsum(expr: String, strTy: String = DuckStr): String =
    d2d(s"sum(CAST($expr AS DECIMAL(38,10)))", strTy)

  /** Exact `sum(a * b)` with the multiply in decimal — see
    * [[graft.ops.Ops.dsumProd]]. */
  def dsumProd(a: String, b: String, strTy: String = DuckStr): String =
    d2d(s"sum(CAST($a AS DECIMAL(18,6)) * CAST($b AS DECIMAL(18,6)))", strTy)

  /** ClickHouse sumIf (0 on empty match set) — see [[graft.ops.Ops.sumIf]]. */
  def sumIf(expr: String, cond: String, strTy: String = DuckStr): String =
    d2d(s"coalesce(sum(CAST($expr AS DECIMAL(38,10))) FILTER (WHERE $cond), 0)",
      strTy)

  /** Conditional decimal-multiply sum — see [[graft.ops.Ops.sumIfProd]]:
    * the multiply happens in decimal so no double product is ever
    * quantized (which rounds differently across engines above ~1e5).
    * `FILTER (WHERE …)` parses in both dialects. */
  def sumIfProd(a: String, b: String, cond: String,
                strTy: String = DuckStr): String =
    d2d(s"coalesce(sum(CAST($a AS DECIMAL(18,6)) * CAST($b AS DECIMAL(18,6)))" +
      s" FILTER (WHERE $cond), 0)", strTy)

  /** VWAP over the rows matching `cond` — see [[graft.ops.Ops.vwap]]. */
  def vwap(price: String, qty: String, cond: String,
           strTy: String = DuckStr): String =
    s"${sumIfProd(price, qty, cond, strTy)} / " +
      s"nullif(${sumIf(qty, cond, strTy)}, CAST(0 AS DOUBLE))"

  /** Exact mean — see [[graft.ops.Ops.avgExact]]. */
  def avgExact(expr: String): String = s"${dsum(expr)} / count(*)"

  /** Exact mean for full-precision doubles (shortest-repr-string route) —
    * see [[graft.ops.Ops.avgFloat]]. */
  def avgFloat(expr: String): String =
    d2d(s"round(sum(CAST(CAST($expr AS VARCHAR) AS DECIMAL(38,25))), 12)") +
      " / count(*)"

  /** Exact full-precision-double sum, 0 on empty match set — see
    * [[graft.ops.Ops.sumFloat0]]. */
  def sumFloat0(expr: String): String =
    d2d("round(coalesce(sum(CAST(CAST(" + expr +
      " AS VARCHAR) AS DECIMAL(38,25))), CAST(0 AS DECIMAL(38,25))), 12)")

  /** The OHLCV candle select list — see [[graft.ops.Ops.ohlcvAggs]].
    * Single-sourced for the DuckDB oracles AND the Spark SQL entry path
    * ([[graft.api.SqlApi]]) so the candle formula cannot drift. */
  def ohlcvSelect(strTy: String = DuckStr): String =
    s"""min_by(price, ts) AS open,
       |       max(price) AS high,
       |       min(price) AS low,
       |       max_by(price, ts) AS close,
       |       ${dsum("qty", strTy)} AS volume,
       |       count(*) AS trades""".stripMargin
}

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

  /** Order-insensitive exact double sum — see [[graft.ops.Ops.dsum]]. */
  def dsum(expr: String): String =
    s"CAST(sum(CAST($expr AS DECIMAL(38,10))) AS DOUBLE)"

  /** Exact `sum(a * b)` with the multiply in decimal — see
    * [[graft.ops.Ops.dsumProd]]. */
  def dsumProd(a: String, b: String): String =
    s"CAST(CAST(sum(CAST($a AS DECIMAL(18,6)) * CAST($b AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE)"

  /** ClickHouse sumIf (0 on empty match set) — see [[graft.ops.Ops.sumIf]]. */
  def sumIf(expr: String, cond: String): String =
    s"CAST(coalesce(sum(CAST($expr AS DECIMAL(38,10))) FILTER (WHERE $cond), 0) AS DOUBLE)"

  /** VWAP over the rows matching `cond` — see [[graft.ops.Ops.vwap]]. */
  def vwap(price: String, qty: String, cond: String): String =
    s"${sumIf(s"$price * $qty", cond)} / nullif(${sumIf(qty, cond)}, CAST(0 AS DOUBLE))"

  /** Exact mean — see [[graft.ops.Ops.avgExact]]. */
  def avgExact(expr: String): String = s"${dsum(expr)} / count(*)"

  /** Exact mean for full-precision doubles (shortest-repr-string route) —
    * see [[graft.ops.Ops.avgFloat]]. */
  def avgFloat(expr: String): String =
    s"CAST(round(sum(CAST(CAST($expr AS VARCHAR) AS DECIMAL(38,25))), 12) AS DOUBLE) / count(*)"

  /** The OHLCV candle select list — see [[graft.ops.Ops.ohlcvAggs]]. */
  val ohlcvSelect: String =
    s"""min_by(price, ts) AS open,
       |       max(price) AS high,
       |       min(price) AS low,
       |       max_by(price, ts) AS close,
       |       ${dsum("qty")} AS volume,
       |       count(*) AS trades""".stripMargin
}

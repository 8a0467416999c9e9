package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** S9: parameterized query execution through Spark's named-parameter SQL
  * API — the engine-side analogue of the reference's server-bound
  * `%(symbol)s` / `%(minutes)s` parameters
  * (reference: api/server.py:78,104,127,168,195). Parameters bind as
  * literals in the analyzed plan, so a bound time cutoff prunes the scan
  * exactly like the builder path's literal predicate (never a column
  * comparison), and binding is injection-safe by construction.
  *
  * The five reference endpoints are provided as SQL texts over the
  * registered `trades` view, anchored at a bound `:asof` timestamp (the
  * deterministic stand-in for `now()` — SURVEY.md §7.5-2). The DataFrame
  * builders in [[graft.queries.TradeQueries]] remain the primary,
  * oracle-checked surface; this is the SQL entry path over the same
  * semantics.
  */
object SqlApi {

  /** Register the corpus tables and the trades role-cast as temp views.
    * Also installs the engine's optimizer rules: SQL-path time filters
    * hit the CONVERTED events timestamp, and
    * [[graft.functions.NanoTsPushdownRule]] is what turns them back into
    * raw-column bounds the parquet scan can push.
    *
    * The views pin each table's FILE LISTING at registration time (the
    * DataFrame-builder path re-lists per query) — after appending to or
    * regenerating the corpus under a live session, call [[refreshViews]]
    * alongside [[graft.Tables.invalidateAnchor]], or the SQL path reads
    * the old files (or throws FileNotFound for replaced ones). */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    graft.functions.GraftFunctions.installRules(spark)
    Tables.corpusTables.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir)
               else Tables.table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
    Tables.trades(spark, dir).createOrReplaceTempView("trades")
  }

  /** Re-resolve every registered view's file listing after the corpus
    * changed on disk — [[registerViews]]'s note. Re-registration (vs
    * `spark.catalog.refreshTable`) also picks up a changed events
    * timestamp PHYSICAL type, which alters the view's analyzed plan,
    * not just its file index. */
  def refreshViews(spark: SparkSession, dir: String): Unit =
    registerViews(spark, dir)

  /** Execute SQL with named parameters (`:name`). */
  def query(spark: SparkSession, sql: String,
            args: Map[String, Any] = Map.empty): DataFrame =
    spark.sql(sql, args)

  /** The deterministic `:asof` anchor for a corpus dir, at FULL micro
    * precision — the corpus timestamps are not millisecond-aligned, so a
    * ms-truncated anchor would shift every window cutoff up to 999 µs
    * from the builder path's. */
  def anchor(spark: SparkSession, dir: String): java.sql.Timestamp =
    Tables.microsToTimestamp(Tables.anchorMicros(spark, dir))

  /** Spark-SQL rendering of the engine's order-insensitive decimal-exact
    * sum — the SAME formula as the DuckDB oracles', single-sourced in
    * [[graft.queries.Sql.dsum]] (only the string-type spelling differs
    * per dialect), so the SQL endpoints and the oracle twins cannot
    * drift apart. A plain `sum(double)` would vary with partition merge
    * order run to run. */
  private def dsum(e: String): String =
    graft.queries.Sql.dsum(e, graft.queries.Sql.SparkStr)

  /** [[dsum]] with ClickHouse sumIf empty-set-is-0 semantics. */
  private def dsumIf(e: String, cond: String): String =
    graft.queries.Sql.sumIf(e, cond, graft.queries.Sql.SparkStr)

  /** Spark-SQL rendering of the shared VWAP formula. */
  private def vwap(cond: String): String =
    graft.queries.Sql.vwap("price", "qty", cond, graft.queries.Sql.SparkStr)

  /** Q1 `/ohlcv` (reference: api/server.py:57-84) — the SAME candle
    * select list the oracles use ([[graft.queries.Sql.ohlcvSelect]]),
    * in the Spark string-type spelling. */
  val ohlcvSql: String =
    s"""SELECT date_trunc('minute', ts) AS minute,
       |       ${graft.queries.Sql.ohlcvSelect(graft.queries.Sql.SparkStr)}
       |FROM trades
       |WHERE symbol = :symbol
       |  AND ts >= timestampadd(MINUTE, -:minutes, CAST(:asof AS TIMESTAMP))
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  /** Q2 `/top_symbols` (reference: api/server.py:87-105). */
  val topSymbolsSql: String =
    s"""SELECT symbol, ${dsum("qty")} AS volume, count(*) AS trades
       |FROM trades
       |WHERE ts >= timestampadd(MINUTE, -:minutes, CAST(:asof AS TIMESTAMP))
       |GROUP BY 1
       |ORDER BY volume DESC, symbol
       |LIMIT :limit""".stripMargin

  /** Q3 `/live_trades` (reference: api/server.py:108-132) — same row
    * shape as the builder twin (`trade_id` included: reference line 116
    * returns it and the tie-broken ordering exposes it). */
  val liveTradesSql: String =
    """SELECT ts, symbol, trade_id, price, qty, is_buyer_maker
      |FROM trades
      |WHERE symbol = :symbol
      |  AND ts >= timestampadd(MINUTE, -:minutes, CAST(:asof AS TIMESTAMP))
      |ORDER BY ts DESC, trade_id DESC
      |LIMIT :limit""".stripMargin

  /** Q4 `/live_buy_sell` (reference: api/server.py:135-169) — the full
    * builder row shape (volumes, VWAPs, trade rate, total). Spark SQL
    * cannot reuse sibling SELECT aliases (SURVEY.md §7.5-3), so the
    * aggregate stage is a subquery. */
  val liveBuySellSql: String =
    s"""SELECT symbol, buy_volume, sell_volume, buy_vwap, sell_vwap, trades,
       |       trades / CAST(:minutes AS DOUBLE) AS trades_per_min,
       |       buy_volume + sell_volume AS total_volume
       |FROM (
       |  SELECT symbol,
       |         ${dsumIf("qty", "is_buyer_maker = 0")} AS buy_volume,
       |         ${dsumIf("qty", "is_buyer_maker = 1")} AS sell_volume,
       |         ${vwap("is_buyer_maker = 0")} AS buy_vwap,
       |         ${vwap("is_buyer_maker = 1")} AS sell_vwap,
       |         count(*) AS trades
       |  FROM trades
       |  WHERE ts >= timestampadd(MINUTE, -:minutes, CAST(:asof AS TIMESTAMP))
       |  GROUP BY 1)
       |ORDER BY total_volume DESC, symbol
       |LIMIT :top""".stripMargin

  /** Q5 `/hist_buy_sell` (reference: api/server.py:172-200) — full
    * builder row shape including the per-minute VWAPs. */
  val histBuySellSql: String =
    s"""SELECT date_trunc('minute', ts) AS minute,
       |       ${dsumIf("qty", "is_buyer_maker = 0")} AS buy_volume,
       |       ${dsumIf("qty", "is_buyer_maker = 1")} AS sell_volume,
       |       ${vwap("is_buyer_maker = 0")} AS buy_vwap,
       |       ${vwap("is_buyer_maker = 1")} AS sell_vwap,
       |       count(*) AS trades
       |FROM trades
       |WHERE symbol = :symbol
       |  AND ts >= timestampadd(MINUTE, -:minutes, CAST(:asof AS TIMESTAMP))
       |GROUP BY 1
       |ORDER BY 1""".stripMargin
}

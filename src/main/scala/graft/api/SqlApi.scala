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
    * raw-column bounds the parquet scan can push. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    graft.functions.GraftFunctions.installRules(spark)
    Tables.corpusTables.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir)
               else Tables.table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
    Tables.trades(spark, dir).createOrReplaceTempView("trades")
  }

  /** Execute SQL with named parameters (`:name`). */
  def query(spark: SparkSession, sql: String,
            args: Map[String, Any] = Map.empty): DataFrame =
    spark.sql(sql, args)

  /** The deterministic `:asof` anchor for a corpus dir, at FULL micro
    * precision — the corpus timestamps are not millisecond-aligned, so a
    * ms-truncated anchor would shift every window cutoff up to 999 µs
    * from the builder path's. */
  def anchor(spark: SparkSession, dir: String): java.sql.Timestamp = {
    val us = Tables.anchorMicros(spark, dir)
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      us / 1000000L, (us % 1000000L) * 1000L))
  }

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

  /** Q1 `/ohlcv` (reference: api/server.py:57-84). */
  val ohlcvSql: String =
    s"""SELECT date_trunc('minute', ts) AS minute,
       |       min_by(price, ts) AS open,
       |       max(price) AS high,
       |       min(price) AS low,
       |       max_by(price, ts) AS close,
       |       ${dsum("qty")} AS volume,
       |       count(*) AS trades
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

  /** Q3 `/live_trades` (reference: api/server.py:108-132). */
  val liveTradesSql: String =
    """SELECT ts, symbol, price, qty, is_buyer_maker
      |FROM trades
      |WHERE symbol = :symbol
      |  AND ts >= timestampadd(MINUTE, -:minutes, CAST(:asof AS TIMESTAMP))
      |ORDER BY ts DESC, trade_id DESC
      |LIMIT :limit""".stripMargin

  /** Q4 `/live_buy_sell` (reference: api/server.py:135-169). Spark SQL
    * cannot reuse sibling SELECT aliases (SURVEY.md §7.5-3), so the
    * aggregate stage is a subquery. */
  val liveBuySellSql: String =
    s"""SELECT symbol, buy_volume, sell_volume,
       |       buy_volume + sell_volume AS total_vol,
       |       trades_cnt / :minutes AS trades_per_min
       |FROM (
       |  SELECT symbol,
       |         ${dsumIf("qty", "is_buyer_maker = 0")} AS buy_volume,
       |         ${dsumIf("qty", "is_buyer_maker = 1")} AS sell_volume,
       |         count(*) AS trades_cnt
       |  FROM trades
       |  WHERE ts >= timestampadd(MINUTE, -:minutes, CAST(:asof AS TIMESTAMP))
       |  GROUP BY 1)
       |ORDER BY total_vol DESC, symbol
       |LIMIT :top""".stripMargin

  /** Q5 `/hist_buy_sell` (reference: api/server.py:172-200). */
  val histBuySellSql: String =
    s"""SELECT date_trunc('minute', ts) AS minute,
       |       ${dsumIf("qty", "is_buyer_maker = 0")} AS buy_volume,
       |       ${dsumIf("qty", "is_buyer_maker = 1")} AS sell_volume,
       |       count(*) AS trades
       |FROM trades
       |WHERE symbol = :symbol
       |  AND ts >= timestampadd(MINUTE, -:minutes, CAST(:asof AS TIMESTAMP))
       |GROUP BY 1
       |ORDER BY 1""".stripMargin
}

package graft

import graft.api.SqlApi
import graft.queries.TradeQueries

/** The parameterized SQL entry path (S9): named-parameter binding returns
  * the same results as the DataFrame builders, parameters actually vary
  * the result, and the bound cutoff reaches the scan as a literal
  * pushed filter. */
class SqlApiSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def args(extra: (String, Any)*): Map[String, Any] =
    (extra :+ ("asof" -> SqlApi.anchor(spark, dir))).toMap

  test("ohlcv endpoint == parameterized builder") {
    SqlApi.registerViews(spark, dir)
    val viaSql = SqlApi.query(spark, SqlApi.ohlcvSql,
      args("symbol" -> "click", "minutes" -> 1440L)).collect()
    val viaBuilder = TradeQueries.ohlcv("click", 1440)(spark, dir).collect()
    assert(viaSql.length == viaBuilder.length && viaSql.nonEmpty)
    viaSql.zip(viaBuilder).foreach { case (a, b) =>
      assert(a.getTimestamp(0) == b.getTimestamp(0))
      assert(a.getDouble(1) == b.getDouble(1)) // open: exact
      assert(a.getLong(6) == b.getLong(6))     // trades: exact
      // volume: both paths use the decimal-exact order-insensitive sum,
      // so the doubles are bit-identical
      assert(a.getDouble(5) == b.getDouble(5))
    }
  }

  test("parameters vary the result (no baked-in literals)") {
    SqlApi.registerViews(spark, dir)
    val wide = SqlApi.query(spark, SqlApi.topSymbolsSql,
      args("minutes" -> 100000L, "limit" -> 10)).collect()
    val narrow = SqlApi.query(spark, SqlApi.topSymbolsSql,
      args("minutes" -> 60L, "limit" -> 10)).collect()
    val capped = SqlApi.query(spark, SqlApi.topSymbolsSql,
      args("minutes" -> 100000L, "limit" -> 2)).collect()
    assert(wide.length > capped.length)
    assert(capped.length == 2)
    val wideTrades = wide.map(_.getLong(2)).sum
    val narrowTrades = narrow.map(_.getLong(2)).sum
    assert(narrowTrades < wideTrades)
  }

  test("bound time cutoff lands in the scan as a pushed literal filter") {
    SqlApi.registerViews(spark, dir)
    val df = SqlApi.query(spark, SqlApi.liveTradesSql,
      args("symbol" -> "view", "minutes" -> 240L, "limit" -> 500))
    val physical = df.queryExecution.executedPlan.toString
    // the filter must compare against a resolved literal, not a column
    // (the round-1 anchor-cross-join scale-killer)
    assert(physical.contains("PushedFilters: [") &&
      physical.contains("GreaterThanOrEqual(ts,"))
  }

  test("buy/sell endpoints match the builders' row shape AND values") {
    SqlApi.registerViews(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    val sqlQ4 = SqlApi.query(spark, SqlApi.liveBuySellSql,
      args("minutes" -> 1440L, "top" -> 5))
    val builderQ4 = TradeQueries.liveBuySellFor(1440, 5)(spark, dir)
    assert(sqlQ4.columns.toSeq == builderQ4.columns.toSeq,
      "Q4 column shape diverged from the builder endpoint")
    assert(rows(sqlQ4) == rows(builderQ4) && rows(sqlQ4).nonEmpty)
    val sqlQ5 = SqlApi.query(spark, SqlApi.histBuySellSql,
      args("symbol" -> "purchase", "minutes" -> 2880L))
    val builderQ5 = TradeQueries.histBuySellFor("purchase", 2880)(spark, dir)
    assert(sqlQ5.columns.toSeq == builderQ5.columns.toSeq,
      "Q5 column shape diverged from the builder endpoint")
    assert(rows(sqlQ5) == rows(builderQ5) && rows(sqlQ5).nonEmpty)
  }

  test("live_trades carries the full builder row shape incl. trade_id") {
    SqlApi.registerViews(spark, dir)
    val q3 = SqlApi.query(spark, SqlApi.liveTradesSql,
      args("symbol" -> "view", "minutes" -> 240L, "limit" -> 500))
    assert(q3.columns.toSeq ==
      Seq("ts", "symbol", "trade_id", "price", "qty", "is_buyer_maker"))
    assert(q3.collect().nonEmpty)
  }
}

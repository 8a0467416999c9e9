package graft.api

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.Tables
import graft.streaming.CandlePipeline

/** One exchange trade — mirrors the reference fact table
  * (reference: sql/V1__create_trades_table.sql:3-16; SURVEY.md §1.3). */
final case class Trade(
    symbol: String,
    trade_id: Long,
    price: Double,
    qty: Double,
    ts: java.sql.Timestamp,
    is_buyer_maker: Int)

/** One 1-minute OHLCV candle — mirrors `crypto.trades_1m`
  * (reference: sql/V2__create_trades_1m_view.sql:1-14). */
final case class Candle(
    minute: java.sql.Timestamp,
    symbol: String,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    volume: Double,
    trades: Long)

/** Typed `Dataset` boundary (SURVEY.md §1.3): compile-time-checked row
  * shapes for consumers, while every operator underneath stays
  * Column-based so Catalyst keeps optimizing — the encoders only assert
  * and convert the schema at the API edge, they never push lambdas into
  * the hot path. */
object Typed {

  def trades(spark: SparkSession, dir: String): Dataset[Trade] = {
    import spark.implicits._
    Tables.trades(spark, dir).as[Trade]
  }

  def candles(spark: SparkSession, dir: String): Dataset[Candle] = {
    import spark.implicits._
    CandlePipeline.candles(Tables.trades(spark, dir)).as[Candle]
  }
}

package graft.store

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType,
  StringType, StructField, StructType, TimestampType}

import graft.streaming.TradeIngest

/** Concrete engine bootstrap — the analogue of the reference's versioned
  * SQL migrations, run through the checksummed [[Store.migrate]] runner:
  *
  *  - V1 creates the partitioned trades table layout + registers the view
  *    (reference: sql/V1__create_trades_table.sql — engine/order/partition
  *    settings become directory layout + sort discipline here).
  *  - V2 creates the 1-minute candle partials table the streaming MV
  *    appends to (reference: sql/V2__create_trades_1m_view.sql).
  *
  * Idempotent: re-running is a no-op; editing an applied step throws
  * (checksum refusal, reference: src/migrate.py:138-146).
  */
object Bootstrap {

  /** Full trades-at-rest schema: ingest row + sink stamps + partition key. */
  val tradesAtRest: StructType = StructType(
    TradeIngest.tradeSchema.fields ++ Seq(
      StructField("ingested_at", TimestampType),
      StructField("month", StringType)))

  /** Candle-partials-at-rest schema — one row per (micro-batch block,
    * minute, symbol), mergeable on read (CandlePipeline.partialCandles). */
  val candlePartials: StructType = StructType(Seq(
    StructField("minute", TimestampType),
    StructField("symbol", StringType),
    StructField("open_ts", TimestampType),
    StructField("close_ts", TimestampType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    // the EXACT mergeable partial (Ops.dsumPartial) — a double here
    // would re-quantize at merge time and drift from the direct batch
    // aggregation once a partial's volume exceeds ~4e5
    StructField("volume", DecimalType(38, 10)),
    StructField("trades", LongType),
    StructField("block", LongType)))

  def migrations(warehouse: String): Seq[Store.Migration] = Seq(
    Store.Migration(1, "create_trades_table",
      "trades: parquet, partitioned by month=yyyyMM(ts), " +
        "sorted within partitions by (ts, symbol, trade_id)",
      { _ =>
        // a zero-row partitioned write would emit NO parquet files (only
        // _SUCCESS), leaving nothing to infer a schema from — persist
        // the schema as a manifest instead; Store.readTrades uses it
        // until the first ingest lands real files
        Store.writeSchema(s"$warehouse/trades", tradesAtRest)
      }),
    Store.Migration(2, "create_trades_1m",
      "trades_1m: parquet partial candles (minute, symbol, block, " +
        "open_ts, close_ts, ohlcv), appended per micro-batch",
      { _ =>
        // same empty-table problem V1 solves: the schema manifest makes
        // the freshly created candle table readable before the first
        // micro-batch lands (Store.readTable falls back to it)
        Store.writeSchema(s"$warehouse/trades_1m", candlePartials)
      }))

  /** Run all pending migrations against the warehouse. */
  def apply(spark: SparkSession, warehouse: String): Seq[Int] =
    Store.migrate(spark, warehouse, migrations(warehouse))
}

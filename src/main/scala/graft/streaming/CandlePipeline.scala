package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.ops.Ops

/** The incremental 1-minute OHLCV candle pipeline — the reference's one
  * real piece of engine machinery (SURVEY.md §4): ClickHouse's
  * `trades_to_1m` materialized view aggregates each insert block into
  * partial candles appended to `trades_1m`
  * (reference: sql/V2__create_trades_1m_view.sql:16-29), and correct
  * readback re-aggregates the partials (ST4).
  *
  * Two fidelity variants, both provided:
  *
  *  - [[partialSink]] + [[readCandles]] — exact reference parity
  *    (ST4 option b): every micro-batch appends per-(minute,symbol)
  *    partial candles carrying `open_ts`/`close_ts`/`block`; readers
  *    merge partials. Late data simply lands as another partial for the
  *    old minute, exactly like the CH MV.
  *  - [[watermarkedCandles]] — the Spark-native showcase (ST4 option a):
  *    event-time window aggregation with a watermark; Spark maintains the
  *    candle state incrementally and emits finalized windows, strictly
  *    cleaner than the reference (bounded state, no read-side merge).
  *
  * The partial-merge rules match `graft.queries.TradeQueries.candleMerge`
  * (open = open of the partial with the smallest `(open_ts, block)`,
  * close from the largest `(close_ts, block)`, high/low = max/min,
  * volume/trades = sums) so streaming output == batch recomputation is a
  * testable invariant.
  */
object CandlePipeline {

  /** Batch candle aggregation over any trades frame — A12, the flagship
    * aggregate (reference: sql/V2__create_trades_1m_view.sql:19-29). */
  def candles(trades: DataFrame): DataFrame =
    Ops.aggSeq(
      trades.groupBy(
        Ops.minuteOf(col("ts")).as("minute"), col("symbol")),
      Ops.ohlcvAggs(col("price"), col("qty"), col("ts")))

  /** Per-block partial candles for one micro-batch (the MV body).
    * `block` is the micro-batch id — the analogue of the reference's
    * per-insert-block granularity. */
  def partialCandles(batch: DataFrame, blockId: Long): DataFrame =
    Ops.aggSeq(
      batch.groupBy(Ops.minuteOf(col("ts")).as("minute"), col("symbol")),
      min(col("ts")).as("open_ts") +:
        max(col("ts")).as("close_ts") +:
        Ops.ohlcvAggs(col("price"), col("qty"), col("ts")))
      .withColumn("block", lit(blockId))

  /** ST4 option (b): streaming sink appending partial candles per
    * micro-batch. State is ZERO — each batch aggregates only itself
    * (typically ≤ minutes×symbols rows), so this scales to any input
    * rate; the merge cost moves to read time, exactly as in the
    * reference. */
  def partialSink(trades: DataFrame, partialsPath: String,
                  checkpointPath: String,
                  trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : StreamingQuery =
    trades.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        partialCandles(batch, batchId)
          .coalesce(1)
          .write.mode("append").parquet(partialsPath)
        ()
      }
      .start()

  /** Merge partial candles back into final per-(minute,symbol) candles —
    * the correct-readback query over the partials table (ST4). The
    * fixed-width `(epoch_us, block)` tie-break key makes `min_by`/`max_by`
    * deterministic when equal timestamps span blocks. */
  def readCandles(partials: DataFrame): DataFrame = {
    def key(ts: org.apache.spark.sql.Column) =
      format_string("%019d-%019d", unix_micros(ts), col("block"))
    partials
      .groupBy("minute", "symbol")
      .agg(
        min_by(col("open"), key(col("open_ts"))).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), key(col("close_ts"))).as("close"),
        Ops.dsum(col("volume")).as("volume"),
        sum(col("trades")).as("trades"))
  }

  /** ST4 option (a): the Spark-native incremental candle stream —
    * watermarked tumbling-window OHLCV with bounded state. Append mode
    * emits each (minute, symbol) candle once its window passes the
    * watermark; rows later than `lateness` are dropped (a stated
    * deviation from the reference, which accepts arbitrarily late rows
    * into new partials — [[partialSink]] preserves that exactly). */
  def watermarkedCandles(trades: DataFrame,
                         lateness: String = "2 minutes"): DataFrame = {
    val windowed = trades
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 minute"), col("symbol"))
    Ops.aggSeq(windowed,
        Ops.ohlcvAggs(col("price"), col("qty"), col("ts")))
      .select(
        col("window.start").as("minute"), col("symbol"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("trades"))
  }

  /** Start option (a) writing finalized candles to a parquet table. */
  def candleSink(trades: DataFrame, candlesPath: String,
                 checkpointPath: String,
                 lateness: String = "2 minutes",
                 trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : StreamingQuery =
    watermarkedCandles(trades, lateness).writeStream
      .trigger(trigger)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointPath)
      .option("path", candlesPath)
      .format("parquet")
      .start()
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Ops
import graft.streaming.TradeIngest

/** Ingest-path throughput, measured — the reference's About page claims
  * "millions of trades can be ingested, aggregated, and visualized with
  * sub-second latency" with no methodology (reference:
  * docs/index.html:263-265; recorded in BASELINE.md). This bench puts a
  * number on THIS engine's version of that sentence, end to end and on
  * the real production lineage, not a stripped-down copy:
  *
  *  1. **Ingest**: N wire-format JSON envelopes (the Binance combined-
  *     stream shape `TradeIngest.envelopeSchema`, pre-materialized as
  *     text files so generation is not timed) stream through the REAL
  *     `normalize → ingestSink` chain — `from_json` decode, casts,
  *     defaults, the month-partitioned sorted append, checkpointing —
  *     under `Trigger.AvailableNow`, several micro-batches. Reported:
  *     wall seconds and rows/sec.
  *  2. **Aggregate + "visualize"**: the dashboard's OHLCV candle query
  *     (1-minute buckets over the ingested table — the reference UI's
  *     main chart) timed against the just-written store. Reported: wall
  *     seconds; the claim's "sub-second" is this number.
  *
  * The sink's `coalesce(1)`-per-batch (small-file discipline for 5-s
  * flushes) serializes each batch's write — so rows/sec here is a
  * deliberately HONEST number for the production sink shape, not a
  * parallel-write best case. maxFilesPerTrigger controls batch sizing.
  *
  * Prints one JSON line for COVERAGE.md.
  *
  * Usage: runMain graft.IngestBench [nRows] [filesPerTrigger]
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val fpt = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = "target/ingest_bench"
    graft.store.Store.deleteRecursivelyIfExists(root)
    val rawDir = s"$root/raw"; val tradesDir = s"$root/trades"
    val ckptDir = s"$root/ckpt"

    // wire-format envelopes: 4 symbols, price/qty as STRINGS (decode
    // cost is part of the measured path), event time advancing 1 trade
    // per millisecond from a fixed anchor => ~33 minutes of market time
    val anchorMs = 1735689600000L // 2025-01-01T00:00:00Z, deterministic
    spark.range(n)
      .select(to_json(struct(
        concat(lit("stream-"), col("id") % 4).as("stream"),
        struct(
          element_at(array(lit("btcusdt"), lit("ethusdt"), lit("solusdt"),
            lit("xrpusdt")), (col("id") % 4 + 1).cast("int")).as("s"),
          col("id").as("t"),
          // format_string, NOT format_number: the latter inserts locale
          // grouping separators at >= 1000, which the ingest cast would
          // turn into nulls if the price range ever widened
          format_string("%.4f", lit(100.0) + (col("id") % 10000) / 100.0)
            .as("p"),
          format_string("%.6f", (col("id") % 997 + 1) / 1000.0).as("q"),
          (lit(anchorMs) + col("id")).as("T"),
          (col("id") % 2 === 0).as("m")).as("data"))).as("value"))
      .repartition(32)
      .write.mode("overwrite").text(rawDir)

    // both sink shapes: files=1 is the reference-parity trickle sink
    // (coalesce(1) — which also serializes the decode, see ingestSink);
    // files=16 is the firehose shape (repartition = parallel decode+write)
    def runIngest(tag: String, filesPerBatch: Int): (Double, Long) = {
      val src = spark.readStream.format("text")
        .option("maxFilesPerTrigger", fpt).load(rawDir)
      val t0 = System.nanoTime()
      val q = TradeIngest.ingestSink(TradeIngest.normalize(src),
        s"$tradesDir-$tag", s"$ckptDir-$tag", Trigger.AvailableNow(),
        filesPerBatch)
      q.awaitTermination()
      // batchId is the authoritative batch counter — recentProgress is
      // capped (default 100 entries) and under-reports long runs
      val batches = Option(q.lastProgress).map(_.batchId + 1).getOrElse(0L)
      ((System.nanoTime() - t0) / 1e9, batches)
    }
    val (serialSec, batches) = runIngest("serial", 1)
    val (parSec, _) = runIngest("par", 16)

    val written = spark.read.parquet(s"$tradesDir-par")
    val rows = written.count()
    val rowsSerial = spark.read.parquet(s"$tradesDir-serial").count()
    require(rows == rowsSerial, s"sink shapes disagree: $rows vs $rowsSerial")

    // the dashboard query: full-history 1-minute OHLCV per symbol over
    // the table just ingested (the reference UI's main chart series)
    def candles() = written
      .groupBy(date_trunc("minute", col("ts")).as("minute"), col("symbol"))
      .agg(Ops.ohlcvAggs(col("price"), col("qty"), col("ts")).head,
        Ops.ohlcvAggs(col("price"), col("qty"), col("ts")).tail: _*)
    candles().write.mode("overwrite").format("noop").save() // warm
    val t1 = System.nanoTime()
    val nCandles = candles().count()
    val readbackSec = (System.nanoTime() - t1) / 1e9

    println(
      s"""{"bench":"ingest_throughput","rows":$rows,"expected":$n,""" +
        s""""batches":$batches,"serial_sec":$serialSec,""" +
        s""""serial_rows_per_sec":${(rows / serialSec).toLong},""" +
        s""""par16_sec":$parSec,""" +
        s""""par16_rows_per_sec":${(rows / parSec).toLong},""" +
        s""""candles":$nCandles,"candle_readback_sec":$readbackSec}""")
    spark.stop()
  }
}

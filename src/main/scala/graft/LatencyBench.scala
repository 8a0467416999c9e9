package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Measured answer to the reference's one quantitative claim
  * (reference: docs/index.html:263-265 — "millions of trades can be
  * ingested, aggregated, and visualized with sub-second latency"):
  * per-micro-batch END-TO-END latency of the REAL ingest→candle
  * pipeline — raw wire-JSON lines through
  * [[graft.streaming.TradeIngest.normalize]] (S2 decode) into
  * [[graft.streaming.CandlePipeline.watermarkedCandles]] (ST3
  * watermarked window agg) committed to a parquet sink — via
  * `StreamingQueryListener` progress events.
  *
  * Methodology: the corpus trades are re-encoded as Binance-style
  * envelope JSON lines and staged as `nFiles` files;
  * `maxFilesPerTrigger = 1` + `Trigger.AvailableNow` delivers them as
  * `nFiles` micro-batches, so per-batch rows ≈ corpus/nFiles — sized to
  * the contract under test (500 rows ≈ one reference BATCH_SIZE flush,
  * reference: src/stream_binance.py:20). `triggerExecution` is the
  * batch's full decode→aggregate→commit wall (state update + sink commit
  * + offset log); end-to-end freshness of a row is that latency plus
  * the trigger cadence (the 5 s flush contract, 0 here). p50/p99 are
  * reported over all batches AND excluding the first five (plan +
  * codegen warm-up lives in the first batches; both numbers are the
  * record, the exclusion is labeled).
  *
  * Usage: runMain graft.LatencyBench <sfDir> <nFiles>
  */
object LatencyBench {

  def main(args: Array[String]): Unit = {
    val Array(sfDir, nFilesStr) = args.take(2)
    val nFiles = nFilesStr.toInt
    // state partitioning is a LATENCY knob for streaming aggregation:
    // every micro-batch commits one state-store delta + one sink file
    // per partition, a fixed cost that dwarfs 500 rows of real work.
    // The candle state key space is (symbols × open minutes) — tiny —
    // so a latency-oriented deployment sizes this to the key space,
    // not to the CPU count (the batch analytics keep 32). Default 8.
    val stateParts = args.lift(2).getOrElse("8")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // r14 experiment knobs against the volume-mode p99 (both default
    // off so the recorded baseline methodology is unchanged):
    //  - SPARK_GRAFT_STATE_PROVIDER=rocksdb swaps the HDFS-backed
    //    state store for RocksDB (changelog checkpointing on, so a
    //    commit ships the delta, not a full snapshot upload)
    //  - SPARK_GRAFT_ASYNC_PROGRESS=1 turns on async progress
    //    tracking (offset/commit-log writes move off the trigger path)
    val provider = sys.env.get("SPARK_GRAFT_STATE_PROVIDER")
    val asyncProgress = sys.env.get("SPARK_GRAFT_ASYNC_PROGRESS")
      .exists(_ == "1")
    val builder = SparkSession.builder()
      .appName("graft-latency-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", stateParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    if (provider.contains("rocksdb")) {
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      builder.config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing" +
          ".enabled", "true")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val scratch = graft.store.Store.scratchStore("latency")
    val src = s"$scratch/src"
    val sink = s"$scratch/sink"
    val chk = s"$scratch/chk"

    // stage the corpus as wire-format JSON lines, nFiles files → one
    // micro-batch each. Doubles round-trip exactly through Spark's
    // shortest-repr cast; ts → epoch millis as on the wire.
    val staged = Tables.trades(spark, sfDir)
      .select(concat(
        lit("""{"stream":"trades","data":{"s":""""), col("symbol"),
        lit("""","t":"""), col("trade_id").cast("string"),
        lit(""","p":""""), col("price").cast("string"),
        lit("""","q":""""), col("qty").cast("string"),
        lit("""","T":"""),
        (unix_micros(col("ts")) / lit(1000L)).cast("long").cast("string"),
        lit(""","m":"""),
        when(col("is_buyer_maker") === 1, lit("true")).otherwise(lit("false")),
        lit("}}")).as("value"))
      .repartition(nFiles)
    staged.write.mode("overwrite").text(src)
    val totalRows = spark.read.text(src).count()

    val batches = ArrayBuffer[(Long, Long)]() // (numInputRows, triggerMs)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val ms = Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(-1L)
        if (p.numInputRows > 0 && ms >= 0)
          batches.synchronized { batches += ((p.numInputRows, ms)); () }
      }
    }
    spark.streams.addListener(listener)

    val raw = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .text(src)
    val q = graft.streaming.CandlePipeline.candleSink(
      graft.streaming.TradeIngest.normalize(raw),
      sink, chk, trigger = Trigger.AvailableNow(),
      extraOptions =
        if (asyncProgress) Map("asyncProgressTrackingEnabled" -> "true")
        else Map.empty)
    require(q.awaitTermination(1200000L), "stream did not drain in 20 min")
    spark.streams.removeListener(listener)

    val all = batches.synchronized(batches.toVector)
    def pct(v: Vector[Long], p: Double): Long =
      if (v.isEmpty) -1L
      else v.sorted.apply(math.min(v.size - 1, (p * v.size).toInt))
    val lat = all.map(_._2)
    val warm = lat.drop(5)
    val sumMs = lat.sum.max(1L)
    val mode = (if (provider.contains("rocksdb")) "rocksdb" else "hdfs") +
      (if (asyncProgress) "+async" else "")
    println(
      s"""{"metric":"candle_ingest_batch_latency","sf_dir":"$sfDir",""" +
      s""""state_mode":"$mode",""" +
      s""""n_batches":${all.size},"rows_total":$totalRows,""" +
      s""""rows_per_batch":${if (all.isEmpty) 0 else totalRows / all.size},""" +
      s""""p50_ms":${pct(lat, 0.50)},"p99_ms":${pct(lat, 0.99)},""" +
      s""""max_ms":${if (lat.isEmpty) -1 else lat.max},""" +
      s""""warm_p50_ms":${pct(warm, 0.50)},"warm_p99_ms":${pct(warm, 0.99)},""" +
      s""""sustained_rows_per_sec":${totalRows * 1000 / sumMs}}""")
    spark.stop()
  }
}

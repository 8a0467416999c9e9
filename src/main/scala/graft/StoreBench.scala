package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.{ScanStats, Store}

/** The partitioned store's hot path, MEASURED: the same windowed query
  * over the same rows in two layouts —
  *
  *  - `flat`: unpartitioned, unsorted parquet (what the driver corpus
  *    looks like) — a time-window scan must open every file;
  *  - `store`: [[Store.writeTrades]]'s month-partitioned, (ts, symbol,
  *    trade_id)-sorted layout (the engine-side equivalent of the
  *    reference's `PARTITION BY toYYYYMM(ts)` + `ORDER BY` sparse index,
  *    reference: sql/V1__create_trades_table.sql:14-16) read through
  *    [[Store.readTradesSince]], whose derived `month` bound prunes
  *    partition directories before listing and whose ts literal skips
  *    row groups inside the survivors.
  *
  * The corpus spans a single month, so the bench widens it: N month-
  * shifted copies (ts + k months — exactly the layout a year of ingest
  * produces). The windowed query then asks for the last 3 days. Output:
  * one JSON line with files/bytes/wall per layout — the recorded
  * before/after scan metric for COVERAGE.md.
  *
  * Usage: runMain graft.StoreBench [sfDir] [months]
  */
object StoreBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val months = if (args.length > 1) args(1).toInt else 12
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = "target/store_bench"
    val flatPath = s"$root/flat"
    val storePath = s"$root/store"
    Store.deleteRecursivelyIfExists(root)

    // N month-shifted copies of the role-cast trades (disjoint trade_ids
    // per copy) — a year of ingest, derived from the driver corpus
    val base = Tables.trades(spark, sfDir)
    val copies = (0 until months).map { k =>
      base.select(
        col("symbol"),
        (col("trade_id") + lit(k.toLong * 1000000000L)).as("trade_id"),
        col("price"), col("qty"),
        (col("ts") + expr(s"INTERVAL $k MONTH")).as("ts"),
        col("is_buyer_maker"))
    }.reduce(_ unionByName _)

    // flat: same row count, same parquet codec, NO layout discipline —
    // one file per month's worth of rows so the file-count comparison is
    // apples-to-apples with the store's one-sorted-file-per-month
    copies.repartition(months).write.mode(SaveMode.Overwrite)
      .option("compression", "zstd").parquet(flatPath)
    Store.writeTrades(copies, storePath, SaveMode.Overwrite)

    // the windowed ask: last 3 days of a year of data (the reference's
    // sliding-window query shape, api/server.py:73)
    val maxTs = spark.read.parquet(flatPath)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val sinceUs = maxTs - 3L * 86400L * 1000000L
    val since = Tables.microsToTimestamp(sinceUs)

    def windowed(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n"), sum(col("price")).as("p"))

    def run(mk: () => org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
      mk().collect() // warm
      val t0 = System.nanoTime()
      val df = mk()
      // collect the (tiny, one-row-per-symbol) aggregate so THIS
      // DataFrame's plan is the executed one — a .write would wrap the
      // plan in a fresh QueryExecution and leave these metrics empty
      df.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val (files, bytes) = ScanStats.totals(df)
      (files, bytes, wall)
    }

    val (fFiles, fBytes, fWall) = run(() => windowed(
      spark.read.parquet(flatPath).where(col("ts") >= lit(since))))
    val (sFiles, sBytes, sWall) = run(() => windowed(
      Store.readTradesSince(spark, storePath, sinceUs)))

    // zoned layout, same rows: files ≈ month count so granularity is
    // comparable with the month-partitioned store
    val zonedPath = s"$root/zoned"
    Store.writeTradesZoned(copies, zonedPath, files = months * 2)
    val (zFiles, zBytes, zWall) = run(() => windowed(
      Store.readTradesZoned(spark, zonedPath,
        tsMicros = Some((sinceUs, maxTs)))))
    // the query the month store CANNOT prune: one symbol, all time —
    // zone maps + z-clustering prune it file-level
    val sym = ("purchase", "purchase")
    val (msFiles, msBytes, msWall) = run(() => windowed(
      Store.readTrades(spark, storePath).where(col("symbol") === "purchase")))
    val (zsFiles, zsBytes, zsWall) = run(() => windowed(
      Store.readTradesZoned(spark, zonedPath, symbols = Some(sym))))

    val rows = spark.read.parquet(flatPath).count()
    println(
      s"""{"bench":"store_hot_path","months":$months,"rows":$rows,""" +
        s""""window_days":3,""" +
        s""""flat":{"files":$fFiles,"bytes":$fBytes,"wall_sec":$fWall},""" +
        s""""store":{"files":$sFiles,"bytes":$sBytes,"wall_sec":$sWall},""" +
        s""""zoned":{"files":$zFiles,"bytes":$zBytes,"wall_sec":$zWall},""" +
        s""""symbol_scan_store":{"files":$msFiles,"bytes":$msBytes,"wall_sec":$msWall},""" +
        s""""symbol_scan_zoned":{"files":$zsFiles,"bytes":$zsBytes,"wall_sec":$zsWall}}""")
    spark.stop()
  }
}

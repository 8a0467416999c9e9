package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder
import graft.store.{Store, ZoneMap}

/** Z-order clustering + zone-map pruning: the Morton kernel's bit
  * layout, index soundness (pruned read ≡ full-scan read), and the
  * measured claim the layout exists for — a symbol-only predicate
  * prunes files on the z-ordered layout and CANNOT on the ts-sorted
  * one, while ts predicates prune on both. */
class ZoneSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("morton interleave: bit layout, bounds, SQL surface") {
    // a=5 (101b) spreads to even bits {0,4} = 17; b=3 (11b) to odd
    // bits {1,3} = 10
    assert(ZOrder.interleave(5L, 3L) == 27L)
    assert(ZOrder.interleave(0L, 0L) == 0L)
    assert(ZOrder.interleave(0xffffffffL, 0L) == 0x5555555555555555L)
    assert(ZOrder.interleave(0L, 0xffffffffL) == 0xaaaaaaaaaaaaaaaaL)
    intercept[IllegalArgumentException](ZOrder.interleave(-1L, 0L))
    intercept[IllegalArgumentException](ZOrder.interleave(0L, 1L << 32))
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val viaSql = Seq((5L, 3L)).toDF("a", "b")
      .selectExpr("graft_zorder(a, b)").head.getLong(0)
    assert(viaSql == 27L)
  }

  private def writeLayouts(): (String, String, Long) = {
    val trades = Tables.trades(spark, sf)
    val zoned = tmpDir("graft-zoned")
    Store.writeTradesZoned(trades, zoned, files = 8)
    // the contrast layout: same file count, ts-sorted (the linear
    // store's discipline) with the SAME zone-map index over it
    val linear = tmpDir("graft-linear")
    Store.deleteRecursivelyIfExists(linear)
    // same stats-bearing timestamp encoding the zoned writer forces —
    // the comparison must isolate LAYOUT, not INT96's missing stats
    val tsTypeKey = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.getOption(tsTypeKey)
    spark.conf.set(tsTypeKey, "TIMESTAMP_MICROS")
    try trades.repartitionByRange(8, col("ts"))
      .sortWithinPartitions("ts", "symbol", "trade_id")
      .write.mode("overwrite").parquet(linear)
    finally prev match {
      case Some(v) => spark.conf.set(tsTypeKey, v)
      case None => spark.conf.unset(tsTypeKey)
    }
    ZoneMap.build(spark, linear, Seq("ts", "symbol"))
    val anchor = Tables.anchorMicros(spark, sf)
    (zoned, linear, anchor)
  }

  test("zoned store: pruned reads equal full-scan reads; both dims prune") {
    val (zoned, linear, anchor) = writeLayouts()
    val day = 86400L * 1000000L
    val tsWin = (anchor - 20 * day, anchor - 10 * day)
    val all = ZoneMap.prunedFiles(spark, zoned)
    assert(all.size == 8, s"expected 8 zoned files, got ${all.size}")

    // correctness: zone-pruned read ≡ full-scan filtered read, per
    // predicate shape
    def fullScan(sym: Option[(String, String)],
                 ts: Option[(Long, Long)]) = {
      val base = spark.read.parquet(zoned)
      val t = ts.map { case (l, h) =>
        col("ts") >= lit(Tables.microsToTimestamp(l)) &&
          col("ts") <= lit(Tables.microsToTimestamp(h))
      }.getOrElse(lit(true))
      val s = sym.map { case (l, h) =>
        col("symbol") >= l && col("symbol") <= h
      }.getOrElse(lit(true))
      base.where(t && s)
    }
    for (
      (sym, ts) <- Seq(
        (Some(("purchase", "purchase")), None),
        (None, Some(tsWin)),
        (Some(("purchase", "purchase")), Some(tsWin)),
        (Some(("zzz", "zzzz")), None))
    ) {
      val pruned = Store.readTradesZoned(spark, zoned, ts, sym)
        .agg(count(lit(1)), coalesce(sum(col("trade_id")), lit(0L))).head
      val full = fullScan(sym, ts)
        .agg(count(lit(1)), coalesce(sum(col("trade_id")), lit(0L))).head
      assert(pruned == full, s"pruned read diverged for ($sym, $ts)")
    }

    // the measured claim: symbol predicate prunes files on the
    // z-ordered layout only; ts predicate prunes on both
    val symZ = ZoneMap.prunedFiles(spark, zoned,
      strs = Seq(ZoneMap.StrRange("symbol", Some("purchase"), Some("purchase"))))
    val symL = ZoneMap.prunedFiles(spark, linear,
      strs = Seq(ZoneMap.StrRange("symbol", Some("purchase"), Some("purchase"))))
    assert(symZ.size <= 4,
      s"z-order: symbol envelope should keep ≤ half the files, kept ${symZ.size}")
    assert(symL.size == 8,
      s"ts-sorted layout cannot prune on symbol, kept ${symL.size}")
    // the z trade-off, stated precisely: 8 files = 3 z bits, so ts
    // keeps ONE discriminating bit (the interleave gives the other two
    // to symbol) — a window inside one ts half prunes, while one
    // straddling the global midpoint overlaps every file at this
    // granularity (more files = more bits back; the ts-sorted layout
    // keeps full leading-dim resolution and zero symbol resolution)
    val earlyWin = (anchor - 27 * day, anchor - 17 * day)
    val tsZ = ZoneMap.prunedFiles(spark, zoned,
      longs = Seq(ZoneMap.LongRange("ts", Some(earlyWin._1), Some(earlyWin._2))))
    val tsL = ZoneMap.prunedFiles(spark, linear,
      longs = Seq(ZoneMap.LongRange("ts", Some(earlyWin._1), Some(earlyWin._2))))
    assert(tsZ.size < 8, s"z-order keeps ${tsZ.size} files for a half-local window")
    assert(tsL.size < 8, s"ts-sort keeps ${tsL.size} files for a half-local window")

    // disjoint symbol range proves empty without touching data
    val none = ZoneMap.prunedFiles(spark, zoned,
      strs = Seq(ZoneMap.StrRange("symbol", Some("zzz"), Some("zzzz"))))
    assert(none.isEmpty)
  }

  test("registered query: the zoned scan reads fewer files than the store") {
    val df = graft.queries.TradeQueries.zonedScan.run(spark, sf)
    // collect THIS DataFrame (1 row): scan metrics live on its own
    // QueryExecution — a write would plan a fresh one with zeroed metrics
    df.collect()
    val scans = graft.store.ScanStats.of(df)
    // one data-bearing scan (the zone-pruned file set) — the store has
    // 8 files; symbol+ts bounds must have removed some BEFORE the scan
    val dataScan = scans.filter(_.files > 0)
    assert(dataScan.nonEmpty)
    assert(dataScan.map(_.files).max < 8,
      s"zone map pruned nothing: ${scans.map(_.files)}")
  }

  test("append: same curve, incremental index, unseen symbols stay findable") {
    val trades = Tables.trades(spark, sf)
    val dir = tmpDir("graft-zapp")
    Store.writeTradesZoned(trades, dir, files = 4)
    val before = ZoneMap.prunedFiles(spark, dir).size
    // a later batch: remapped ids, one symbol the dictionary has never
    // seen, some ts past the original upper bound (clamp path)
    val batch = trades.where(pmod(col("trade_id"), lit(10)) === 3)
      .withColumn("trade_id", col("trade_id") + lit(10000000L))
      .withColumn("symbol",
        when(pmod(col("trade_id"), lit(7)) === 0, lit("newcoin"))
          .otherwise(col("symbol")))
      .withColumn("ts", col("ts") + expr("INTERVAL 40 DAYS"))
    Store.appendTradesZoned(batch, dir, files = 2)
    val after = ZoneMap.prunedFiles(spark, dir)
    // index covers exactly the data files, old entries kept + new added
    assert(after.size == before + 2, s"index files: $before -> ${after.size}")
    // full read = base + appended rows
    val total = spark.read.parquet(dir).count()
    assert(total == trades.count() + batch.count())
    // the unseen symbol is findable through the pruned path and the
    // prune is selective (newcoin lives only in appended files)
    val nc = Store.readTradesZoned(spark, dir,
      symbols = Some(("newcoin", "newcoin")))
    val ncFull = spark.read.parquet(dir)
      .where(col("symbol") === "newcoin")
    assert(nc.count() == ncFull.count() && nc.count() > 0)
    // conservative pruning claim: "newcoin" sorts inside ['click',
    // 'view'], so base-file envelopes spanning that range legitimately
    // stay — but files whose envelope excludes 'n*' must go
    val ncFiles = ZoneMap.prunedFiles(spark, dir,
      strs = Seq(ZoneMap.StrRange("symbol", Some("newcoin"), Some("newcoin"))))
    assert(ncFiles.size < after.size,
      s"newcoin probe pruned nothing: ${ncFiles.size}/${after.size}")

    // far-future append, ~5.2 years past the curve's upper bound: the
    // ts delta × 65535 exceeds Long.MaxValue, so multiply-first bucket
    // arithmetic would wrap negative and crash the interleave — the
    // clamp must run BEFORE the multiply, landing these rows at the
    // curve edge (bucket 65535) with honest footer stats
    val far = trades.where(pmod(col("trade_id"), lit(97)) === 5)
      .withColumn("trade_id", col("trade_id") + lit(30000000L))
      .withColumn("ts", col("ts") + expr("INTERVAL 1900 DAYS"))
    Store.appendTradesZoned(far, dir, files = 1)
    assert(spark.read.parquet(dir).count() == total + far.count())
    // the clamped rows stay findable through the zone-pruned path
    val fb = far.agg(min(unix_micros(col("ts"))),
      max(unix_micros(col("ts")))).head()
    val farRead = Store.readTradesZoned(spark, dir,
      tsMicros = Some((fb.getLong(0), fb.getLong(1))))
    assert(farRead.count() == far.count())
  }

  test("compaction: refit curve, exact rows, tighter envelopes, " +
    "crash-safe swap") {
    val trades = Tables.trades(spark, sf)
    val dir = tmpDir("graft-zcomp")
    Store.writeTradesZoned(trades, dir, files = 4)
    // two appends degrade the store the way ingest does: extra file
    // slices + rows clamped to the curve edge (unseen symbol, late ts)
    def batch(offset: Long) = trades
      .where(pmod(col("trade_id"), lit(10)) === 3)
      .withColumn("trade_id", col("trade_id") + lit(offset))
      .withColumn("symbol",
        when(pmod(col("trade_id"), lit(7)) === 0, lit("newcoin"))
          .otherwise(col("symbol")))
      .withColumn("ts", col("ts") + expr("INTERVAL 40 DAYS"))
    Store.appendTradesZoned(batch(10000000L), dir, files = 2)
    Store.appendTradesZoned(batch(20000000L), dir, files = 2)
    val degraded = ZoneMap.prunedFiles(spark, dir).size
    assert(degraded == 8, s"expected 4+2+2 files, got $degraded")
    val rows = spark.read.parquet(dir).count()
    val idSum = spark.read.parquet(dir)
      .agg(sum(col("trade_id"))).head.getLong(0)

    Store.compactTradesZoned(spark, dir, files = 4)
    // file count restored, every row carried over exactly once
    val after = ZoneMap.prunedFiles(spark, dir)
    assert(after.size == 4, s"compaction left ${after.size} files")
    assert(spark.read.parquet(dir).count() == rows)
    assert(spark.read.parquet(dir)
      .agg(sum(col("trade_id"))).head.getLong(0) == idSum)
    // the REFIT curve: the once-clamped symbol now has a dictionary
    // slot, so its probe prunes the rebuilt (smaller) file set too
    val meta = spark.read.parquet(s"$dir/_zonemeta").head
    assert(meta.getSeq[String](3).contains("newcoin"),
      "compaction did not refit the symbol dictionary")
    val ncFiles = ZoneMap.prunedFiles(spark, dir,
      strs = Seq(ZoneMap.StrRange("symbol", Some("newcoin"), Some("newcoin"))))
    assert(ncFiles.size < after.size,
      s"newcoin probe pruned nothing post-compaction: ${ncFiles.size}/4")
    // pruned read ≡ full scan through the rebuilt index
    val nc = Store.readTradesZoned(spark, dir,
      symbols = Some(("newcoin", "newcoin"))).count()
    val ncFull = spark.read.parquet(dir)
      .where(col("symbol") === "newcoin").count()
    assert(nc == ncFull && nc > 0)

    // crash recovery: a swap that died between its two renames leaves
    // only .old_<store> — the next compaction repairs it, then runs
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.move(p, p.resolveSibling(".old_" + p.getFileName))
    Store.compactTradesZoned(spark, dir, files = 3)
    assert(spark.read.parquet(dir).count() == rows)
    assert(ZoneMap.prunedFiles(spark, dir).size == 3)
  }

  test("SQL surface: graft_zoned_trades prunes and matches the full scan") {
    graft.functions.GraftFunctions.register(spark)
    val trades = Tables.trades(spark, sf)
    val dir = tmpDir("graft-zsql")
    Store.writeTradesZoned(trades, dir, files = 8)
    val viaSql = spark.sql(
      s"""SELECT symbol, count(*) AS n
         |FROM graft_zoned_trades('$dir', 'purchase', 'purchase', '', '')
         |GROUP BY symbol ORDER BY symbol""".stripMargin).collect().toSeq
    val viaScan = spark.read.parquet(dir)
      .where(col("symbol") === "purchase")
      .groupBy("symbol").agg(count(lit(1)).as("n"))
      .orderBy("symbol").collect().toSeq
    assert(viaSql == viaScan)
    // both-or-neither bound contract
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_zoned_trades('$dir', 'a', '', '', '')"))
    assert(e.getMessage.contains("both"))
    // bad timestamp surfaces the helpful error, not a parse stacktrace
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_zoned_trades('$dir', '', '', 'yesterday', 'now')"))
    assert(e2.getMessage.contains("ISO-8601"))
  }

  test("zoned write round-trips every row exactly once") {
    val trades = Tables.trades(spark, sf)
    val dir = tmpDir("graft-zrt")
    Store.writeTradesZoned(trades, dir, files = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == trades.count())
    assert(back.select("trade_id").distinct().count() ==
      trades.select("trade_id").distinct().count())
  }
}

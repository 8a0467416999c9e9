package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.store.Store

/** Storage layout & lifecycle (SURVEY.md §7.2-5): partitioned+sorted
  * round trip with visible partition pruning, month-granular TTL
  * retention, and the checksummed idempotent migration runner. */
class StoreSpec extends SparkSpec {
  import spark.implicits._

  private def mkTrades(months: Seq[String]) = {
    val rows = months.zipWithIndex.flatMap { case (m, mi) =>
      (1 to 10).map(i =>
        ("BTC", (mi * 100 + i).toLong, 100.0 + i, 1.0,
          java.sql.Timestamp.valueOf(s"$m-15 00:0${i % 6}:0${i % 10}")))
    }
    rows.toDF("symbol", "trade_id", "price", "qty", "ts")
  }

  test("partitioned+sorted write → month dirs exist, data round-trips") {
    val path = tmpDir("store-rt")
    val trades = mkTrades(Seq("2024-01", "2024-02", "2024-03"))
    Store.writeTrades(trades, path, SaveMode.Overwrite)

    val dirs = Files.list(Paths.get(path)).iterator()
    val partDirs = Iterator.continually(dirs)
      .takeWhile(_.hasNext).map(_.next().getFileName.toString)
      .filter(_.startsWith("month=")).toSet
    assert(partDirs == Set("month=202401", "month=202402", "month=202403"))

    val back = Store.readTrades(spark, path)
    assert(back.count() == 30)
    assert(back.select("month").distinct().count() == 3)
  }

  test("month filter prunes partitions down to one directory's files") {
    val path = tmpDir("store-prune")
    Store.writeTrades(mkTrades(Seq("2024-01", "2024-02", "2024-03")), path,
      SaveMode.Overwrite)
    val pruned = Store.readTrades(spark, path)
      .where(col("month") === "202402")
    // partition pruning: only files under month=202402 feed the scan
    val files = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("month=202402")))
    assert(pruned.count() == 10)
  }

  test("windowed read-since prunes: scan metrics show fewer files+bytes") {
    // the hot-path contract, measured from the EXECUTED plan's scan
    // metrics rather than the explain string: a readTradesSince window
    // landing in the last month must read only that month's files
    val path = tmpDir("store-scan-metrics")
    Store.writeTrades(mkTrades(Seq("2024-01", "2024-02", "2024-03")), path,
      SaveMode.Overwrite)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("symbol").agg(count(lit(1)))
    val full = agg(Store.readTrades(spark, path))
    full.collect()
    val (allFiles, allBytes) = graft.store.ScanStats.totals(full)
    // window cutoff inside March: months 01/02 must be pruned
    val sinceUs = java.sql.Timestamp.valueOf("2024-03-10 00:00:00")
      .getTime * 1000L
    val windowed = agg(Store.readTradesSince(spark, path, sinceUs))
    windowed.collect()
    val (winFiles, winBytes) = graft.store.ScanStats.totals(windowed)
    assert(allFiles >= 3, s"expected >=3 files across months, got $allFiles")
    assert(winFiles * 3 <= allFiles,
      s"window read $winFiles of $allFiles files — partitions not pruned")
    assert(winBytes < allBytes,
      s"window read $winBytes of $allBytes bytes — no scan reduction")
  }

  test("every physical file is sorted on ts (row-group stats stay sparse)") {
    val path = tmpDir("store-sorted")
    Store.writeTrades(mkTrades(Seq("2024-01")), path, SaveMode.Overwrite)
    // each writer task emits a sorted run → every FILE must be internally
    // sorted (that per-file order is what makes parquet min/max stats
    // selective; cross-file order is irrelevant to skipping)
    val perFile = spark.read.parquet(path + "/month=202401")
      .select(input_file_name().as("f"), col("ts"))
      .collect()
      .groupBy(_.getString(0))
      .values.map(_.map(_.getTimestamp(1).getTime).toSeq)
    assert(perFile.nonEmpty)
    perFile.foreach(tss => assert(tss == tss.sorted))
  }

  test("writersPerMonth > 1 spreads a month over multiple sorted files, " +
    "same data") {
    val path1 = tmpDir("store-w1")
    val pathN = tmpDir("store-wN")
    val trades = mkTrades(Seq("2024-01"))
    Store.writeTrades(trades, path1, SaveMode.Overwrite)
    Store.writeTrades(trades, pathN, SaveMode.Overwrite, writersPerMonth = 4)
    def files(p: String) = new java.io.File(p + "/month=202401")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files(path1).length == 1, "baseline should write one file")
    assert(files(pathN).length > 1 && files(pathN).length <= 4,
      s"expected 2-4 files from writersPerMonth=4, got ${files(pathN).length}")
    // every file still internally ts-sorted (row-group stats contract)
    files(pathN).foreach { f =>
      val tss = spark.read.parquet(f.getPath).select("ts")
        .collect().map(_.getTimestamp(0).getTime).toSeq
      assert(tss == tss.sorted, s"${f.getName} lost its sort")
    }
    // identical table content either way
    val a = Store.readTrades(spark, path1).drop("ingested_at")
      .collect().map(_.toString).sorted.toSeq
    val b = Store.readTrades(spark, pathN).drop("ingested_at")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("monthsBetween spans calendar months inclusively") {
    def us(s: String) =
      java.sql.Timestamp.valueOf(s).getTime * 1000L
    assert(Store.monthsBetween(us("2023-11-03 00:00:00"),
      us("2024-02-10 00:00:00"), Store.sessionZone(spark)) ==
      Seq("202311", "202312", "202401", "202402"))
  }

  test("month keys follow the session zone (writer/reader agreement)") {
    // 2024-02-01T02:00Z is January in New York — the reader-side key
    // derivation must agree with whatever zone the session (and thus the
    // date_format writer) uses, never hard-coded UTC
    val us = java.time.Instant.parse("2024-02-01T02:00:00Z")
      .toEpochMilli * 1000L
    assert(Store.monthKeyOf(us, java.time.ZoneOffset.UTC) == "202402")
    assert(Store.monthKeyOf(us,
      java.time.ZoneId.of("America/New_York")) == "202401")
    assert(Store.monthKeyOf(us, Store.sessionZone(spark)) == "202402") // UTC session
  }

  test("monthLowerBound holds under ANY writer/reader zone pair") {
    // the extreme real offsets: UTC+14 (Kiritimati) and UTC-12
    val zones = Seq("Etc/GMT+12", "UTC", "Pacific/Kiritimati")
      .map(java.time.ZoneId.of)
    // bounds straddling a month boundary at sub-margin distances
    val bounds = Seq(
      "2024-01-31T10:00:00Z", "2024-01-31T23:59:59Z", "2024-02-01T00:00:00Z",
      "2024-02-01T13:00:00Z", "2024-02-02T04:00:00Z", "2024-02-15T00:00:00Z")
      .map(java.time.Instant.parse(_).toEpochMilli * 1000L)
    for (w <- zones; r <- zones; x <- bounds) {
      // monotonicity of yyyyMM in ts makes ts == X the worst case:
      // every row passing `ts >= X` must land in a partition the
      // derived bound keeps
      assert(Store.monthKeyOf(x, w) >= Store.monthLowerBound(x, r),
        s"writer=$w reader=$r bound=$x")
    }
  }

  test("retention drops only fully-expired month partitions") {
    val path = tmpDir("store-ttl")
    Store.writeTrades(mkTrades(Seq("2023-10", "2023-11", "2024-02")), path,
      SaveMode.Overwrite)
    val asOf = java.sql.Timestamp.valueOf("2024-02-20 00:00:00").getTime * 1000L
    val dropped = Store.retention(spark, path, asOf, retainDays = 90)
    // cutoff = 2023-11-22 → month 202311 is NOT fully expired, only 202310 is
    assert(dropped == Seq("month=202310"))
    val left = Store.readTrades(spark, path)
    assert(left.select("month").distinct().collect()
      .map(_.getString(0)).toSet == Set("202311", "202402"))
  }

  test("retention recovers a crashed compaction, then expires the month") {
    // a month whose only copy is stuck under .old_month= (compaction
    // died mid-swap) must still be expirable — otherwise the TTL can
    // never fire for it (the compliance failure mode)
    val path = tmpDir("store-ttl-crash")
    Store.writeTrades(mkTrades(Seq("2023-10", "2024-02")), path,
      SaveMode.Overwrite)
    Files.move(Paths.get(path + "/month=202310"),
      Paths.get(path + "/.old_month=202310"))
    // an ABANDONED staging dir (older than the reap grace period) is
    // garbage; a FRESH one may be a live compaction's work-in-progress
    // and must survive the sweep
    Files.createDirectory(Paths.get(path + "/.stage_month=202310"))
    Files.setLastModifiedTime(Paths.get(path + "/.stage_month=202310"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2L * 60 * 60 * 1000))
    Files.createDirectory(Paths.get(path + "/.stage_month=202402"))
    val asOf = java.sql.Timestamp.valueOf("2024-02-20 00:00:00").getTime * 1000L
    val dropped = Store.retention(spark, path, asOf, retainDays = 90)
    assert(dropped == Seq("month=202310"))
    assert(!Files.exists(Paths.get(path + "/.old_month=202310")))
    assert(!Files.exists(Paths.get(path + "/.stage_month=202310")),
      "stale staging dir should be reaped")
    assert(Files.exists(Paths.get(path + "/.stage_month=202402")),
      "fresh staging dir (possibly a live compaction) must survive")
    Store.deleteRecursively(Paths.get(path + "/.stage_month=202402"))
    // a NON-expired month stuck the same way is recovered, not dropped
    val p2 = tmpDir("store-ttl-crash2")
    Store.writeTrades(mkTrades(Seq("2024-02")), p2, SaveMode.Overwrite)
    Files.move(Paths.get(p2 + "/month=202402"),
      Paths.get(p2 + "/.old_month=202402"))
    assert(Store.retention(spark, p2, asOf, retainDays = 90).isEmpty)
    assert(Store.readTrades(spark, p2).count() == 10,
      "recovered month should be readable again")
  }

  test("migrate interrupted mid-apply fails stop on the next run") {
    val wh = tmpDir("store-mig-crash")
    var applies = 0
    val boom = Store.Migration(1, "v1", "create a", _ => {
      applies += 1
      throw new RuntimeException("died mid-apply")
    })
    intercept[RuntimeException] { Store.migrate(spark, wh, Seq(boom)) }
    assert(applies == 1)
    // the intent line is on disk; whether apply's side effects landed is
    // unknowable — the next run must refuse to silently re-apply
    val benign = Store.Migration(1, "v1", "create a", _ => applies += 1)
    val e = intercept[IllegalStateException] {
      Store.migrate(spark, wh, Seq(benign))
    }
    assert(e.getMessage.contains("interrupted mid-apply"))
    assert(applies == 1, "interrupted migration must not silently re-run")
  }

  test("migrate applies in order once, records manifest, refuses drift") {
    val wh = tmpDir("store-mig")
    var log = List.empty[Int]
    def mig(v: Int, body: String) =
      Store.Migration(v, s"v$v", body, _ => log = log :+ v)

    val ms = Seq(mig(2, "create b"), mig(1, "create a"))
    assert(Store.migrate(spark, wh, ms) == Seq(1, 2)) // version order
    assert(log == List(1, 2))
    assert(Store.migrate(spark, wh, ms).isEmpty)      // idempotent
    assert(log == List(1, 2))

    // drifted body for an applied version → refusal
    val drifted = Seq(mig(1, "create a CHANGED"))
    intercept[IllegalStateException] {
      Store.migrate(spark, wh, drifted)
    }
  }

  test("compactMonth rewrites a partition to one sorted file") {
    val path = tmpDir("store-compact")
    // two appends → ≥2 files in the month dir
    Store.writeTrades(mkTrades(Seq("2024-01")), path)
    Store.writeTrades(mkTrades(Seq("2024-01")), path)
    val before = Files.list(Paths.get(path + "/month=202401")).iterator()
    val nBefore = Iterator.continually(before).takeWhile(_.hasNext)
      .map(_.next()).count(_.getFileName.toString.endsWith(".parquet"))
    assert(nBefore >= 2)

    Store.compactMonth(spark, path, "202401")
    val after = Files.list(Paths.get(path + "/month=202401")).iterator()
    val nAfter = Iterator.continually(after).takeWhile(_.hasNext)
      .map(_.next()).count(_.getFileName.toString.endsWith(".parquet"))
    assert(nAfter == 1)
    val back = spark.read.parquet(path + "/month=202401")
    assert(back.count() == 20)
    val tss = back.select("ts").collect().map(_.getTimestamp(0).getTime).toSeq
    assert(tss == tss.sorted)
  }

  test("compactMonth recovers from both mid-swap crash windows") {
    // window 1: crashed between the two moves — the month's only copy
    // sits under the dot-prefixed name Spark readers ignore
    val p1 = tmpDir("store-compact-crash1")
    Store.writeTrades(mkTrades(Seq("2024-01")), p1)
    Files.move(Paths.get(p1 + "/month=202401"),
      Paths.get(p1 + "/.old_month=202401"))
    // the loss scenario: the store is now unreadable (readTrades can't
    // even infer a schema — no visible partition remains)
    intercept[Exception] { Store.readTrades(spark, p1).count() }
    Store.compactMonth(spark, p1, "202401")
    assert(Store.readTrades(spark, p1).count() == 10,
      "mid-swap crash left the partition invisible")

    // window 2: crashed after the swap, before cleanup — stale .old dir
    // must not make every future compaction of the month fail
    val p2 = tmpDir("store-compact-crash2")
    Store.writeTrades(mkTrades(Seq("2024-01")), p2)
    Store.writeTrades(mkTrades(Seq("2024-01")), p2)
    Files.createDirectory(Paths.get(p2 + "/.old_month=202401"))
    Store.compactMonth(spark, p2, "202401")
    assert(!Files.exists(Paths.get(p2 + "/.old_month=202401")))
    assert(Store.readTrades(spark, p2).count() == 20)
  }

  test("bootstrap migrations create the warehouse layout idempotently") {
    val wh = tmpDir("store-boot")
    assert(graft.store.Bootstrap(spark, wh) == Seq(1, 2))
    assert(Files.exists(Paths.get(s"$wh/trades")))
    assert(Files.exists(Paths.get(s"$wh/trades_1m")))
    assert(graft.store.Bootstrap(spark, wh).isEmpty) // second run: no-op
    // the EMPTY bootstrapped table must be readable (schema manifest) ...
    val empty = Store.readTrades(spark, s"$wh/trades")
    assert(empty.count() == 0)
    assert(empty.columns.contains("symbol") && empty.columns.contains("month"))
    // ... and stays readable once real data lands
    Store.writeTrades(mkTrades(Seq("2024-01")), s"$wh/trades")
    assert(Store.readTrades(spark, s"$wh/trades").count() == 10)
    // the empty candle-partials table is readable too (V2 manifest)
    val candles = Store.readTable(spark, s"$wh/trades_1m")
    assert(candles.count() == 0)
    assert(candles.columns.toSeq.contains("open_ts") &&
      candles.columns.toSeq.contains("block"))
  }

  test("windowed read prunes partitions AND pushes the ts filter") {
    val path = tmpDir("store-window")
    Store.writeTrades(mkTrades(Seq("2024-01", "2024-02", "2024-03")), path,
      SaveMode.Overwrite)
    val sinceUs =
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00").getTime * 1000L
    val df = Store.readTradesSince(spark, path, sinceUs)
    // only Feb+Mar files feed the scan
    val files = df.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(f =>
      f.contains("month=202402") || f.contains("month=202403")))
    assert(df.count() == 20)
    // and the ts literal is a pushed filter on the surviving files
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("GreaterThanOrEqual(ts,"))
  }

  test("candles over the partitioned store match candles over the source") {
    val path = tmpDir("store-roundtrip-q")
    val src = Tables.trades(spark, "/root/testdata/sf0.001")
    Store.writeTrades(src, path, SaveMode.Overwrite)
    val fromStore = graft.streaming.CandlePipeline
      .candles(Store.readTrades(spark, path).drop("month", "ingested_at"))
      .orderBy("minute", "symbol").collect().map(_.toString).toSeq
    val direct = graft.streaming.CandlePipeline
      .candles(src)
      .orderBy("minute", "symbol").collect().map(_.toString).toSeq
    assert(fromStore == direct && fromStore.nonEmpty)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val li = (1 to 2000).map(i => (i.toLong % 500, i.toLong, i * 1.5))
      .toDF("l_orderkey", "l_id", "l_price")
    val o = (1 to 500).map(i => (i.toLong, s"o$i")).toDF("o_orderkey", "o_tag")
    Store.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Store.writeBucketed(o, "b_orders", "o_orderkey", 8)

    // disable auto-broadcast so the test exercises the bucketed
    // sort-merge path (at scale both sides are too big to broadcast)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: neither side may need a hash-partitioning exchange
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 2000 - 4) // key 0 never matches (1..500)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("catalog probe sees registered views") {
    mkTrades(Seq("2024-01")).createOrReplaceTempView("probe_trades")
    assert(Store.tableExists(spark, "probe_trades"))
    assert(!Store.tableExists(spark, "no_such_table"))
  }

  test("the scratch-store sweep removes a dead store's maintenance " +
    "sidecars with it, not just the store dir") {
    // regression: compact/expire on a scratch store writes `.lease_`/
    // `.epoch_` sidecars NEXT TO it; sweeping only the store dir leaked
    // one sidecar set per store-building query run — dozens of files
    // per bench capture, unbounded across rounds.
    import java.nio.file.{Files, Paths}
    val sub = s"sweeptest-${java.util.UUID.randomUUID()}"
    val d1 = Store.scratchStore(sub)
    val p1 = Paths.get(d1)
    val name = p1.getFileName.toString
    val parent = p1.getParent
    Files.writeString(parent.resolve(s".epoch_$name"), "3\n")
    Files.writeString(parent.resolve(s".lease_$name"), "3 x 0\n")
    Files.createDirectories(parent.resolve(s".stage_${name}_crashed"))
    // age the store past ScratchMinAgeMs so the next sweeps may reap it
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - Store.ScratchMinAgeMs - 60000L)
    Files.setLastModifiedTime(p1, old)
    // keep-2: d1 leaves the kept window at the third allocation
    Store.scratchStore(sub)
    Store.scratchStore(sub)
    assert(!Files.exists(p1), "aged store dir was not swept")
    val leftovers = {
      val s = Files.list(parent)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.contains(name)).toList
      } finally s.close()
    }
    assert(leftovers.isEmpty, s"sidecars survived the sweep: $leftovers")
  }
}

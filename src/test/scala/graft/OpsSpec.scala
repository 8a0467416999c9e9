package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Ops

/** Unit coverage for the column-operator library (SURVEY.md §2/§5-2):
  * ClickHouse edge semantics — sumIf over an empty match set, VWAP null
  * on zero volume, candle field selection — on hand-computed fixtures. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // 6 trades across 2 minutes, 1 symbol — hand-computable candles.
  private lazy val trades = Seq(
    // (symbol, trade_id, price, qty, ts, is_buyer_maker)
    ("BTC", 1L, 100.0, 1.0, ts("2024-01-01 00:00:05"), 0),
    ("BTC", 2L, 110.0, 2.0, ts("2024-01-01 00:00:20"), 1),
    ("BTC", 3L, 90.0, 1.5, ts("2024-01-01 00:00:50"), 0),
    ("BTC", 4L, 120.0, 0.5, ts("2024-01-01 00:01:10"), 1),
    ("BTC", 5L, 115.0, 1.0, ts("2024-01-01 00:01:30"), 1),
    ("BTC", 6L, 105.0, 2.0, ts("2024-01-01 00:01:55"), 0)
  ).toDF("symbol", "trade_id", "price", "qty", "ts", "is_buyer_maker")

  test("ohlcvAggs computes the hand-checked candle per minute") {
    val rows = Ops.aggSeq(
      trades.groupBy(Ops.minuteOf(col("ts")).as("minute")),
      Ops.ohlcvAggs(col("price"), col("qty"), col("ts")))
      .orderBy("minute").collect()
    assert(rows.length == 2)
    val m0 = rows(0)
    assert(m0.getAs[Double]("open") == 100.0)   // price at min ts
    assert(m0.getAs[Double]("high") == 110.0)
    assert(m0.getAs[Double]("low") == 90.0)
    assert(m0.getAs[Double]("close") == 90.0)   // price at max ts
    assert(m0.getAs[Double]("volume") == 4.5)
    assert(m0.getAs[Long]("trades") == 3L)
    val m1 = rows(1)
    assert(m1.getAs[Double]("open") == 120.0)
    assert(m1.getAs[Double]("close") == 105.0)
    assert(m1.getAs[Double]("volume") == 3.5)
  }

  test("sumIf returns 0 (not null) on an empty match set — CH semantics") {
    val r = trades
      .agg(Ops.sumIf(col("qty"), col("price") > 99999).as("s"))
      .collect()(0)
    assert(!r.isNullAt(0) && r.getDouble(0) == 0.0)
  }

  test("sumIf sums only matching rows") {
    val r = trades
      .agg(Ops.sumIf(col("qty"), col("is_buyer_maker") === 0).as("s"))
      .collect()(0)
    assert(r.getDouble(0) == 1.0 + 1.5 + 2.0)
  }

  test("vwap is null on zero matched volume, weighted mean otherwise") {
    val r = trades.agg(
      Ops.vwap(col("price"), col("qty"), col("price") > 99999).as("none"),
      Ops.vwap(col("price"), col("qty"), col("is_buyer_maker") === 1).as("sell"))
      .collect()(0)
    assert(r.isNullAt(0))
    val expected = (110.0 * 2 + 120.0 * 0.5 + 115.0 * 1) / (2 + 0.5 + 1)
    assert(math.abs(r.getDouble(1) - expected) < 1e-9)
  }

  test("dsum is null on empty input, dsum0 is 0") {
    val empty = trades.where(col("price") < 0)
    val r = empty.agg(Ops.dsum(col("qty")).as("a"), Ops.dsum0(col("qty")).as("b"))
      .collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 0.0)
  }

  test("minuteOf truncates to minute starts, monthKey formats yyyyMM") {
    val r = trades.select(
      Ops.minuteOf(col("ts")).as("m"), Ops.monthKey(col("ts")).as("k"))
      .distinct().orderBy("m").collect()
    assert(r.map(_.getAs[Timestamp]("m")).toSeq ==
      Seq(ts("2024-01-01 00:00:00"), ts("2024-01-01 00:01:00")))
    assert(r.forall(_.getAs[String]("k") == "202401"))
  }

  test("dedupLatest keeps exactly the newest version per key") {
    val df = Seq(
      ("k1", 1, "old"), ("k1", 3, "new"), ("k1", 2, "mid"),
      ("k2", 5, "only")
    ).toDF("k", "v", "tag")
    val out = Ops.dedupLatest(df, Seq("k"), "v")
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("k1", "new"), ("k2", "only")))
  }

  test("dedupLatest is idempotent and absorbs full replays") {
    val base = Seq(("a", 1, 1.0), ("b", 1, 2.0)).toDF("k", "ver", "x")
    val replayed = base.union(base.withColumn("ver", col("ver") + 1))
    val once = Ops.dedupLatest(replayed, Seq("k"), "ver")
    val twice = Ops.dedupLatest(once, Seq("k"), "ver")
    assert(once.count() == 2 && twice.count() == 2)
    assert(once.agg(Ops.dsum(col("x"))).collect()(0).getDouble(0) == 3.0)
  }

  test("sumFloat0 is order/partition-insensitive on full-precision doubles") {
    // values with binary garbage in every bit — plain double summation
    // over these drifts with association order; the shortest-repr
    // decimal route must not
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(500)((rnd.nextDouble() - 0.5) * 1e6)
    def total(seq: Seq[Double], parts: Int): Double =
      seq.toDF("x").repartition(parts)
        .agg(Ops.sumFloat0(col("x"))).collect()(0).getDouble(0)
    val ref = total(xs, 1)
    for (parts <- Seq(3, 13)) {
      assert(total(rnd.shuffle(xs), parts) == ref,
        s"sumFloat0 drifted at parts=$parts")
    }
  }

  test("cents fast path == general Money spelling on exact-2-dp inputs") {
    // the narrow (12,2)×(4,2) casts must be VALUE-identical to the
    // (18,6)×(18,6) spelling whenever inputs are exact 2-dp money —
    // including doubles that are epsilon away from their 2-dp value
    // (every 2-dp non-dyadic double is), negatives, and magnitudes up
    // to the TPC-H price range
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(4000)((
      math.round((rnd.nextDouble() - 0.3) * 1e7) / 100.0, // price ±1e5, 2 dp
      1.0 - math.round(rnd.nextDouble() * 10.0) / 100.0   // 1 - discount grid
    ))
    val df = rows.toDF("a", "b").repartition(7)
    val out = df.agg(
      Ops.dsumProd(col("a"), col("b")).as("general"),
      Ops.dsumProdCents(col("a"), col("b")).as("cents"))
    val r = out.collect()(0)
    assert(r.getDouble(0) == r.getDouble(1),
      s"cents path drifted: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    // split partial+final equals the single-stage spelling too
    val split = df.groupBy((col("a") > 0).as("g"))
      .agg(Ops.dsumProdPartialCents(col("a"), col("b")).as("p"))
      .agg(Ops.decFinal(col("p")).as("v")).collect()(0).getDouble(0)
    assert(split == r.getDouble(0),
      s"split cents path drifted: $split vs ${r.getDouble(0)}")
  }

  test("sumFloat0 is 0 on an empty match set — CH sum semantics") {
    val df = Seq(1.5, -2.5).toDF("x")
    val out = df.agg(
      Ops.sumFloat0(when(col("x") > 100, col("x"))).as("none"),
      Ops.sumFloat0(when(col("x") > 0, col("x"))).as("some"))
      .collect()(0)
    assert(out.getDouble(0) == 0.0)
    assert(out.getDouble(1) == 1.5)
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.{DocQueries, EventQueries, TradeQueries}
import graft.ops.Ops

/** Cross-formulation checks for the round-5 sequence/containment queries:
  * each query's registered formulation is re-derived through an
  * independent Spark formulation (fold vs window, window vs pair join,
  * rollup vs direct) so a bug would have to appear identically in two
  * different plans to slip through.
  */
class SeqAnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("drawdown fold == running-max window formulation") {
    val viaFold = TradeQueries.drawdown.run(spark, sf)
      .select("symbol", "n_minutes", "max_drawdown")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)

    val anchor = Tables.anchorMicros(spark, sf)
    val candles = Tables
      .trades(spark, sf, Some(anchor - 240L * 60L * 1000000L))
      .groupBy(col("symbol"), Ops.minuteOf(col("ts")).as("minute"))
      .agg(max_by(col("price"), col("ts")).as("close"))
    val w = Window.partitionBy("symbol").orderBy("minute")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWindow = candles
      .withColumn("peak", max(col("close")).over(w))
      .groupBy("symbol")
      .agg(count(lit(1)).as("n_minutes"),
        max(col("peak") - col("close")).as("max_drawdown"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)

    assert(viaFold.nonEmpty)
    assert(viaFold.toSeq == viaWindow.toSeq)
    viaFold.foreach { case (_, _, mdd) => assert(mdd >= 0.0) }
  }

  test("seq_match window formulation == naive pair-join formulation") {
    val viaWindow = EventQueries.seqMatch.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head

    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("vid"),
        col("ts").as("vts"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("cid"),
        col("ts").as("cts"))
    // a view matches iff ANY click follows it in (ts, event_id) order
    // within 10 min — same predicate the window's earliest-following-click
    // encodes (earliest is in-window iff any is)
    val matchedViews = views.join(clicks,
      col("user_id") === col("cu") &&
        (col("cts") > col("vts") ||
          (col("cts") === col("vts") && col("cid") > col("vid"))) &&
        unix_micros(col("cts")) <= unix_micros(col("vts")) + 600000000L,
      "left_semi")
    val nUsers = ev.select("user_id").distinct().count()
    val nMatchedUsers = matchedViews.select("user_id").distinct().count()
    val nMatchedViews = matchedViews.count()

    assert(viaWindow == ((nUsers, nMatchedUsers, nMatchedViews)))
    assert(viaWindow._2 > 0, "fixture should contain at least one match")
  }

  test("containment bounds: jaccard <= cont <= 1, cont_max is the max") {
    val rows = DocQueries.containment.run(spark, sf)
      .collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, mx) =>
      assert(a > 0.0 && a <= 1.0)
      assert(b > 0.0 && b <= 1.0)
      assert(mx == math.max(a, b))
    }
  }

  test("hourly rollup from minute partials == direct hourly aggregation") {
    val viaRollup = TradeQueries.ohlcv1h.run(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))

    val anchor = Tables.anchorMicros(spark, sf)
    val direct = Ops.aggSeq(
      Tables.trades(spark, sf, Some(anchor - 1440L * 60L * 1000000L))
        .where(col("symbol") === "click")
        .groupBy(date_trunc("hour", col("ts")).as("hour")),
      Ops.ohlcvAggs(col("price"), col("qty"), col("ts")))
      .orderBy("hour").collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))

    assert(viaRollup.nonEmpty)
    assert(viaRollup.toSeq == direct.toSeq)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamJoin

/** Stream-stream interval join: the streaming result must equal the batch
  * inner join with the same predicate, and late rows beyond the watermark
  * must be dropped rather than buffered forever. */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1700000000L // epoch seconds

  /** (user, offset-seconds, value) click fixtures; purchases every 45 min
    * per user. In-window clicks (≤60 min lookback) must attribute, the
    * rest must not. */
  private def clicks: Seq[(Long, Long, Double)] =
    (1L to 4L).flatMap { u =>
      Seq(
        (u, 60L * u, 1.0 + u),          // early click
        (u, 2700L - 300L, 10.0 + u),    // 5 min before first purchase
        (u, 2700L + 1200L, 100.0 + u))  // between purchases
    }

  private def purchases: Seq[(Long, Long)] =
    (1L to 4L).flatMap(u => Seq((u, 2700L), (u, 5400L)))

  private def writeFile(dir: String, name: String, order: Int,
                        rows: Seq[String]): Unit =
    writeOrderedFile(dir, name, order, rows)

  private def clickJson(rows: Seq[(Long, Long, Double)]): Seq[String] =
    rows.map { case (u, off, v) =>
      s"""{"user_id":$u,"ts":${(T0 + off) * 1000000L},"value":$v}"""
    }

  private def purchaseJson(rows: Seq[(Long, Long)]): Seq[String] =
    rows.map { case (u, off) =>
      s"""{"user_id":$u,"ts":${(T0 + off) * 1000000L}}"""
    }

  private def readStreamDir(dir: String, withValue: Boolean): DataFrame = {
    val schema = if (withValue) "user_id LONG, ts LONG, value DOUBLE"
                 else "user_id LONG, ts LONG"
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .json(dir)
      .withColumn("ts", timestamp_micros(col("ts")))
  }

  private def collectJoin(out: String): Set[(Long, Long, Long, Double)] =
    spark.read.parquet(out).collect().map { r =>
      (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("purchase_ts").getTime,
        r.getAs[java.sql.Timestamp]("click_ts").getTime,
        r.getAs[Double]("click_value"))
    }.toSet

  test("streaming interval join equals the batch twin") {
    val cDir = tmpDir("ssj-clicks")
    val pDir = tmpDir("ssj-purch")
    writeFile(cDir, "c0.json", 0, clickJson(clicks))
    writeFile(pDir, "p0.json", 0, purchaseJson(purchases))
    // watermark movers: a far-future row on EACH side (both sides'
    // watermarks must pass for state to flush in append mode)
    writeFile(cDir, "c1.json", 1,
      clickJson(Seq((9001L, 864000L, 0.0))))
    writeFile(pDir, "p1.json", 1,
      purchaseJson(Seq((9002L, 864000L))))

    val out = tmpDir("ssj-out")
    val q = StreamJoin.clickAttribution(
        readStreamDir(cDir, withValue = true),
        readStreamDir(pDir, withValue = false))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("ssj-ckpt"))
      .option("path", out)
      .format("parquet")
      .start()
    q.awaitTermination(120000)
    val got = collectJoin(out).filter(_._1 <= 4L)

    val cBatch = clicks.toDF("user_id", "off", "value")
      .select(col("user_id"), timestamp_micros((col("off") + T0) * 1000000L)
        .as("ts"), col("value"))
    val pBatch = purchases.toDF("user_id", "off")
      .select(col("user_id"), timestamp_micros((col("off") + T0) * 1000000L)
        .as("ts"))
    val wantDf = StreamJoin.clickAttribution(cBatch, pBatch)
    val want = wantDf.collect().map { r =>
      (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("purchase_ts").getTime,
        r.getAs[java.sql.Timestamp]("click_ts").getTime,
        r.getAs[Double]("click_value"))
    }.toSet
    assert(want.nonEmpty && got == want)
    // sanity on the fixture: every user attributes the 5-min-before click
    // to purchase 1 and the in-between click to purchase 2
    assert(want.count(_._1 == 1L) >= 2)
  }

  test("late click beyond the watermark is dropped, not joined") {
    val cDir = tmpDir("ssj-late-clicks")
    val pDir = tmpDir("ssj-late-purch")
    writeFile(cDir, "c0.json", 0, clickJson(Seq((1L, 2400L, 5.0))))
    writeFile(pDir, "p0.json", 0, purchaseJson(Seq((1L, 2700L))))
    // both watermarks jump far ahead...
    writeFile(cDir, "c1.json", 1, clickJson(Seq((9001L, 864000L, 0.0))))
    writeFile(pDir, "p1.json", 1, purchaseJson(Seq((9002L, 864000L))))
    // ...one more batch runs state cleanup under the advanced watermark
    // (eviction happens while PROCESSING a batch, not when the watermark
    // moves — dropping late rows earlier is best-effort, not guaranteed)
    writeFile(cDir, "c2.json", 2, clickJson(Seq((9001L, 864060L, 0.0))))
    // ...then a click arrives that WOULD match purchase (1, 2700) but is
    // now hours behind the watermark: its matching purchase state is gone
    writeFile(cDir, "c3.json", 3, clickJson(Seq((1L, 2500L, 7.0))))

    val out = tmpDir("ssj-late-out")
    val q = StreamJoin.clickAttribution(
        readStreamDir(cDir, withValue = true),
        readStreamDir(pDir, withValue = false))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("ssj-late-ckpt"))
      .option("path", out)
      .format("parquet")
      .start()
    q.awaitTermination(120000)
    val got = collectJoin(out).filter(_._1 <= 4L)
    // only the on-time click joined; the late one (value 7.0) was dropped
    assert(got.map(_._4) == Set(5.0))
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{Sessionize, SessionEvent}

/** The stateful streaming sessionizer (`flatMapGroupsWithState`):
  * gap-rule closures match the batch formulation exactly, and event-time
  * timeouts emit + evict idle users' open sessions once the watermark
  * passes the gap. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1700000000L // epoch seconds

  /** user → event times: deterministic mixture of in-session gaps
    * (minutes) and session breaks (hours). */
  private def realEvents: Seq[(Long, Long)] =
    (1L to 5L).flatMap { u =>
      var t = T0 + u * 7
      (0 until 12).map { i =>
        // every 4th step breaks the session (> 30 min)
        val gap = if (i == 0) 0L else if (i % 4 == 0) 3600L + u * 60L
                  else 60L * (1 + (i + u) % 25)
        t += gap
        (u, t * 1000000L) // micros
      }
    }

  /** The batch twin: per_session rows from the lag/running-sum
    * formulation (the oracle-checked events_sessionization shape). */
  private def batchSessions(us: DataFrame): Set[(Long, Long, Long, Double)] = {
    val w = Window.partitionBy("user_id").orderBy("us")
    us.withColumn("new_s",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > Sessionize.GapUs, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(w))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        ((max(col("us")) - min(col("us"))) / 1000000.0).as("duration_sec"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
  }

  private def writeBatchFile(dir: String, name: String, order: Int,
                             rows: Seq[(Long, Long)]): Unit =
    writeOrderedFile(dir, name, order,
      rows.map { case (u, us) => s"""{"user_id":$u,"ts":$us}""" })

  private def streamSessions(src: String): Set[(Long, Long, Long, Double)] = {
    val events = spark.readStream
      .schema("user_id LONG, ts LONG")
      .option("maxFilesPerTrigger", "1")
      .json(src)
      .withColumn("ts", timestamp_micros(col("ts")))
      .as[SessionEvent]
    val out = tmpDir("sess-out")
    val q = Sessionize.sessionsWithWatermark(events)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("sess-ckpt"))
      .option("path", out)
      .format("parquet")
      .start()
    q.awaitTermination(120000)
    spark.read.parquet(out)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sid"),
        r.getAs[Long]("n_events"), r.getAs[Double]("duration_sec")))
      .toSet
  }

  test("stateful streaming runs under the RocksDB state store " +
    "(spillable at 100 TB), with batch-identical results") {
    import scala.jdk.CollectionConverters._
    assert(spark.conf
      .get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDBStateStoreProvider"),
      "test session lost the RocksDB provider config")
    val src = tmpDir("sess-src-rocks")
    writeBatchFile(src, "b0.json", 0, realEvents)
    writeBatchFile(src, "b1.json", 1,
      (1L to 5L).map(u => (u, (T0 + 864000L) * 1000000L)))
    val events = spark.readStream
      .schema("user_id LONG, ts LONG")
      .json(src)
      .withColumn("ts", timestamp_micros(col("ts")))
      .as[SessionEvent]
    val out = tmpDir("sess-out-rocks")
    val q = Sessionize.sessionsWithWatermark(events)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("sess-ckpt-rocks"))
      .option("path", out)
      .format("parquet")
      .start()
    q.awaitTermination(120000)
    // the provider really took effect: the state operator reports
    // rocksdb-prefixed custom metrics (the HDFS-backed provider has none)
    val metricKeys = q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq)
      .flatMap(_.customMetrics.keySet.asScala)
    assert(metricKeys.exists(_.toLowerCase.startsWith("rocksdb")),
      s"no rocksdb state metrics in progress: ${metricKeys.distinct}")
    // parity: same sessions as the batch twin under the disk-backed store
    val got = spark.read.parquet(out)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sid"),
        r.getAs[Long]("n_events"), r.getAs[Double]("duration_sec")))
      .toSet
    assert(got == batchSessions(realEvents.toDF("user_id", "us")))
  }

  test("gap closures match the batch formulation") {
    val src = tmpDir("sess-src-gap")
    // a far-future event PER USER closes every real session via the gap
    // rule itself (no timeout involvement); the sentinel sessions stay
    // open in state and are never emitted
    val sentinels = (1L to 5L).map(u => (u, (T0 + 864000L) * 1000000L))
    writeBatchFile(src, "b0.json", 0, realEvents)
    writeBatchFile(src, "b1.json", 1, sentinels)
    val got = streamSessions(src)
    val want = batchSessions(
      realEvents.toDF("user_id", "us"))
    assert(got == want)
  }

  test("sids stay monotone when a user returns after timeout eviction") {
    val src = tmpDir("sess-src-resume")
    // phase 1: users' sessions; other-user sentinels fire the timeouts
    writeBatchFile(src, "b0.json", 0, realEvents)
    writeBatchFile(src, "b1.json", 1, Seq((9001L, (T0 + 864000L) * 1000000L)))
    writeBatchFile(src, "b2.json", 2, Seq((9002L, (T0 + 964000L) * 1000000L)))
    // phase 2: user 1 RETURNS (post-watermark) with two more sessions;
    // a same-user far-future sentinel closes them via the gap rule
    val come = Seq(
      (1L, (T0 + 1000000L) * 1000000L),
      (1L, (T0 + 1000060L) * 1000000L),  // same session (60 s gap)
      (1L, (T0 + 1010000L) * 1000000L))  // new session (>30 min gap)
    writeBatchFile(src, "b3.json", 3, come)
    writeBatchFile(src, "b4.json", 4, Seq((1L, (T0 + 2000000L) * 1000000L)))
    val got = streamSessions(src)
    // batch twin over ALL of user 1's non-sentinel events — sids must
    // continue the original numbering, not restart at 1
    val want = batchSessions(
      (realEvents ++ come).toDF("user_id", "us"))
      .filter(_._1 == 1L)
    assert(got.filter(_._1 == 1L) == want)
  }

  test("native session_window emits the same sessions as the batch twin") {
    val src = tmpDir("sess-src-native")
    // other-user sentinels advance the watermark past every real
    // session's end (last + gap); the sentinels' own windows stay open
    // and are never emitted in append mode
    writeBatchFile(src, "b0.json", 0, realEvents)
    writeBatchFile(src, "b1.json", 1, Seq((9001L, (T0 + 864000L) * 1000000L)))
    writeBatchFile(src, "b2.json", 2, Seq((9002L, (T0 + 964000L) * 1000000L)))
    val events = spark.readStream
      .schema("user_id LONG, ts LONG")
      .option("maxFilesPerTrigger", "1")
      .json(src)
      .withColumn("ts", timestamp_micros(col("ts")))
      .as[SessionEvent]
    val out = tmpDir("sess-native-out")
    val q = Sessionize.sessionsNativeWindow(events)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("sess-native-ckpt"))
      .option("path", out)
      .format("parquet")
      .start()
    q.awaitTermination(120000)
    // sentinel 9001's own session closes once sentinel 9002 advances the
    // watermark — restrict the compare to the real users (as the
    // timeout test does)
    val got = spark.read.parquet(out)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("duration_sec"),
        r.getAs[java.sql.Timestamp]("session_start").toInstant
          .getEpochSecond * 1000000L))
      .toSet
      .filter(_._1 <= 5L)
    // batch twin keyed by session START (the native operator has no sid)
    val w = Window.partitionBy("user_id").orderBy("us")
    val want = realEvents.toDF("user_id", "us")
      .withColumn("new_s",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > Sessionize.GapUs, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(w))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        ((max(col("us")) - min(col("us"))) / 1000000.0).as("duration_sec"),
        min(col("us")).as("start_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSet
    assert(got == want)
  }

  test("event-time timeout emits and evicts idle users' open sessions") {
    val src = tmpDir("sess-src-to")
    // sentinels belong to OTHER users: real users go idle, so their last
    // sessions can only be emitted by the event-time timeout path; two
    // watermark advances are needed (one to set, one to fire)
    writeBatchFile(src, "b0.json", 0, realEvents)
    writeBatchFile(src, "b1.json", 1, Seq((9001L, (T0 + 864000L) * 1000000L)))
    writeBatchFile(src, "b2.json", 2, Seq((9002L, (T0 + 964000L) * 1000000L)))
    val got = streamSessions(src)
    val want = batchSessions(realEvents.toDF("user_id", "us"))
    // all real sessions emitted — the final per-user sessions via timeout
    assert(got.filter(_._1 <= 5L) == want)
  }
}

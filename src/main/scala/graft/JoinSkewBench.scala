package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Join-skew demonstration, measured — the companion to `SkewBench`
  * (which showed aggregation skew: combine-able aggs don't need help,
  * non-combinable window state does). SkewBench's writeup asserts
  * "AQE's skew handling covers joins"; this bench MEASURES it instead
  * of citing it.
  *
  * Corpus: a fact table exploded from events with HALF its rows on one
  * hot key, shuffle-joined (broadcast disabled) to a dim wide enough
  * that every fact row matches. Without AQE skew handling the hot
  * key's entire fact side lands in ONE sort-merge task; with
  * `spark.sql.adaptive.skewJoin.enabled` AQE splits that partition
  * into byte-bounded slices and replicates the matching dim rows.
  *
  * Reported: wall seconds with the skew-join rule off vs on (same
  * plan otherwise — AQE stays enabled in both runs so the comparison
  * isolates the ONE rule), result checksum equality, and the skewed
  * run's `AQEShuffleRead skewed` reads counted from the executed plan.
  *
  * Two facts this bench surfaced (kept here because they bite anyone
  * reproducing it): skew detection is BYTES-based per partition, so a
  * join whose skewed side prunes to a near-constant key column
  * compresses its hot partition into invisibility — the fact side must
  * carry real payload bytes (`v` here) for the hot partition to LOOK
  * hot; and the split markers print as "AQEShuffleRead skewed" in the
  * Spark 4 plan, not the older partition-spec `isSkew` rendering.
  *
  * Prints one JSON line for COVERAGE.md.
  *
  * Usage: runMain graft.JoinSkewBench [sfDir] [multiplier]
  */
object JoinSkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 40
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // force the shuffle join: a broadcast would dodge the skew
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // let AQE consider splitting even at this bench's modest sizes
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "1m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      // coalescing first would wrap both join inputs in AQEShuffleRead
      // and hide them from the skew rule's pattern (measured: with
      // coalescing on, the same 34x-median hot partition reports
      // "skewed partitions: left 0")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin",
        sys.env.getOrElse("SPARK_GRAFT_FORCE_SKEW", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("SPARK_GRAFT_DEBUG_PLANS"))
      org.apache.log4j.LogManager.getLogger(
        "org.apache.spark.sql.execution.adaptive").setLevel(
        org.apache.log4j.Level.DEBUG)

    val root = "target/join_skew_bench"
    graft.store.Store.deleteRecursivelyIfExists(root)
    // fact: events x mult, half the rows on hot key -1. The query reads
    // only (key, v): v's poorly-compressible doubles are what make the
    // hot partition LOOK hot to the bytes-based detector (finding 2 in
    // the scaladoc); payload exists only to give the at-rest file
    // realistic width and is pruned by the join
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("i", explode(sequence(lit(0), lit(mult - 1))))
      .select(
        when((col("event_id") + col("i")) % 2 === 0, lit(-1L))
          .otherwise(col("user_id")).as("key"),
        (col("value") + col("i")).as("v"),
        concat_ws("-", col("event_id"), col("i")).as("payload"))
      // 32 input splits: AQE splits a skewed reduce partition at MAP
      // output boundaries, so a single-file fact (one map task) is
      // UNSPLITTABLE however hot its key — measured: 34x-median hot
      // partition, "skewed partitions: left 0" until this repartition
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/fact")
    // dim: every fact key incl. the hot one, with an attribute
    Tables.events(spark, sfDir).select(col("user_id").as("key"))
      .distinct().union(spark.range(1).select(lit(-1L).as("key")))
      .withColumn("attr", pmod(col("key"), lit(97)))
      .write.mode(SaveMode.Overwrite).parquet(s"$root/dim")

    val fact = spark.read.parquet(s"$root/fact")
    val dim = spark.read.parquet(s"$root/dim")
    val n = fact.count()

    def joined: DataFrame = fact.join(dim, "key")
      .groupBy("attr")
      .agg(graft.ops.Ops.dsum(col("v")).as("sum_v"), count(lit(1)).as("n"))

    def run(skewOn: Boolean): (Double, Seq[(Long, Double, Long)]) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn)
      joined.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      val rows = joined.orderBy("attr").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    if (sys.env.contains("SPARK_GRAFT_DEBUG_PLANS"))
      Seq("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled").foreach(k =>
        println(s"CONF $k=${spark.conf.get(k)}"))
    val (tOff, rOff) = run(skewOn = false)
    val (tOn, rOn) = run(skewOn = true)
    val equal = rOff == rOn
    // evidence the rule fired: skew-split shuffle reads in the
    // executed sort-merge join
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", true)
    val df = joined; df.collect()
    val planStr = df.queryExecution.executedPlan.toString
    if (sys.env.contains("SPARK_GRAFT_DEBUG_PLANS")) println(planStr)
    val skewMarks = planStr.linesIterator.count(_.contains("AQEShuffleRead skewed"))

    println(
      s"""{"bench":"join_skew_aqe","rows":$n,"hot_share":0.5,""" +
        s""""skew_off_sec":$tOff,"skew_on_sec":$tOn,""" +
        s""""skew_split_marks":$skewMarks,"equal":$equal}""")
    spark.stop()
  }
}

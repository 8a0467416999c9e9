package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Ops

/** Aggregation-skew demonstration, measured — WHERE key skew actually
  * bites in this engine and what the salted two-stage rewrite buys.
  *
  * Corpus: events exploded ×M with HALF of all rows assigned one hot
  * key (the other half keeps their user_id) — the deliberately
  * pathological one-key-dominates distribution. Three formulations of
  * the same per-key (sum, count):
  *
  *  - `plain`: `groupBy(key).agg(sum, count)`. Algebraic aggregates
  *    COMBINE map-side: every task collapses the hot key to one partial
  *    row, so the key-only shuffle carries O(tasks · keys) rows and the
  *    skew never reaches a reducer. Expected: flat, fast — measured here
  *    to prove the engine does NOT need salting for this case.
  *  - `window`: the running-total-then-pick-last anti-pattern
  *    (`sum OVER (PARTITION BY key ORDER BY …)` + `row_number`). Window
  *    state cannot combine map-side: ALL hot-key rows land in ONE task's
  *    sort. Expected: wall time pinned by the hot partition — this is
  *    the shape that NEEDS the rewrite.
  *  - `salted`: [[Ops.saltedAgg]] — stage 1 aggregates on (key, salt),
  *    spreading the hot key over `buckets` reducers, stage 2 merges the
  *    exact decimal partials. The decomposition that fixes the windowed
  *    shape when the computation is a commutative monoid.
  *
  * Prints one JSON line (wall seconds per formulation + equality check
  * of salted vs plain results) for COVERAGE.md.
  *
  * Usage: runMain graft.SkewBench [sfDir] [multiplier]
  */
object SkewBench {
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // materialize the exploded corpus so generation cost is not timed;
    // payload gives every row a distinct window sort key
    val path = "target/skew_bench/rows"
    graft.store.Store.deleteRecursivelyIfExists("target/skew_bench")
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("i", explode(sequence(lit(0), lit(mult - 1))))
      .select(
        when((col("event_id") + col("i")) % 2 === 0, lit(-1L))
          .otherwise(col("user_id")).as("key"),
        (col("value") + col("i")).as("v"),
        (col("event_id") * mult + col("i")).as("payload"))
      .write.mode(SaveMode.Overwrite).parquet(path)
    val rows = spark.read.parquet(path)
    val n = rows.count()

    def plain(df: DataFrame): DataFrame = df.groupBy("key")
      .agg(Ops.dsum(col("v")).as("sum"), count(lit(1)).as("count"))

    def windowed(df: DataFrame): DataFrame = {
      val w = Window.partitionBy("key").orderBy("payload")
      df.withColumn("csum", sum(col("v").cast(Ops.Dec)).over(w))
        .withColumn("rn", row_number().over(
          Window.partitionBy("key").orderBy(col("payload").desc)))
        .where(col("rn") === 1)
        .select(col("key"), col("csum").cast("string").cast("double").as("sum"),
          col("rn")) // rn kept only to pin the filter shape
        .drop("rn")
    }

    def salted(df: DataFrame): DataFrame =
      Ops.saltedAgg(df, Seq("key"), "v", buckets = cpus.toInt)

    def time(mk: DataFrame => DataFrame): Double = {
      mk(rows).write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      mk(rows).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    val tPlain = time(plain)
    val tWindow = time(windowed)
    val tSalted = time(salted)

    // equality gate: the salted rewrite must be EXACT, not approximate
    val a = plain(rows).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val c = salted(rows).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val equal = a == c

    println(
      s"""{"bench":"skew_salted_agg","rows":$n,"hot_share":0.5,""" +
        s""""plain_sec":$tPlain,"window_sec":$tWindow,""" +
        s""""salted_sec":$tSalted,"salted_equals_plain":$equal}""")
    spark.stop()
  }
}

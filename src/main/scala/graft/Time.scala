package graft
import org.apache.spark.sql.SparkSession

/** Timing utility: runs the named queries N times each (default 2) and
  * prints per-run wall seconds — separates per-query constant overhead
  * (planning, codegen compilation) from data-proportional cost.
  * Usage: runMain graft.Time <sfDir> <name> [name...] */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // registry + the deliberately-unregistered bench contrasts (the
    // fixed-cell SemDeDup demo and the all-pairs LSH enumeration keep
    // their measured-bad-example rows this way)
    val byName =
      (SparkEntry.registry :+ graft.queries.EmbQueries.semanticDedup
        :+ graft.queries.DocQueries.minhashPairs)
        .map(q => q.name -> q).toMap
    // session warmup
    byName("trades_count").run(spark, sfDir).write
      .mode("overwrite").format("noop").save()
    names.foreach { n =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        byName(n).run(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"TIME $n run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}

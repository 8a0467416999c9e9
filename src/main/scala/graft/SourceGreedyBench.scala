package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Greedy source selection at REALISTIC source counts (r16 verdict
  * task 7): `docs_source_greedy`'s semantics are spec-pinned on toy
  * corpora and oracle-gated on the live corpus — but the live corpus
  * has ~20 sources, so its k anti-join rounds never stress. This main
  * runs the SAME loop (`DocQueries.greedyRounds` — one spelling) on a
  * many-pseudo-sources corpus (`ScaleCorpus` `manysrc` mode, |S| = 256
  * by default) and prints the per-round cost curve: each round is ONE
  * map-side agg over the remaining (source, gram) pairs + ONE 8-byte-
  * key anti-join, so rounds should cost ~flat (the remaining frame
  * SHRINKS by the covered grams each round) — a growing curve would
  * mean per-round lineage or state is accumulating, the failure the
  * bounded-k + checkpoint discipline exists to prevent.
  *
  * Usage: runMain graft.SourceGreedyBench <sfDir> — one JSON line.
  */
object SourceGreedyBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nSources = Tables.documents(spark, sfDir)
      .select(coalesce(col("source"), lit("")).as("source"))
      .distinct().count()
    val t0 = System.nanoTime()
    val (picks, walls) = graft.queries.DocQueries.greedyRounds(spark, sfDir)
    val wall = (System.nanoTime() - t0) / 1e9
    val curve = walls.zipWithIndex.map { case (w, i) =>
      f"""{"round":${i + 1},"sec":$w%.2f}"""
    }.mkString("[", ",", "]")
    val pickJson = picks.map { case (r, src, nov, pm) =>
      s"""{"round":$r,"source":"$src","novel_grams":$nov,"cum_pm":$pm}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"source_greedy","sf_dir":"$sfDir"""" +
      s""","n_sources":$nSources,"rounds":${walls.size}""" +
      f""","total_sec":$wall%.2f,"round_curve":$curve""" +
      s""","picks":$pickJson}""")
    spark.stop()
  }
}

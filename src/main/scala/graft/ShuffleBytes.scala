package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Diagnostic: TOTAL shuffle bytes/rows written while executing each
  * named query — the evidence a shuffle-thinning rewrite leaves behind.
  * Plan-walking ([[graft.store.ScanStats]]' approach) cannot see this:
  * the collapse queries `localCheckpoint` their group frame, which cuts
  * lineage and hides the group-shuffle from the final plan — so this
  * harness listens at the scheduler level instead, summing every
  * stage's shuffle-write metrics between query start and end.
  *
  * Usage: runMain graft.ShuffleBytes <sfDir> <name> [name...]
  */
object ShuffleBytes {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // diagnostic knob: oversubscribe reduce partitions relative to the
    // bench harness's cores=partitions default, to attribute spill
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    // diagnostic knob: disable broadcast joins (plan-time AND AQE) to
    // measure the 100 TB dim shape — the test corpora copy dims through
    // unscaled, so AQE broadcasts them and hides the fact-side exchange
    // a multi-GB dim would force; "-1" on both thresholds restores it
    val bcast = sys.env.getOrElse("SPARK_GRAFT_BCAST_THRESHOLD", "10MB")
    // diagnostic knobs for the non-memory-speed-shuffle shape: local[32]
    // shuffles through the page cache, so exchange-byte differences never
    // reach the wall column; shrinking spark.memory.fraction (with a small
    // SPARK_DRIVER_MEM heap) forces the sorter/aggregator to spill, which
    // makes every exchanged byte pay a serialize+disk round-trip — the
    // closest local stand-in for a network-bound cluster's per-byte cost.
    // Disabling shuffle compression makes the byte term itself bigger.
    val memFrac = sys.env.getOrElse("SPARK_GRAFT_MEMORY_FRACTION", "0.6")
    val shufComp = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true")
    // open-ended diagnostic conf: "k=v;k=v" — the split is on ';'
    // unconditionally, so a conf VALUE containing a semicolon (e.g. an
    // extraJavaOptions list) cannot be expressed through this knob
    // (its fragments drop as non-'=' tokens); none of the spill-shape
    // confs this diagnostic exists for need one. Needed because the
    // spill-forcing shape interacts with AQE (e.g. coalesced reduce
    // partitions re-inflate a shuffled-hash build side past the shrunken
    // per-task execution cap, which OOMs instead of spilling — the
    // build-side HashedRelation is the one structure that can't spill)
    val extra = sys.env.getOrElse("SPARK_GRAFT_EXTRA_CONF", "")
      .split(';').map(_.trim).filter(_.contains("="))
      .map { kv => val i = kv.indexOf('='); kv.take(i) -> kv.drop(i + 1) }
    val base = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.autoBroadcastJoinThreshold", bcast)
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", bcast)
      .config("spark.memory.fraction", memFrac)
      .config("spark.shuffle.compress", shufComp)
      .config("spark.shuffle.spill.compress", shufComp)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // extra confs apply LAST so the knob can override any default above
    val spark = extra.foldLeft(base) {
      case (b, (k, v)) => b.config(k, v) }.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bytes = new LongAdder
    val rows = new LongAdder
    val spillMem = new LongAdder
    val spillDisk = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          bytes.add(m.shuffleWriteMetrics.bytesWritten)
          rows.add(m.shuffleWriteMetrics.recordsWritten)
          spillMem.add(m.memoryBytesSpilled)
          spillDisk.add(m.diskBytesSpilled)
        }
      }
    })

    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    // session warmup (codegen, parquet footers)
    byName("trades_count").run(spark, sfDir).write
      .mode("overwrite").format("noop").save()
    names.foreach { n =>
      // listener events are asynchronous; a short drain window before
      // reset/readout is fine for a diagnostic (stage events land well
      // inside it once the blocking action returned)
      Thread.sleep(1000)
      bytes.reset(); rows.reset(); spillMem.reset(); spillDisk.reset()
      val t0 = System.nanoTime()
      byName(n).run(spark, sfDir).write.mode("overwrite").format("noop").save()
      // wall stops HERE — the listener-drain sleep below is harness
      // overhead, not query time (it used to inflate sub-second walls
      // by >100%)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      val mb = bytes.sum / 1e6
      println("SHUFFLE {\"query\":\"" + n + "\"," +
        f"""\"shuffle_mb\":$mb%.2f,\"shuffle_rows\":${rows.sum},""" +
        f"""\"spill_mem_mb\":${spillMem.sum / 1e6}%.1f,""" +
        f"""\"spill_disk_mb\":${spillDisk.sum / 1e6}%.1f,""" +
        f"""\"wall_sec\":$wall%.2f}""")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.{BlockStore, ScanStats, Store}
import graft.streaming.AnnMV

/** The cell-partitioned ANN store's probe path, MEASURED — the
  * [[StoreBench]] (month-store vs zoned-store) discipline applied to
  * the ANN inverted lists:
  *
  *  - `flat`: the same assigned vector rows delivered through the same
  *    block store, but with `cell` as a DATA column (no physical
  *    partitioning) — the probe's `cell IN (…)` filter reaches the scan
  *    as a pushed predicate, but every file still opens (each block's
  *    file spans all cells, so footer stats cannot skip);
  *  - `cells`: [[AnnMV.writeInvertedBlock]]'s layout —
  *    `block=<id>/cell=<c>/…` — where the same filter is PARTITION
  *    pruning: only the probed `cell=` directories are listed and read,
  *    nprobe/cells of the files and bytes, no membership list built,
  *    broadcast, or joined (the round-8 verdict's 100 TB soft spot).
  *
  * The corpus is the driver embeddings table widened N× (disjoint
  * vec_ids — the layout a firehose of ingest batches produces) and
  * delivered in `blocks` micro-batches through the real store path.
  * The measured query is the IVF probe shape: 3 cells nearest the
  * query vector, top-10 members by cosine. The two layouts must return
  * IDENTICAL rows (the ZoneSpec prune-soundness discipline: a wrong
  * directory skip is a result diff here, not a silent win) — the run
  * aborts if they differ. Output: one JSON line with files/bytes/wall
  * per layout — the recorded scan-metrics evidence for COVERAGE.md.
  *
  * Usage: runMain graft.AnnStoreBench [sfDir] [copies] [blocks]
  */
object AnnStoreBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 50
    val blocks = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val root = "target/ann_store_bench"
    val flatPath = s"$root/flat"
    val cellPath = s"$root/cells"
    Store.deleteRecursivelyIfExists(root)

    // N vec_id-shifted copies of the driver embeddings — disjoint ids,
    // same label (= cell) distribution a steady ingest produces
    val base = Tables.embeddings(spark, sfDir)
    val wide = (0 until copies).map { k =>
      base.select(
        (col("vec_id") + lit(k.toLong * 1000000L)).as("vec_id"),
        col("label"), col("embedding"))
    }.reduce(_ unionByName _)

    // the frozen coarse quantizer: per-label dimension means (plain
    // double avg — both layouts assign against the SAME cents, which is
    // all the layout comparison needs)
    val cents = base
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim").agg(avg(col("v")).as("m"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(dim, m))), p -> p.m)")
        .as("centroid"))
      .select(col("label").cast("long").as("clabel"), col("centroid"))
      .cache()
    val nCells = cents.count()

    // deliver the corpus in `blocks` micro-batches through the REAL
    // store paths — cell-partitioned vs flat differ ONLY in layout
    (0 until blocks).foreach { b =>
      val batch = wide.where(pmod(col("vec_id"), lit(blocks)) === b)
      AnnMV.writeInvertedBlock(batch, cents, cellPath, blockId = b.toLong)
      BlockStore.writeBlock(flatPath, b.toLong) { tmp =>
        AnnMV.partialInverted(batch, cents)
          .coalesce(1)
          .write.mode("overwrite").parquet(tmp)
      }
    }

    // the probe, resolved once driver-side (nprobe ints + one 64-float
    // query vector — O(1) literals, the IVF probe discipline)
    val qRow = base.where(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0)
    val qLit = typedLit(qRow)
    val probes: Seq[Long] = cents
      .withColumn("q", qLit)
      .select(col("clabel"), expr(
        "graft_cosine(transform(centroid, x -> cast(x AS float)), q)")
        .as("s"))
      .orderBy(col("s").desc, col("clabel"))
      .limit(3)
      .collect().map(_.getLong(0)).toSeq

    def ranked(df: org.apache.spark.sql.DataFrame) = df
      .where(col("cell").isin(probes: _*))
      .where(col("vec_id") =!= 0)
      .withColumn("q", qLit)
      .select(col("vec_id"),
        expr("graft_cosine(embedding, q)").as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)

    case class Run(files: Long, bytes: Long, wall: Double,
                   rows: Seq[(Long, Double)])
    def measure(path: String): Run = {
      val df = ranked(AnnMV.inverted(spark, path))
      val t0 = System.nanoTime()
      val rows = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val wall = (System.nanoTime() - t0) / 1e9
      val (files, bytes) = ScanStats.totals(df)
      Run(files, bytes, wall, rows)
    }

    // warmup both (footer caches), then measure
    measure(flatPath); measure(cellPath)
    val flat = measure(flatPath)
    val cell = measure(cellPath)

    // prune soundness: a wrongly-skipped directory is a result diff
    require(flat.rows == cell.rows,
      s"layouts disagree!\nflat: ${flat.rows}\ncells: ${cell.rows}")

    // fold all committed blocks into one — the steady-state layout
    // after ingest; the cell prune must SURVIVE compaction
    // (compactInverted keeps the physical partitioning)
    AnnMV.compactInverted(spark, cellPath,
      throughBlockId = (blocks - 1).toLong)
    measure(cellPath)
    val cellC = measure(cellPath)
    require(flat.rows == cellC.rows,
      s"compacted cell store disagrees!\n${cellC.rows}")

    def diskMb(path: String): Double = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum / 1e6
      finally s.close()
    }

    val nVecs = copies.toLong * base.count()
    println(
      f"""ANNSTORE {"n_vecs":$nVecs,"cells":$nCells,""" +
        f""""blocks":$blocks,"nprobe":3,""" +
        f""""flat_files":${flat.files},"flat_mb":${flat.bytes / 1e6}%.1f,""" +
        f""""flat_sec":${flat.wall}%.2f,""" +
        f""""cell_files":${cell.files},"cell_mb":${cell.bytes / 1e6}%.1f,""" +
        f""""cell_sec":${cell.wall}%.2f,""" +
        f""""compacted_files":${cellC.files},""" +
        f""""compacted_mb":${cellC.bytes / 1e6}%.1f,""" +
        f""""byte_ratio":${flat.bytes.toDouble / cell.bytes}%.1f,""" +
        f""""flat_disk_mb":${diskMb(flatPath)}%.1f,""" +
        f""""cell_disk_mb":${diskMb(cellPath)}%.1f}""")
    spark.stop()
  }
}

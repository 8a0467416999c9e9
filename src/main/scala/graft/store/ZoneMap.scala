package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone map ("sparse index") over a parquet directory: one
  * row per (file, indexed column) with the column's min/max/null-count,
  * harvested from parquet FOOTER statistics — the index build reads
  * kilobytes of metadata per file, never the data pages. This is the
  * engine-side analogue of the reference's ClickHouse primary-key
  * sparse index (reference: sql/V1__create_trades_table.sql:14-16
  * `ORDER BY (ts, symbol, trade_id)` granule skipping), generalized the
  * way Delta/Iceberg file statistics generalize it: pruning works on
  * ANY indexed column, not only the leading sort key — provided the
  * layout clusters that column ([[graft.functions.ZOrder]]).
  *
  * Build is DISTRIBUTED: the file list fans out over executors and each
  * task reads its files' footers, so indexing a 100 TB table is a
  * metadata-sized job (one footer ≈ KBs, 10⁶ files spread over the
  * cluster), not a scan. The hadoop `Configuration` is constructed
  * inside the task — sufficient for any fs the default loader resolves
  * (local, HDFS); object stores needing credential-bearing conf would
  * thread a serializable conf through instead.
  *
  * Pruning contract (the only one zone maps can honor): a file may be
  * SKIPPED only when its stats PROVE no row can match — missing stats,
  * null-only chunks, or any overlap keep the file. False keeps cost
  * bytes, false skips cost correctness; every branch here defaults to
  * keep. Row-level predicates must still be applied by the reader —
  * pruning is an I/O optimization, never a filter.
  */
object ZoneMap {

  /** One indexed column of one data file. Long-typed stats (ints,
    * longs, timestamps-as-micros) land in minLong/maxLong; string stats
    * in minStr/maxStr. `rows` counts the file's rows, `nulls` the
    * column's nulls (a column that is ALL null in a file overlaps
    * nothing). `file` is the name RELATIVE to the store root (flat
    * layout), never an absolute path: the index must survive the store
    * directory being renamed — compaction stages a whole new store
    * (data + index) in a dot-prefixed sibling and swaps it in, and a
    * path-anchored index would go stale at exactly that rename. */
  final case class Entry(
      file: String, column: String, rows: Long, nulls: Long,
      minLong: Option[Long], maxLong: Option[Long],
      minStr: Option[String], maxStr: Option[String])

  val IndexDir = "_zonemap"

  /** Harvest footer stats for `columns` from every data file under
    * `dir` and persist them as `dir/_zonemap` — a full (re)build; the
    * index is DERIVED state, so this is also the crash-recovery path
    * (any doubt about index integrity ⇒ rebuild from footers). */
  def build(spark: SparkSession, dir: String, columns: Seq[String]): Unit = {
    graft.store.Store.deleteRecursivelyIfExists(s"$dir/$IndexDir")
    refresh(spark, dir, columns)
  }

  /** Incrementally reconcile the index with the data files actually
    * present: entries for files the index already covers are KEPT
    * (their footers are immutable — parquet files never change after
    * commit), entries for deleted files are dropped, and only unseen
    * files get a footer read — the property that keeps index
    * maintenance O(appended files), not O(store), at ingest rates. An
    * index whose column set differs from the request is rebuilt whole
    * (its kept rows would silently lack the new column). The rewrite
    * goes through [[graft.store.Store.swapDirectory]], so a crash
    * mid-refresh leaves the previous index readable. */
  def refresh(spark: SparkSession, dir: String,
              columns: Seq[String]): Unit = {
    val files = listDataFiles(dir)
    require(files.nonEmpty, s"zone map over empty store: $dir")
    import spark.implicits._
    val idxPath = java.nio.file.Paths.get(dir, IndexDir)
    val existing: Seq[Entry] =
      if (java.nio.file.Files.isDirectory(idxPath))
        spark.read.parquet(idxPath.toString).as[Entry].collect().toSeq
      else Seq.empty
    val sameCols =
      existing.isEmpty || existing.map(_.column).toSet == columns.toSet
    val live = files.toSet
    // an index from before the relative-name contract (absolute paths)
    // matches nothing here and rebuilds whole — self-healing, no
    // version sniffing needed
    val kept =
      if (sameCols) existing.filter(e => live(e.file)) else Seq.empty
    val indexed = kept.map(_.file).toSet
    val missing = files.filterNot(indexed)
    val fresh: Seq[Entry] =
      if (missing.isEmpty) Seq.empty
      else spark.sparkContext
        .parallelize(missing, math.min(missing.size, 64))
        .flatMap(f => readFooter(dir, f, columns))
        .collect().toSeq
    graft.store.Store.swapDirectory(dir, IndexDir) { tmp =>
      spark.createDataset(kept ++ fresh).toDF()
        .coalesce(1).write.parquet(tmp)
    }
  }

  /** Footer stats of one file, one [[Entry]] per indexed column.
    * Row-group chunks fold per file: min of mins, max of maxes — a
    * chunk with absent/untrusted stats poisons that column's bounds to
    * None (file always kept). */
  private[store] def readFooter(dir: String, file: String,
                                columns: Seq[String]): Seq[Entry] = {
    val in = HadoopInputFile.fromPath(
      new Path(s"$dir/$file"), new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks
      val rows = {
        var r = 0L
        blocks.forEach(b => r += b.getRowCount)
        r
      }
      columns.map { c =>
        var minL, maxL = Option.empty[Long]
        var minS, maxS = Option.empty[String]
        var nulls = 0L
        var usable = true
        blocks.forEach { b =>
          b.getColumns.forEach { cc =>
            if (cc.getPath.toDotString == c) {
              val st = cc.getStatistics
              if (st == null || !st.isNumNullsSet) usable = false
              else {
                nulls += st.getNumNulls
                if (st.getNumNulls < cc.getValueCount) {
                  if (!st.hasNonNullValue) usable = false
                  else (st.genericGetMin, st.genericGetMax) match {
                    case (lo: java.lang.Long, hi: java.lang.Long) =>
                      minL = Some(minL.fold(lo.longValue)(_ min lo))
                      maxL = Some(maxL.fold(hi.longValue)(_ max hi))
                    case (lo: java.lang.Integer, hi: java.lang.Integer) =>
                      minL = Some(minL.fold(lo.longValue)(_ min lo.longValue))
                      maxL = Some(maxL.fold(hi.longValue)(_ max hi.longValue))
                    case (lo: Binary, hi: Binary) =>
                      val (ls, hs) =
                        (lo.toStringUsingUTF8, hi.toStringUsingUTF8)
                      minS = Some(minS.fold(ls)(m => if (ls < m) ls else m))
                      maxS = Some(maxS.fold(hs)(m => if (hs > m) hs else m))
                    case _ => usable = false
                  }
                }
              }
            }
          }
        }
        if (usable) Entry(file, c, rows, nulls, minL, maxL, minS, maxS)
        else Entry(file, c, rows, nulls, None, None, None, None)
      }
    } finally reader.close()
  }

  /** Inclusive bound on one indexed column; None = unbounded side. */
  final case class LongRange(column: String,
                             lo: Option[Long], hi: Option[Long])
  final case class StrRange(column: String,
                            lo: Option[String], hi: Option[String])

  /** The data files whose stat envelopes overlap EVERY given range —
    * the read set for a zone-pruned scan. The index itself is tiny
    * (files × indexed columns rows), so the overlap test runs as one
    * small Spark job over the index table and collects file names only.
    */
  def prunedFiles(spark: SparkSession, dir: String,
                  longs: Seq[LongRange] = Nil,
                  strs: Seq[StrRange] = Nil): Seq[String] = {
    val idx = spark.read.parquet(s"$dir/$IndexDir")
    // per predicate: a file is REMOVABLE iff its stats for that column
    // exist and prove disjointness; everything else keeps it
    def longKeep(r: LongRange) =
      col("column") =!= r.column ||
        ((col("minLong").isNotNull && col("maxLong").isNotNull) &&
          r.lo.map(col("maxLong") >= _).getOrElse(lit(true)) &&
          r.hi.map(col("minLong") <= _).getOrElse(lit(true))) ||
        // all-null column can match nothing, but only when the stats
        // say so affirmatively
        (col("minLong").isNull && col("maxLong").isNull &&
          !(col("nulls") === col("rows")))
    def strKeep(r: StrRange) =
      col("column") =!= r.column ||
        ((col("minStr").isNotNull && col("maxStr").isNotNull) &&
          r.lo.map(col("maxStr") >= _).getOrElse(lit(true)) &&
          r.hi.map(col("minStr") <= _).getOrElse(lit(true))) ||
        (col("minStr").isNull && col("maxStr").isNull &&
          !(col("nulls") === col("rows")))
    val keep = (longs.map(longKeep) ++ strs.map(strKeep))
      .foldLeft(lit(true))(_ && _)
    // a file survives only if every ITS rows' predicate-column stats
    // keep it — group per file, all() over its index rows
    idx.groupBy("file")
      .agg(min(keep.cast("int")).as("keep"))
      .where(col("keep") === 1)
      .select("file").collect().map(r => s"$dir/${r.getString(0)}")
      .toSeq.sorted
  }

  /** Every parquet data file under `dir`, as names RELATIVE to it
    * (flat layout; the `_zonemap` index dir and commit markers are not
    * data). Local-fs listing — the sandbox's store substrate; a cluster
    * deployment swaps this one function for a `FileSystem.listStatus`
    * walk (the footer readers above already go through the hadoop fs
    * API). */
  private def listDataFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    require(d.isDirectory, s"not a directory: $dir")
    d.listFiles().toSeq
      .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName).sorted
  }
}

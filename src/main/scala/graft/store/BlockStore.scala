package graft.store

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The shared block-partial store machinery behind the streaming MVs
  * ([[graft.streaming.IndexMV]] / [[graft.streaming.DedupMV]] /
  * [[graft.streaming.AnnMV]]): each micro-batch writes a
  * `block=<batchId>` partition (through [[Store.swapDirectory]], so
  * at-least-once replays REPLACE losslessly), reads merge all blocks,
  * and [[compact]] folds committed history into one block. One audited
  * implementation — the compaction contract (crash-safe parent-level
  * swap, retained-block copy, fold naming) lives here, not three
  * times. */
object BlockStore {

  /** The `block=<id>` child directories of a partials root. */
  def blockDirs(root: java.nio.file.Path): List[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(root)
    try s.iterator().asScala.toList.filter(p =>
      java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("block="))
    finally s.close()
  }

  def blockId(p: java.nio.file.Path): Long =
    p.getFileName.toString.stripPrefix("block=").toLong

  /** Fold every block with id ≤ `throughBlockId` into ONE block via
    * `fold` (identity/concatenation for row-fact partials, a re-merge
    * aggregation for summary partials). The folded block is named
    * after the HIGHEST id it absorbed — NOT `throughBlockId` — so a
    * caller passing a too-high id (the classic off-by-one: the newest
    * batch id instead of newest−1) cannot park the folded history
    * under a block id a FUTURE micro-batch will replace; absorbed ids
    * are committed by definition, so their maximum can never collide
    * with a later batch. Replay contract: under `foreachBatch`
    * at-least-once delivery only the newest not-yet-committed batch
    * can replay — callers compact only checkpoint-committed history; a
    * replayed newer block still replaces its own `block=<id>` dir
    * exactly as before compaction.
    *
    * The whole partials directory is rewritten through ONE
    * [[Store.swapDirectory]] at the parent level — retained blocks
    * (> `throughBlockId`) are copied alongside the fold, so every
    * crash window leaves either the old directory or the complete new
    * one, never a double-counting mix. `stage` runs BEFORE the rename
    * pair, so the live block dirs are still in place to read from;
    * they are addressed directly (not via the partials root) so no
    * listing races the staging write.
    *
    * Concurrency contract with the sink: folded blocks (≤
    * `throughBlockId`) are checkpoint-committed, so no replay touches
    * them — but a RETAINED block can be mid-replace (the sink's
    * rename pair) while this copy walks it. [[copyRecursively]]
    * re-lists and retries on the resulting `NoSuchFileException`, so
    * the staged store captures either the old or the new rename-pair
    * state of that block, never a torn half — both are complete
    * blocks (replays REPLACE losslessly), so either is correct. */
  def compact(spark: SparkSession, partialsPath: String,
              throughBlockId: Long)(fold: DataFrame => DataFrame): Unit = {
    val root = java.nio.file.Paths.get(partialsPath).toAbsolutePath
    val (oldBlocks, retained) =
      blockDirs(root).partition(blockId(_) <= throughBlockId)
    if (oldBlocks.size < 2) return // nothing to fold
    val foldedId = oldBlocks.map(blockId).max
    Store.swapDirectory(
      root.getParent.toString, root.getFileName.toString) { tmp =>
      val tmpPath = java.nio.file.Paths.get(tmp)
      java.nio.file.Files.createDirectories(tmpPath)
      fold(spark.read.parquet(oldBlocks.map(_.toString): _*))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$tmp/block=$foldedId")
      retained.foreach { src =>
        copyRecursively(src, tmpPath.resolve(src.getFileName.toString))
      }
    }
  }

  /** Recursive copy that survives the source being concurrently
    * REPLACED (a sink replay's rename pair swapping a retained block
    * dir mid-walk): a file vanishing under the walk re-lists and
    * retries the whole copy — after the rename pair completes the dir
    * is stable again, so one retry normally suffices; three failed
    * attempts mean the dir is gone for good (not a swap) and the
    * exception is real. */
  def copyRecursively(src: java.nio.file.Path,
                      dst: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    def attempt(): Unit = {
      val s = Files.walk(src)
      // depth-first pre-order: directories precede their contents, so
      // each copy's parent already exists
      try s.iterator().asScala.foreach { p =>
        Files.copy(p, dst.resolve(src.relativize(p).toString),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } finally s.close()
    }
    var left = 3
    var done = false
    while (!done) {
      try { attempt(); done = true }
      catch {
        case e: java.nio.file.NoSuchFileException =>
          left -= 1
          if (left == 0 || !Files.exists(src)) throw e
      }
    }
  }
}

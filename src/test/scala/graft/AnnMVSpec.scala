package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.EmbQueries
import graft.streaming.AnnMV

/** Streaming ANN-index MV: per-batch nearest-centroid assignment
  * against a frozen quantizer, merged blocks equal the batch Lloyd
  * assignment, compaction folds losslessly, and the assignment math
  * (argmin L2², tie-break on centroid label) matches the
  * emb_kmeans_refine spelling it shares. */
class AnnMVSpec extends SparkSpec {

  // a 2-cell, 2-dim quantizer: cell 0 at the origin, cell 1 at (10,10)
  private def cents = {
    import spark.implicits._
    Seq((0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 10.0)))
      .toDF("clabel", "centroid")
  }

  private def vecsDf(rows: Seq[(Long, Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "label", "embedding")
  }

  private def vecJson(id: Long, label: Long, e: Seq[Double]): String =
    s"""{"vec_id":$id,"label":$label,"embedding":[${e.mkString(",")}]}"""

  private def vecStream(dir: String) =
    spark.readStream
      .schema("vec_id LONG, label LONG, embedding ARRAY<FLOAT>")
      .json(dir)

  private def readVecs(dir: String) =
    spark.read
      .schema("vec_id LONG, label LONG, embedding ARRAY<FLOAT>")
      .json(dir)

  private def collectAssign(df: org.apache.spark.sql.DataFrame) =
    df.select("vec_id", "cell").distinct().orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("assignment picks the nearest centroid; exact ties break on the " +
    "smaller centroid label") {
    val out = collectAssign(AnnMV.partialAssignments(vecsDf(Seq(
      (1L, 9L, Seq(1f, 1f)),    // near origin → cell 0
      (2L, 9L, Seq(9f, 9f)),    // near (10,10) → cell 1
      (3L, 9L, Seq(5f, 5f)))),  // equidistant → tie → cell 0
      cents))
    assert(out == Seq((1L, 0L), (2L, 1L), (3L, 0L)))
  }

  test("merged streaming blocks == batch Lloyd assignment over the " +
    "union; new vectors are searchable without touching old blocks") {
    val src = tmpDir("amv-src")
    val partials = tmpDir("amv-partials")
    val ckpt = tmpDir("amv-ckpt")

    Files.writeString(Paths.get(src, "b1.json"), Seq(
      vecJson(1, 9, Seq(1, 2)), vecJson(2, 9, Seq(8, 9)))
      .mkString("\n"))
    assert(AnnMV.annSink(vecStream(src), cents, partials, ckpt,
      Trigger.AvailableNow()).awaitTermination(120000))
    val blocksAfter1 = {
      val s = Files.list(Paths.get(partials))
      try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
        .asScala.count(_.getFileName.toString.startsWith("block="))
      finally s.close()
    }

    Files.writeString(Paths.get(src, "b2.json"), Seq(
      vecJson(3, 9, Seq(0, 1)), vecJson(4, 9, Seq(12, 11)))
      .mkString("\n"))
    assert(AnnMV.annSink(vecStream(src), cents, partials, ckpt,
      Trigger.AvailableNow()).awaitTermination(120000))

    val merged = collectAssign(AnnMV.assignments(spark, partials))
    val batch = collectAssign(
      EmbQueries.assignCells(readVecs(src), cents))
    assert(merged == batch)
    assert(merged == Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, 1L)))
    // incrementality: the second delivery added a block, it did not
    // rewrite the first one
    val blocksAfter2 = {
      val s = Files.list(Paths.get(partials))
      try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
        .asScala.count(_.getFileName.toString.startsWith("block="))
      finally s.close()
    }
    assert(blocksAfter1 == 1 && blocksAfter2 == 2)
  }

  test("compaction folds committed blocks; assignments identical; a " +
    "replayed newer block still replaces") {
    val partials = tmpDir("amv-compact")
    val batches: Seq[Seq[(Long, Long, Seq[Float])]] = Seq(
      Seq((1L, 9L, Seq(1f, 1f)), (2L, 9L, Seq(9f, 9f))),
      Seq((3L, 9L, Seq(2f, 0f))),
      Seq((4L, 9L, Seq(11f, 12f))))
    batches.zipWithIndex.foreach { case (rows, i) =>
      AnnMV.writeBlock(vecsDf(rows), cents, partials, blockId = i.toLong)
    }
    val before = collectAssign(AnnMV.assignments(spark, partials))

    AnnMV.compact(spark, partials, throughBlockId = 1L)
    val blockNames = {
      val s = Files.list(Paths.get(partials))
      try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
        .asScala.map(_.getFileName.toString)
        .filter(_.startsWith("block=")).toSet
      finally s.close()
    }
    assert(blockNames == Set("block=1", "block=2"),
      s"expected fold + retained block, got $blockNames")
    assert(collectAssign(AnnMV.assignments(spark, partials)) == before)

    AnnMV.writeBlock(vecsDf(batches(2)), cents, partials, blockId = 2L)
    assert(collectAssign(AnnMV.assignments(spark, partials)) == before)
  }

  test("per-batch assignment broadcasts the codebook — no shuffle of " +
    "the vector side before the argmin's partial aggregation") {
    val plan = AnnMV.partialAssignments(
      vecsDf(Seq((1L, 9L, Seq(1f, 1f)))), cents)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"),
      "codebook join is not a broadcast")
  }
}

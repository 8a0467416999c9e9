package graft

import org.apache.spark.sql.DataFrame
import graft.queries.DocQueries

/** The loop-state cluster-safety knob ([[graft.ops.Ckpt]], r17): the
  * three iterative operators — connected-components label propagation
  * (`docs_dup_clusters`), greedy max-coverage source selection
  * (`docs_source_greedy`), and the BPE trainer (`docs_bpe_train`) —
  * must produce IDENTICAL results under `local` (localCheckpoint),
  * `disk` (persist DISK_ONLY, lineage kept), and `reliable`
  * (SparkContext checkpoint dir) pinning. The knob changes WHERE loop
  * state lives and what survives an executor loss, never WHAT the
  * loop computes. */
class CkptModeSpec extends SparkSpec {
  import spark.implicits._

  private val Modes = Seq("local", "disk", "reliable")

  /** Run `q` under checkpoint mode `m`, restoring the default after. */
  private def under(m: String)(q: => DataFrame): List[String] =
    try {
      spark.conf.set(graft.ops.Ckpt.ModeConf, m)
      q.collect().map(_.toString).toList
    } finally spark.conf.set(graft.ops.Ckpt.ModeConf, "local")

  private def corpus(): String = {
    val dir = tmpDir("ckpt-corpus")
    // shape that exercises every loop: near-dup texts (CC has edges and
    // needs >1 round via a dup chain), three sources with overlapping
    // vocabulary (greedy runs >1 round), repeated words (BPE merges)
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", 43L, "sA"),
      (2L, "the quick brown fox jumps over the lazy cat", "en", 43L, "sA"),
      (3L, "the quick brown fox jumps over a lazy cat", "en", 41L, "sB"),
      (4L, "entirely different words live here today", "en", 40L, "sB"),
      (5L, "entirely different words live here tonight", "en", 42L, "sC"),
      (6L, "aa aa aa bb bb cc", "en", 17L, "sC"))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("CC / greedy / BPE results are invariant across checkpoint modes") {
    val dir = corpus()
    // BPE × disk is EXCLUDED from the routine matrix, deliberately:
    // disk mode keeps lineage (its recovery value), and the BPE loop's
    // state feeds TWO consumers per round (argmax + merge), so the
    // kept-lineage plan is re-analyzed through ~2^rounds references —
    // measured ~15 min for the full 8-merge train on this toy corpus
    // (it PASSES — verified once when this spec landed — the cost is
    // analysis, not wrongness). Ckpt's scaladoc records the guidance:
    // two-consumer loops use `reliable` for cluster safety.
    val matrix = Seq(
      DocQueries.dupClusters -> Modes,
      DocQueries.sourceGreedy -> Modes,
      DocQueries.bpeTrain -> Seq("local", "reliable"))
    for ((q, modes) <- matrix) {
      val want = under("local")(q.run(spark, dir))
      assert(want.nonEmpty, s"${q.name}: empty baseline result")
      for (m <- modes.drop(1))
        assert(under(m)(q.run(spark, dir)) == want,
          s"${q.name}: mode '$m' diverged from 'local'")
    }
  }

  test("reliable mode actually writes to the checkpoint directory") {
    val dir = corpus()
    val ckptDir = tmpDir("ckpt-reliable")
    spark.conf.set(graft.ops.Ckpt.DirConf, ckptDir)
    try {
      // a fresh context may already have a checkpoint dir from an
      // earlier reliable run in this shared session — force ours
      spark.sparkContext.setCheckpointDir(ckptDir)
      under("reliable")(DocQueries.sourceGreedy.run(spark, dir))
      val n = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(n > 0, "reliable mode left no checkpoint files")
    } finally spark.conf.unset(graft.ops.Ckpt.DirConf)
  }

  test("unknown mode fails fast with the mode named") {
    val dir = corpus()
    val e = intercept[IllegalArgumentException] {
      under("executor-magic")(DocQueries.bpeTrain.run(spark, dir))
    }
    assert(e.getMessage.contains("executor-magic"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Loop-state pinning with a CLUSTER-SAFETY knob (r17, the r16
  * verdict's What's-wrong #3): the iterative operators (connected-
  * components label propagation, greedy max-coverage source selection,
  * the BPE trainer) re-read a materialized frame every round and must
  * truncate per-round lineage, or round K replays the corpus scan 2^K
  * times. `localCheckpoint` — the previous hard-coded choice — is
  * correct and fastest in `local[32]`, but it truncates lineage AND
  * stores the blocks on executors: at cluster scale an executor loss
  * makes the frame unrecoverable (no lineage to recompute from) and
  * fails the job. This knob makes the trade explicit instead of a
  * comment:
  *
  *  - `local` (default — the right choice for the single-JVM bench
  *    harness, where executor loss is process death anyway):
  *    `localCheckpoint(eager)`. Fastest; not executor-loss-safe.
  *  - `disk`: `persist(DISK_ONLY)` + eager materialization. Blocks an
  *    executor held die with it, but LINEAGE IS KEPT, so surviving
  *    executors recompute lost partitions — executor-loss-safe at the
  *    cost of growing plan lineage across rounds. Right for SINGLE-
  *    consumer loop state (CC, greedy: plan grows linearly in rounds);
  *    for a loop whose state feeds TWO consumers per round (the BPE
  *    trainer: argmax + merge both re-derive the parent) the kept
  *    lineage is re-analyzed through ~2^rounds references — correct
  *    (CkptModeSpec verified it once: identical results, ~15 min for
  *    8 merges) but pathological; use `reliable` there.
  *  - `reliable`: `checkpoint(eager)` to the SparkContext checkpoint
  *    dir (`graft.loop.checkpointDir`, or a scratch dir when unset —
  *    on a real cluster point it at DFS). Truncates lineage AND
  *    survives executor loss; pays a write to reliable storage per
  *    pin.
  *
  * All three modes materialize EAGERLY and return a frame whose rows
  * are byte-identical to the input's — CkptModeSpec pins the three
  * iterative operators' results as mode-invariant. */
object Ckpt {

  /** Session conf selecting the mode: `local` | `disk` | `reliable`. */
  val ModeConf = "graft.loop.checkpoint"

  /** Session conf naming the reliable-checkpoint directory (used only
    * in `reliable` mode; a scratch dir is used when unset). */
  val DirConf = "graft.loop.checkpointDir"

  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ModeConf, "local") match {
      case "local" => df.localCheckpoint()
      case "disk" =>
        // disk mode KEEPS lineage (that is its recovery value), so a
        // loop whose state feeds two consumers per round (BPE: argmax
        // + merge both re-derive the parent) builds a plan tree whose
        // RENDERING doubles per round — execution is fine (the two
        // references share one object), but every action's
        // execution-listener plan description string is exponential
        // and the ~2 GB default spark.sql.maxPlanStringLength OOMs
        // the heap before truncating (measured: CkptModeSpec's BPE
        // loop at merge 8). Cap it: explain TEXT truncates, nothing
        // about execution or recovery changes.
        val maxPlanChars = 8 * 1024 * 1024
        // the conf renders as a byte-suffixed string ("2147483632b");
        // compare on the digit prefix — a sub-cap value (whatever its
        // unit) is left alone
        val current = spark.conf.get("spark.sql.maxPlanStringLength")
          .takeWhile(_.isDigit)
        if (current.nonEmpty && current.toLong > maxPlanChars)
          spark.conf.set("spark.sql.maxPlanStringLength",
            maxPlanChars.toString)
        val p = df.persist(StorageLevel.DISK_ONLY)
        p.count() // eager, like localCheckpoint(eager = true)
        p
      case "reliable" =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty)
          sc.setCheckpointDir(
            spark.conf.getOption(DirConf).getOrElse(
              graft.store.Store.scratchStore("loop-ckpt")))
        df.checkpoint()
      case other => throw new IllegalArgumentException(
        s"$ModeConf: unknown mode '$other' (local | disk | reliable)")
    }
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming heavy-hitters materialized view on the Misra-Gries
  * mergeable summary ([[graft.functions.MisraGries]]) — the sketch
  * sibling of [[CandlePipeline.partialSink]]'s append-partials /
  * merge-on-read discipline, for the live "top users/symbols" dashboard
  * query over an unbounded stream.
  *
  * Each micro-batch reduces to ≤ k (item, cnt) rows plus its row count —
  * ZERO streaming state, O(k) appended bytes per batch no matter the
  * input rate (an exact streaming `groupBy(item).count()` in update mode
  * holds every distinct item in the state store forever). Read time
  * merges the partials by summing counters — by the mergeable-summaries
  * bound, the summed counter of any item undercounts its true count by
  * at most n/(k+1) across ANY merge tree, so the reader can return
  * candidates with exact upper/lower bounds and a provably complete
  * candidate set above the n/(k+1) noise floor.
  *
  * `foreachBatch` is at-least-once: replayed batches re-append
  * byte-identical (block, item) rows, absorbed by the same
  * dropDuplicates convention as the candle partials. Store growth is
  * O(k · batches); maintenance compaction (merge all partials into one
  * summed block, MG-reduce to k rows) follows the
  * [[graft.store.Store.compactMonth]] rewrite pattern and is elided
  * here.
  */
object HeavyHitters {

  /** Per-batch MG partial rows `(block, item, cnt, batch_n)`. An empty
    * batch explodes to zero rows (its n contributes nothing). */
  def partialSummary(events: DataFrame, itemCol: String, k: Int,
                     blockId: Long): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    events
      .agg(expr(s"graft_mg_pairs($itemCol, $k)").as("s"),
        count(lit(1)).as("batch_n"))
      .select(lit(blockId).as("block"), col("batch_n"),
        explode(col("s")).as("p"))
      .select(col("block"), col("p.id").as("item"), col("p.cnt").as("cnt"),
        col("batch_n"))
  }

  /** Streaming sink: one MG partial appended per micro-batch. */
  def sketchSink(events: DataFrame, itemCol: String, k: Int,
                 partialsPath: String, checkpointPath: String,
                 trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : StreamingQuery =
    events.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        partialSummary(batch, itemCol, k, batchId)
          .coalesce(1)
          .write.mode("append").parquet(partialsPath)
        ()
      }
      .start()

  /** Replay-absorbed partials (one row per (block, item); replayed
    * copies are byte-identical). */
  private def dedupReplays(partials: DataFrame): DataFrame =
    partials.dropDuplicates("block", "item")

  /** Total rows summarized — one `batch_n` per block (O(blocks) driver
    * data, the anchor-resolution pattern, not a hot-path collect). */
  def totalN(partials: DataFrame): Long =
    dedupReplays(partials)
      .select("block", "batch_n").distinct()
      .agg(coalesce(sum("batch_n"), lit(0L)))
      .head().getLong(0)

  /** Heavy-hitter candidates at `frac` of the stream: items whose true
    * count COULD exceed frac·n. `cnt_lb` (summed partial counters) never
    * overcounts; `cnt_ub = cnt_lb + n/(k+1)` never undercounts — so
    * filtering on the upper bound keeps every true heavy hitter (the MG
    * completeness guarantee, survived through every batch boundary and
    * merge order), and the bounds let the consumer decide whether an
    * exact confirmation pass (the `events_mg_heavy` pattern) is needed.
    * Requires frac > 1/(k+1), the summary's noise floor — below that
    * an empty-summary item could qualify and NO sketch of width k can
    * answer. */
  def candidates(spark: SparkSession, partialsPath: String, k: Int,
                 frac: Double): DataFrame = {
    require(frac > 1.0 / (k + 1),
      s"frac=$frac is below the k=$k summary's noise floor 1/(k+1)")
    val partials = dedupReplays(spark.read.parquet(partialsPath))
    val n = totalN(partials)
    val slack = n.toDouble / (k + 1)
    partials
      .groupBy("item")
      .agg(sum(col("cnt")).as("cnt_lb"))
      .withColumn("cnt_ub", (col("cnt_lb") + lit(slack)).cast("double"))
      .where(col("cnt_ub") > lit(frac) * n)
      .orderBy(col("cnt_lb").desc, col("item"))
  }
}

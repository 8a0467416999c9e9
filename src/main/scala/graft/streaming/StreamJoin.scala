package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the remaining member of the Structured
  * Streaming join surface (stream-static joins appear in the candle
  * readback; this is the two-moving-sides case): purchases join the
  * clicks of the SAME user within a bounded lookback window.
  *
  * The time-range predicate is what makes this feasible at all: it bounds
  * BOTH sides' state — Spark keeps a click only until the watermark
  * passes `click_ts + lookback` (no older purchase can still match it)
  * and a purchase only until its own watermark expires, so state is
  * O(events inside the lateness+lookback horizon) per user, forever.
  * An unconstrained stream-stream equi-join would buffer both streams
  * unboundedly — the interval condition is not an optimization here but
  * the difference between bounded and unbounded state.
  *
  * Semantics twin: the batch inner join with the same predicate (the spec
  * proves equality). The AS-OF flavor (most recent click only) is the
  * batch/custom-operator pair `events_asof_attribution` /
  * `events_asof_native`; the interval join emits EVERY in-window click.
  */
object StreamJoin {

  /** Inner interval join: `clicks(user_id, ts, value)` ⋈
    * `purchases(user_id, ts)` on same user and
    * `purchase_ts - lookback <= click_ts <= purchase_ts`.
    * Both inputs may be streaming (watermarks are applied here) or batch
    * (watermark is a no-op on batch frames, so the same code is its own
    * batch twin). */
  def clickAttribution(
      clicks: DataFrame,
      purchases: DataFrame,
      lookbackMinutes: Int = 60,
      latenessMinutes: Int = 10): DataFrame = {
    val c = clicks
      .withWatermark("ts", s"$latenessMinutes minutes")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("value").as("click_value"))
    val p = purchases
      .withWatermark("ts", s"$latenessMinutes minutes")
      .select(col("user_id"), col("ts").as("purchase_ts"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") -
          expr(s"INTERVAL $lookbackMinutes MINUTES") &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("user_id"), col("purchase_ts"), col("click_ts"),
        col("click_value"))
  }
}

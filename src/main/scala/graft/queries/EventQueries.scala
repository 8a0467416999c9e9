package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{NamedQuery, Tables}
import graft.ops.Ops

/** Event-stream analytics over the raw `events` table (SURVEY.md §7.2-6
  * "events sessionization-lite"): sessionization with a gap rule,
  * per-day active users, and a forward-filled (as-of) per-minute price
  * series — the time-series operators a trading/analytics engine needs
  * beyond plain windowed aggregation.
  *
  * Determinism notes: interval logic runs on integer epoch-micros (no
  * engine interval-type coercions); session ids come from a running sum
  * whose default RANGE frame treats tied timestamps identically in both
  * engines.
  */
object EventQueries {

  /** Sessionization: split each user's event stream at >30-minute gaps
    * (lag + running-sum session ids — the standard single-shuffle
    * formulation: everything is windowed by user_id, so it scales as one
    * hash shuffle on a high-cardinality unskewed key). Output: session
    * size histogram with exact average duration. */
  val sessionization: NamedQuery = NamedQuery(
    "events_sessionization",
    s"""WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
      |),
      |flagged AS (
      |  SELECT user_id, us,
      |         CASE WHEN lag(us) OVER w IS NULL
      |                   OR us - lag(us) OVER w > 1800000000 THEN 1
      |              ELSE 0 END AS new_s
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY us)
      |),
      |sessions AS (
      |  SELECT user_id,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us) AS sid,
      |         us
      |  FROM flagged
      |),
      |per_session AS (
      |  SELECT user_id, sid, count(*) AS n_events,
      |         (max(us) - min(us)) / 1000000.0 AS duration_sec
      |  FROM sessions GROUP BY 1, 2
      |)
      |SELECT n_events,
      |       count(*) AS n_sessions,
      |       ${Sql.avgFloat("duration_sec")} AS avg_duration_sec
      |FROM per_session
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy("user_id").orderBy("us")
    val e = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val flagged = e.withColumn("new_s",
      when(lag(col("us"), 1).over(byUser).isNull ||
        col("us") - lag(col("us"), 1).over(byUser) > 1800000000L, 1)
        .otherwise(0))
    val sessions = flagged.withColumn("sid", sum(col("new_s")).over(byUser))
    sessions
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        ((max(col("us")) - min(col("us"))) / 1000000.0).as("duration_sec"))
      .groupBy("n_events")
      .agg(
        count(lit(1)).as("n_sessions"),
        // duration doubles carry division garbage near the decimal
        // quantization grain — string-route exact mean (see Ops.avgFloat)
        Ops.avgFloat(col("duration_sec")).as("avg_duration_sec"))
      .orderBy("n_events")
  }

  /** Daily active users + event volume per event type — count_distinct
    * at the partial-agg level (Spark expands it to a two-phase
    * aggregation; the shuffle carries (type, day, user) partials, still
    * bounded by distinct triples, not input rows). */
  val userActivity: NamedQuery = NamedQuery(
    "events_user_activity",
    """SELECT event_type,
      |       CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |       count(*) AS n_events,
      |       count(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(
        col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type", "day")
  }

  /** As-of / gap-filled price series: a complete per-minute grid over the
    * last 6 h per symbol, each grid point carrying the close of the last
    * candle AT OR BEFORE it (forward fill = as-of join of the grid
    * against the candle table). Single shuffle on symbol; the grid is
    * minutes×symbols — O(window), independent of trade volume. */
  val gapfillAsof: NamedQuery = NamedQuery(
    "trades_gapfill_asof",
    s"""${Sql.tradesWith},
       |bounds AS (
       |  SELECT t_anchor - INTERVAL 360 MINUTE AS t0, t_anchor AS t1
       |  FROM anchor
       |),
       |candles AS (
       |  SELECT symbol, date_trunc('minute', ts) AS minute,
       |         max_by(price, ts) AS close
       |  FROM trades, bounds
       |  WHERE ts >= t0
       |  GROUP BY 1, 2
       |),
       |grid AS (
       |  SELECT s.symbol, g.minute
       |  FROM (SELECT DISTINCT symbol FROM candles) s
       |  CROSS JOIN (
       |    SELECT unnest(generate_series(date_trunc('minute', t0),
       |                                  date_trunc('minute', t1),
       |                                  INTERVAL 1 MINUTE)) AS minute
       |    FROM bounds) g
       |)
       |SELECT grid.symbol, grid.minute,
       |       last_value(candles.close IGNORE NULLS) OVER (
       |         PARTITION BY grid.symbol ORDER BY grid.minute
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_ff
       |FROM grid
       |LEFT JOIN candles
       |  ON candles.symbol = grid.symbol AND candles.minute = grid.minute
       |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val anchorUs = Tables.anchorMicros(s, d)
    val t0Us = anchorUs - 360L * 60L * 1000000L
    val candles = Tables.trades(s, d, Some(t0Us))
      .groupBy(col("symbol"), Ops.minuteOf(col("ts")).as("minute"))
      .agg(max_by(col("price"), col("ts")).as("close"))
    val grid = candles.select("symbol").distinct()
      .crossJoin(
        candles.sparkSession.range(1).select(explode(sequence(
          lit(floorMinuteTs(t0Us)), lit(floorMinuteTs(anchorUs)),
          expr("INTERVAL 1 MINUTE"))).as("minute")))
    val ff = Window.partitionBy(col("symbol")).orderBy(col("minute"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(candles, Seq("symbol", "minute"), "left")
      .select(col("symbol"), col("minute"),
        last(col("close"), ignoreNulls = true).over(ff).as("close_ff"))
      .orderBy("symbol", "minute")
  }

  /** Epoch-micros floored to the minute, as a literal-friendly Timestamp. */
  private def floorMinuteTs(us: Long): java.sql.Timestamp =
    new java.sql.Timestamp(us / 60000000L * 60000L)

  /** Semi-structured props: JSON-path extraction in the batch path (the
    * streaming path's `from_json` sibling, S2) — parse `props.k`, then
    * ordinary typed aggregation. JSON parsing is per-row map work; the
    * aggregation shuffles only (event_type) partials. */
  val propsStats: NamedQuery = NamedQuery(
    "events_props_stats",
    """SELECT event_type,
      |       count(*) AS n,
      |       CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
      |            AS BIGINT) AS sum_k,
      |       CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
      |            AS DOUBLE) / count(*) AS avg_k,
      |       min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |       max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(k).as("sum_k"),
        (sum(k).cast("double") / count(lit(1))).as("avg_k"),
        min(k).as("min_k"),
        max(k).as("max_k"))
      .orderBy("event_type")
  }

  /** User retention across the two halves of the event range. The oracle
    * keeps the set-operation formulation (INTERSECT / EXCEPT over distinct
    * user sets — the set-op OPERATORS stay covered by
    * [[cohortSetOps]]); the engine computes the same three counts in ONE
    * fact scan: `groupBy(user_id).agg(min(us), max(us))` classifies each
    * user against the broadcast range midpoint (a user was active early
    * iff their FIRST event is before it, late iff their LAST is at/after
    * it), then one conditional aggregation folds the booleans to counts.
    * The round-5 set-op version re-read the fact table 4–6×; here the
    * per-user aggregate's shuffle exchange is shared by the bounds branch
    * (same canonical subtree → ReuseExchange), so `events` is scanned
    * once and the shuffle carries one (min,max) pair per user. */
  val userRetention: NamedQuery = NamedQuery(
    "events_user_retention",
    """WITH b AS (
      |  SELECT min(epoch_us(CAST(ts AS TIMESTAMP))) AS t0,
      |         max(epoch_us(CAST(ts AS TIMESTAMP))) AS t1
      |  FROM events
      |),
      |early AS (
      |  SELECT DISTINCT user_id FROM events, b
      |  WHERE epoch_us(CAST(ts AS TIMESTAMP)) < (t0 + t1) / 2
      |),
      |late AS (
      |  SELECT DISTINCT user_id FROM events, b
      |  WHERE epoch_us(CAST(ts AS TIMESTAMP)) >= (t0 + t1) / 2
      |)
      |SELECT
      |  (SELECT count(*) FROM (SELECT * FROM early INTERSECT SELECT * FROM late)) AS n_retained,
      |  (SELECT count(*) FROM (SELECT * FROM early EXCEPT SELECT * FROM late)) AS n_churned,
      |  (SELECT count(*) FROM (SELECT * FROM late EXCEPT SELECT * FROM early)) AS n_new""".stripMargin) { (s, d) =>
    val perUser = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .groupBy("user_id")
      .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"))
    // global bounds derive from the per-user extrema (min of firsts ==
    // global min, max of lasts == global max), so the bounds branch is a
    // re-aggregation of the SAME per-user exchange, not a second scan
    val bounds = perUser
      .agg(min(col("first_us")).as("t0"), max(col("last_us")).as("t1"))
    // double midpoint, matching the oracle's (t0+t1)/2 double division
    val mid = (col("t0") + col("t1")) / 2
    val early = col("first_us") < mid
    val late = col("last_us") >= mid
    perUser.crossJoin(broadcast(bounds))
      .agg(
        count(when(early && late, 1)).as("n_retained"),
        count(when(early && !late, 1)).as("n_churned"),
        count(when(!early && late, 1)).as("n_new"))
  }

  /** Shared oracle for both as-of formulations — DuckDB's native
    * ASOF LEFT JOIN, an independent implementation of the semantics. */
  private val asofOracle: String =
    s"""WITH ev AS (
       |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
       |         value
       |  FROM events
       |),
       |c AS (
       |  SELECT user_id, ts, max_by(value, event_id) AS click_value
       |  FROM ev WHERE event_type = 'click' GROUP BY 1, 2
       |),
       |p AS (
       |  SELECT user_id, ts FROM ev WHERE event_type = 'purchase'
       |),
       |j AS (
       |  SELECT p.user_id, p.ts, c.ts AS click_ts, c.click_value
       |  FROM p ASOF LEFT JOIN c
       |    ON p.user_id = c.user_id AND p.ts >= c.ts
       |)
       |SELECT user_id,
       |       count(*) AS n_purchases,
       |       count(click_ts) AS n_attributed,
       |       CAST(coalesce(sum(epoch_us(ts) - epoch_us(click_ts)), 0)
       |            AS BIGINT) AS lag_us_total,
       |       ${Sql.dsum("coalesce(click_value, 0)")} AS attributed_value
       |FROM j
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  /** Per-user attribution stats over an as-of-joined frame carrying
    * `user_id`, purchase `ts`, and the matched `click_ts`/click value —
    * the shared tail of both as-of formulations (they must stay
    * identical for the shared oracle to hold). */
  private def attributionStats(joined: DataFrame,
                               clickValue: String): DataFrame =
    joined
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_purchases"),
        count(col("click_ts")).as("n_attributed"),
        coalesce(sum(unix_micros(col("ts")) - unix_micros(col("click_ts"))),
          lit(0L)).as("lag_us_total"),
        Ops.dsum(coalesce(col(clickValue), lit(0.0)))
          .as("attributed_value"))
      .orderBy("user_id")

  /** True two-table AS-OF join — last-click attribution: every `purchase`
    * event joins the most recent `click` by the same user at or before its
    * timestamp, then per-user attribution stats. The reference has no as-of
    * operator (its forward-fill shape is `trades_gapfill_asof`); this is
    * the general two-relation form a trading engine needs (trade↔quote).
    *
    * Built-ins-only formulation: a per-row range join would be O(n·m)
    * within each user, so this uses union-then-window — tag both sides,
    * sort each user's merged timeline once, carry the last click forward
    * with `last(..., ignoreNulls)`: ONE hash shuffle on user_id + one
    * in-partition sort, the same asymptotics as a sort-merge join, at
    * any scale. Ordering (ts, side) with clicks first realizes the
    * inclusive `>=` bound; clicks are pre-deduplicated per (user, ts) so
    * the as-of pick is well-defined in both engines. */
  val asofAttribution: NamedQuery = NamedQuery(
    "events_asof_attribution", asofOracle) { (s, d) =>
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .groupBy("user_id", "ts")
      .agg(max_by(col("value"), col("event_id")).as("click_value"))
      .select(col("user_id"), col("ts"), lit(0).as("side"), col("click_value"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"),
        lit(null).cast("double").as("click_value"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    attributionStats(
      clicks.unionByName(purchases)
        .withColumn("click_ts",
          last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
        .withColumn("cv",
          last(when(col("side") === 0, col("click_value")), ignoreNulls = true)
            .over(w))
        .where(col("side") === 1),
      clickValue = "cv")
  }

  /** The same attribution query driven by the engine's OWN as-of
    * operator ([[graft.plans.AsofJoin]] — logical node + strategy +
    * partition-local sorted-merge physical plan): the driver's DuckDB
    * compare checks the custom operator's results against DuckDB's
    * native ASOF JOIN, and [[asofAttribution]] (union+window built-ins)
    * triangulates the same semantics a third way. */
  val asofNative: NamedQuery = NamedQuery(
    "events_asof_native", asofOracle) { (s, d) =>
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .groupBy("user_id", "ts")
      .agg(max_by(col("value"), col("event_id")).as("click_value"))
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("click_value"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
    attributionStats(
      graft.plans.Asof.join(purchases, clicks,
        Seq("user_id"), Seq("c_user"), "ts", "click_ts"),
      clickValue = "click_value")
  }

  /** The same attribution query a THIRD way — through the pure SQL
    * surface: `GraftFunctions.register` injects the `graft_asof`
    * table-valued function ([[graft.plans.AsofSql]]) and its planner
    * strategy, the two sides register as temp views, and `spark.sql`
    * does the rest. Proves the strategy-injection path end-to-end (parse
    * → analyze → [[graft.plans.AsofJoin]] → [[graft.plans.AsofJoinExec]])
    * against the same DuckDB ASOF JOIN oracle as its two DataFrame
    * siblings. Temp-view names are engine-prefixed AND suffixed with the
    * corpus-dir hash: two concurrent invocations on one session against
    * different dirs must not silently read each other's views
    * (createOrReplace per invocation is still the temp-view idiom). */
  val asofSqlPath: NamedQuery = NamedQuery(
    "events_asof_sql", asofOracle) { (s, d) =>
    graft.functions.GraftFunctions.register(s)
    val tag = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(d))
    val clicksView = s"graft_asof_clicks_$tag"
    val purchasesView = s"graft_asof_purchases_$tag"
    val ev = Tables.events(s, d)
    ev.where(col("event_type") === "click")
      .groupBy("user_id", "ts")
      .agg(max_by(col("value"), col("event_id")).as("click_value"))
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("click_value"))
      .createOrReplaceTempView(clicksView)
    ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
      .createOrReplaceTempView(purchasesView)
    attributionStats(
      s.sql(s"""SELECT * FROM graft_asof(
              |  '$purchasesView', '$clicksView',
              |  'user_id', 'c_user', 'ts', 'click_ts')""".stripMargin),
      clickValue = "click_value")
  }

  /** Day × event-type PIVOT matrix — the relational `pivot` operator with
    * an EXPLICIT value list (an implicit list would cost a distinct-scan
    * to discover columns and make the schema data-dependent — wrong at
    * scale). Plans as one hash aggregation with a conditional count per
    * pivoted value, exactly the oracle's FILTER matrix; absent
    * combinations are coalesced to 0 to match SQL count semantics. */
  val typePivot: NamedQuery = NamedQuery(
    "events_type_pivot",
    """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |       count(*) FILTER (WHERE event_type = 'click') AS click,
      |       count(*) FILTER (WHERE event_type = 'error') AS error,
      |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
      |       count(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("day") +: types.map(t =>
        coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("day")
  }

  /** ClickHouse-style `windowFunnel`: per user, the deepest prefix of the
    * step chain view → click → purchase completed IN ORDER within 24 h of
    * the first step, reported as users-reaching-depth counts. The oracle
    * keeps the per-stage join formulation (u1 ⋈ u2 ⋈ u3 — an independent
    * derivation of the semantics); the engine resolves all three step
    * anchors in ONE fact scan + ONE shuffle: three chained conditional-MIN
    * window aggregates over the same user_id partitioning (t1 = first
    * view; t2 = first in-window click ≥ t1; t3 = first purchase in
    * [t2, t1+24 h]) — consecutive windows over one partitioning share one
    * exchange, every row of a user carries the same t1/t2/t3, and a final
    * global conditional count folds them to depth counts. The round-5
    * version instead re-scanned `events` once per stage. */
  val funnel: NamedQuery = NamedQuery(
    "events_funnel",
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
      |),
      |u1 AS (
      |  SELECT user_id, min(ts) AS t1
      |  FROM ev WHERE event_type = 'view' GROUP BY 1
      |),
      |u2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2
      |  FROM ev e JOIN u1 ON e.user_id = u1.user_id
      |  WHERE e.event_type = 'click'
      |    AND e.ts >= u1.t1 AND e.ts <= u1.t1 + INTERVAL 24 HOUR
      |  GROUP BY 1
      |),
      |u3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3
      |  FROM ev e
      |  JOIN u1 ON e.user_id = u1.user_id
      |  JOIN u2 ON e.user_id = u2.user_id
      |  WHERE e.event_type = 'purchase'
      |    AND e.ts >= u2.t2 AND e.ts <= u1.t1 + INTERVAL 24 HOUR
      |  GROUP BY 1
      |)
      |SELECT (SELECT count(*) FROM u1) AS d1_view,
      |       (SELECT count(*) FROM u2) AS d2_click,
      |       (SELECT count(*) FROM u3) AS d3_purchase""".stripMargin) {
    (s, d) =>
    val windowUs = 24L * 3600L * 1000000L
    val w = Window.partitionBy("user_id")
    // each level's condition references the previous level's anchor; a
    // null anchor nulls the condition, so `when` skips the row and the
    // deeper anchor stays null — exactly the oracle's inner-join pruning
    val t1 = min(when(col("event_type") === "view", col("us"))).over(w)
    val t2 = min(when(col("event_type") === "click" &&
      col("us") >= col("t1") && col("us") <= col("t1") + windowUs,
      col("us"))).over(w)
    val t3 = min(when(col("event_type") === "purchase" &&
      col("us") >= col("t2") && col("us") <= col("t1") + windowUs,
      col("us"))).over(w)
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("t1", t1)
      .withColumn("t2", t2)
      .withColumn("t3", t3)
      .agg(
        countDistinct(when(col("t1").isNotNull, col("user_id"))).as("d1_view"),
        countDistinct(when(col("t2").isNotNull, col("user_id"))).as("d2_click"),
        countDistinct(when(col("t3").isNotNull, col("user_id"))).as("d3_purchase"))
  }

  /** Approximate distinct users per event type — HyperLogLog++ sketch
    * (`approx_count_distinct`) beside the exact count. At 100 TB the
    * sketch is the difference between a fixed-size partial aggregate and
    * a shuffle carrying every distinct key. No other engine reproduces
    * HLL estimates bit-for-bit, so the raw estimate cannot be hash-
    * compared; instead the query is SELF-VALIDATING (the
    * `emb_ivf_recall` pattern): it emits the oracle-computable exact
    * columns plus `approx_ok`, an in-query accuracy gate
    * `|approx − exact| / exact < 0.15` — 3× the HLL++ default rsd (5%),
    * so an estimate landing outside 1σ on a new corpus (a-priori ~1/3
    * per group) doesn't spuriously fail the whole query; merge is
    * register-max and order-insensitive, so the flag is deterministic.
    * The DuckDB twin asserts the flag literally — a drifting sketch
    * flips it to false and fails the hash compare. */
  val approxUsers: NamedQuery = NamedQuery(
    "events_approx_users",
    """SELECT event_type,
      |       count(DISTINCT user_id) AS exact_users,
      |       count(*) AS n_events,
      |       TRUE AS approx_ok
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .select(
        col("event_type"),
        col("exact_users"),
        col("n_events"),
        when(col("exact_users") === 0, col("approx_users") === 0)
          .otherwise(abs(col("approx_users") - col("exact_users")) /
            col("exact_users") < 0.15).as("approx_ok"))
      .orderBy("event_type")
  }

  /** KMV sketch size and hash-space width shared by both engine twins
    * (string-interpolated into the oracle so they cannot drift). 40-bit
    * hashes keep every intermediate exact in both engines: hv < 2^40 and
    * (k-1)·H = 63·2^40 ≈ 6.9e13 < 2^53, so the estimator is one exact
    * integer-valued double divide + floor. */
  private val KmvK = 64
  private val KmvNum: Long = (KmvK - 1).toLong * (1L << 40)

  /** Deterministic distinct-user sketch — KMV (k-minimum-values) over a
    * 40-bit md5-prefix hash via the bounded [[graft.functions.KMinValues]]
    * aggregate. The cross-engine-checkable counterpart to
    * `events_approx_users`' HLL: "k smallest distinct hashes" has exactly
    * one answer, so unlike HLL the whole sketch AND its estimate
    * `floor((k-1)·H / kth_min)` hash-match a DuckDB twin bit-for-bit.
    * Scale shape: partial aggregation sends ≤ k longs per (task, group)
    * into the shuffle — O(groups·k) exchanged bytes regardless of input
    * rows (`exact_users` is the validation column; a production rollout
    * drops it and with it the O(distinct) shuffle). */
  val kmvUsers: NamedQuery = NamedQuery(
    "events_kmv_users",
    s"""WITH h AS (
      |  SELECT DISTINCT event_type,
      |         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 10) AS BIGINT) AS hv
      |  FROM events
      |),
      |r AS (
      |  SELECT event_type, hv,
      |         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      |  FROM h
      |),
      |g AS (
      |  SELECT event_type,
      |         max(hv) FILTER (WHERE rn <= $KmvK) AS kth_hash,
      |         CAST(count(*) FILTER (WHERE rn <= $KmvK) AS BIGINT) AS m
      |  FROM r GROUP BY 1
      |),
      |ex AS (
      |  SELECT event_type, count(DISTINCT user_id) AS exact_users
      |  FROM events GROUP BY 1
      |)
      |SELECT g.event_type, ex.exact_users,
      |       CASE WHEN g.m < $KmvK THEN g.m
      |            ELSE CAST(floor($KmvNum.0 / g.kth_hash) AS BIGINT) END AS est_users,
      |       g.kth_hash
      |FROM g JOIN ex ON g.event_type = ex.event_type
      |ORDER BY 1""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.register(s)
    Tables.events(s, d)
      .select(
        col("event_type"),
        col("user_id"),
        expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 10), 16, 10) AS BIGINT)")
          .as("hv"))
      .groupBy("event_type")
      .agg(
        expr(s"graft_kmv(hv, $KmvK)").as("kmv"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(
        col("event_type"),
        col("exact_users"),
        when(size(col("kmv")) < KmvK, size(col("kmv")).cast("long"))
          .otherwise(floor(lit(KmvNum.toDouble) /
            element_at(col("kmv"), KmvK)).cast("long")).as("est_users"),
        element_at(col("kmv"), size(col("kmv"))).as("kth_hash"))
      .orderBy("event_type")
  }

  /** CUBE grouping sets — all four aggregation levels (type×day, per
    * type, per day, grand total) in ONE pass: partial aggs per grouping
    * set, same single-shuffle profile as a flat group-by (the ROLLUP
    * sibling is `joins_revenue_rollup`). NULLS FIRST pins the subtotal
    * rows' sort position to Spark's asc-nulls-first default. */
  val typeCube: NamedQuery = NamedQuery(
    "events_type_cube",
    s"""SELECT event_type,
      |       CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |       count(*) AS n_events,
      |       ${Sql.dsum("value")} AS total_value
      |FROM events
      |GROUP BY CUBE (event_type,
      |               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .cube(
        col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        Ops.dsum(col("value")).as("total_value"))
      .orderBy("event_type", "day")
  }

  /** The value-band dimension: (band_id, lo, hi) half-open intervals,
    * shared verbatim by both twins. Sorted, non-overlapping, covering. */
  private val ValueBands: Seq[(Int, Double, Double)] = Seq(
    (0, 0.0, 25.0), (1, 25.0, 100.0), (2, 100.0, 250.0),
    (3, 250.0, 1000000.0))

  /** Range (non-equi) join — classify events into value bands via
    * `lo <= value < hi` against a broadcast band dimension. Spark plans a
    * BroadcastNestedLoopJoin: with a CONSTANT-size band table that is the
    * correct 100 TB plan — O(bands) comparisons per row, map-side, no
    * shuffle of the fact table at all (the general big-big range join
    * instead needs bucketing on a coarsened key; the as-of operator
    * covers the ordered flavor of that problem). Sorted non-overlapping
    * bands could also compile to a binary-search CASE chain; the join
    * formulation keeps the dimension data-driven. */
  val valueBands: NamedQuery = {
    val bandsSql = ValueBands.map { case (id, lo, hi) =>
      s"($id, CAST($lo AS DOUBLE), CAST($hi AS DOUBLE))"
    }.mkString(", ")
    NamedQuery(
      "events_value_bands",
      s"""SELECT band_id, lo, hi,
         |       count(*) AS n_events,
         |       ${Sql.dsum("value")} AS total_value
         |FROM events
         |JOIN (VALUES $bandsSql) AS b(band_id, lo, hi)
         |  ON value >= lo AND value < hi
         |GROUP BY 1, 2, 3
         |ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      val bands = ValueBands.toDF("band_id", "lo", "hi")
      Tables.events(s, d)
        .join(broadcast(bands),
          col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy("band_id", "lo", "hi")
        .agg(
          count(lit(1)).as("n_events"),
          Ops.dsum(col("value")).as("total_value"))
        .orderBy("band_id")
    }
  }

  /** Count-min sketch dimensions, shared by both twins: d hash rows ×
    * w slots. Each row's 4 slot indices come from 32-bit md5 prefixes —
    * exact in BIGINT in both engines. */
  private val CmsD = 4
  private val CmsW = 256

  /** Count-min-sketch heavy hitters — the purely-relational CMS
    * formulation: the sketch IS `GROUP BY (row, slot) → count`, so
    * building it shuffles at most d·w = 1024 partial counts
    * regardless of input rows (the 100 TB win: frequency estimation with
    * a fixed-size exchange). Estimates (min over the d rows' counters,
    * upward-biased by construction) are checked against exact counts for
    * the exact top-10 users. Everything is counting + md5 → fully
    * deterministic cross-engine, unlike sketches with RNG seeds. */
  val cmsHeavy: NamedQuery = NamedQuery(
    "events_cms_heavy",
    s"""WITH pos AS (
       |  SELECT j,
       |         CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
       |              || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
       |           % $CmsW AS slot
       |  FROM events, unnest(range(0, $CmsD)) AS u(j)
       |),
       |cms AS (
       |  SELECT j, slot, count(*) AS c FROM pos GROUP BY 1, 2
       |),
       |top AS (
       |  SELECT user_id, count(*) AS exact_n
       |  FROM events GROUP BY 1
       |  ORDER BY exact_n DESC, user_id LIMIT 10
       |),
       |probe AS (
       |  SELECT user_id, exact_n, j,
       |         CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
       |              || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
       |           % $CmsW AS slot
       |  FROM top, unnest(range(0, $CmsD)) AS u(j)
       |)
       |SELECT p.user_id, p.exact_n,
       |       CAST(min(cms.c) AS BIGINT) AS cms_est
       |FROM probe p
       |JOIN cms ON cms.j = p.j AND cms.slot = p.slot
       |GROUP BY 1, 2
       |ORDER BY exact_n DESC, user_id""".stripMargin) { (s, d) =>
    def slot(jCol: String) = expr(
      s"cast(conv(substr(md5(concat(cast($jCol AS string), ':', " +
        s"cast(user_id AS string))), 1, 8), 16, 10) AS bigint) % $CmsW")
      .as("slot")
    val ev = Tables.events(s, d).select("user_id")
    val withJ = ev.select(col("user_id"),
      explode(sequence(lit(0), lit(CmsD - 1))).as("j"))
    val cms = withJ.select(col("j"), slot("j"))
      .groupBy("j", "slot").agg(count(lit(1)).as("c"))
    val top = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("user_id")).limit(10)
    top
      .select(col("user_id"), col("exact_n"),
        explode(sequence(lit(0), lit(CmsD - 1))).as("j"))
      .select(col("user_id"), col("exact_n"), col("j"), slot("j"))
      .join(broadcast(cms), Seq("j", "slot"))
      .groupBy("user_id", "exact_n")
      .agg(min(col("c")).as("cms_est"))
      .orderBy(col("exact_n").desc, col("user_id"))
  }

  /** ClickHouse `sequenceMatch('(?1)(?t<=600)(?2)')` — did a `view` get
    * followed by a `click` within 10 minutes? Formulated as ONE window
    * pass, not a pair join: each event learns its user's earliest
    * FOLLOWING click, and a view matches iff that click lands inside
    * the bound (the earliest following click is in-window iff any is).
    * One shuffle on user_id, zero pair explosion — the view×click
    * interval join formulation would square on hot users; this never
    * does. Total order (ts, event_id) makes same-timestamp sequences
    * deterministic in both engines.
    *
    * The Spark spelling computes the suffix-min as a RUNNING min under
    * the REVERSED order (`ORDER BY ts DESC, event_id DESC ROWS
    * UNBOUNDED PRECEDING → 1 PRECEDING`) — identical values to the
    * forward `1 FOLLOWING → UNBOUNDED FOLLOWING` frame, radically
    * different execution: Spark's unbounded-FOLLOWING frame
    * re-evaluates the aggregate from the current row to the partition
    * end for EVERY row (O(rows²) per partition —
    * `UnboundedFollowingWindowFunctionFrame` has no inverse-update
    * path), while the unbounded-PRECEDING frame accumulates one state
    * in a single pass (O(rows)). The r9/r10 captures measured the
    * difference: per-user streams grow F× by `ScaleCorpus`
    * construction, and the forward-frame spelling's window compute
    * grew ~F² (the 11.4× wall at 30× that flagged this query); the
    * reversed spelling is linear per partition at any stream length.
    * The oracle keeps the forward spelling — an independent derivation
    * of the same values. */
  val seqMatch: NamedQuery = NamedQuery(
    "events_seq_match",
    """WITH w AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
      |         min(CASE WHEN event_type = 'click'
      |                  THEN CAST(ts AS TIMESTAMP) END)
      |           OVER (PARTITION BY user_id
      |                 ORDER BY CAST(ts AS TIMESTAMP), event_id
      |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
      |           AS next_click
      |  FROM events
      |)
      |SELECT count(DISTINCT user_id) AS n_users,
      |       count(DISTINCT CASE WHEN event_type = 'view'
      |                 AND next_click <= ts + INTERVAL 10 MINUTE
      |                 THEN user_id END) AS n_matched_users,
      |       count(CASE WHEN event_type = 'view'
      |                 AND next_click <= ts + INTERVAL 10 MINUTE
      |                 THEN 1 END) AS n_matched_views
      |FROM w""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val matched = col("event_type") === "view" &&
      unix_micros(col("next_click")) <=
        unix_micros(col("ts")) + 600L * 1000000L
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("next_click",
        min(when(col("event_type") === "click", col("ts"))).over(w))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(matched, col("user_id"))).as("n_matched_users"),
        count(when(matched, 1)).as("n_matched_views"))
  }

  private val MgK = 128

  /** ClickHouse-`topK`-style exact heavy hitters in TWO passes, driven by
    * the [[graft.functions.MisraGries]] mergeable summary: pass 1 reduces
    * the stream to ≤ [[MgK]] candidate ids (O(k) state per task, O(k·tasks)
    * shuffled — an exact group-by would shuffle every distinct user);
    * pass 2 re-counts ONLY candidate rows (broadcast semi-filter on the
    * scan) and keeps those exceeding the n/k threshold. The MG guarantee —
    * any item with count > n/(k+1) survives every update/merge order —
    * makes the candidate set provably complete above the threshold, so
    * the final output is deterministic and oracle-checkable even though
    * the summary's extra members are order-noise: the oracle computes the
    * same answer with a full exact group-by + HAVING. */
  val mgHeavy: NamedQuery = NamedQuery(
    "events_mg_heavy",
    s"""WITH t AS (SELECT count(*) AS total FROM events
       |           WHERE user_id IS NOT NULL)
       |SELECT user_id, count(*) AS n_events
       |FROM events, t
       |WHERE user_id IS NOT NULL
       |GROUP BY user_id, t.total
       |HAVING count(*) > t.total / $MgK.0
       |ORDER BY n_events DESC, user_id""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.register(s)
    // null guard on BOTH twins: graft_mg drops nulls and the candidate
    // join can never match one, but the oracle's GROUP BY would emit a
    // NULL-user group — filter explicitly so a null-bearing corpus can't
    // diverge (no-op on the current corpus)
    val ev = Tables.events(s, d).select("user_id")
      .where(col("user_id").isNotNull)
    // n rides along the sketch aggregation — TWO scans total, not three
    val cand = ev
      .agg(expr(s"graft_mg(user_id, $MgK)").as("cand"),
        count(lit(1)).as("total"))
      .select(col("total"), explode(col("cand")).as("user_id"))
    ev.join(broadcast(cand), "user_id")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), min(col("total")).as("total"))
      .where(col("n_events") > col("total") / lit(MgK.toDouble))
      .select(col("user_id"), col("n_events"))
      .orderBy(col("n_events").desc, col("user_id"))
  }

  /** Cohort arithmetic via the remaining SET OPERATIONS (SURVEY §2.5/C4
    * closes with this: UNION ALL is exercised by `trades_dedup_replay` /
    * the unpivot oracle; INTERSECT and EXCEPT land here): viewers who
    * never purchased (EXCEPT) vs viewers who also purchased (INTERSECT).
    * Both set ops plan as aggregations/joins over the DISTINCT user sets
    * — hash shuffles on the near-unique user key, no pair explosion; the
    * counts are set cardinalities so the answer is order-free by
    * construction. */
  val cohortSetOps: NamedQuery = NamedQuery(
    "events_cohort_set_ops",
    """WITH v AS (SELECT DISTINCT user_id FROM events
      |           WHERE event_type = 'view'),
      |p AS (SELECT DISTINCT user_id FROM events
      |      WHERE event_type = 'purchase')
      |SELECT 'view_and_purchase' AS cohort,
      |       (SELECT count(*) FROM (SELECT * FROM v INTERSECT
      |                              SELECT * FROM p)) AS n_users
      |UNION ALL
      |SELECT 'view_only',
      |       (SELECT count(*) FROM (SELECT * FROM v EXCEPT
      |                              SELECT * FROM p))
      |ORDER BY 1""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    def users(t: String) = ev.where(col("event_type") === t)
      .select("user_id").distinct()
    val v = users("view")
    val p = users("purchase")
    v.intersect(p).agg(count(lit(1)).as("n_users"))
      .select(lit("view_and_purchase").as("cohort"), col("n_users"))
      .unionAll(
        v.except(p).agg(count(lit(1)).as("n_users"))
          .select(lit("view_only").as("cohort"), col("n_users")))
      .orderBy("cohort")
  }

  val all: Seq[NamedQuery] = Seq(
    sessionization, userActivity, gapfillAsof, propsStats, userRetention,
    asofAttribution, asofNative, asofSqlPath, funnel, typePivot,
    approxUsers, kmvUsers, typeCube, valueBands, cmsHeavy, seqMatch,
    mgHeavy, cohortSetOps)
}

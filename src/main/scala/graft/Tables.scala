package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus table loaders plus the `trades` role-cast.
  *
  * The driver corpus (TESTDATA.md) is a TPC-H-ish star schema plus
  * `events`, `documents`, `embeddings`. The reference engine's single fact
  * table `crypto.trades` (reference: sql/V1__create_trades_table.sql:3-16)
  * is role-cast onto `events` per FIXTURES.md §B:
  * event_type→symbol, value→price, derived qty, event_id→trade_id,
  * event_id%2→is_buyer_maker.
  *
  * Schemas come from the driver-written parquet footers (fixed, versioned
  * upstream) — never inferred from data (SURVEY.md §1.2).
  */
object Tables {

  val corpusTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame =
    wideScan(spark, dir, "documents", "doc_id")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    wideScan(spark, dir, "embeddings", "vec_id")

  // Scan-partition counts are stable per (session, path) — memoized so the
  // guard's one-time plan+listing probe doesn't re-run per query build.
  private val scanPartsCache =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, Integer]]()

  /** CPU-heavy-per-row corpus reader (`documents`/`embeddings`: tokenize,
    * hash, vector math dominate the scan). A small single-file parquet
    * input plans ONE scan task, serializing the whole narrow stage on one
    * core regardless of `local[N]` — sf0.1's one-file `documents.parquet`
    * ran `docs_bm25_topk` 6× slower than the (8-file) 10× corpus. Guard:
    * when the scan plans fewer partitions than `defaultParallelism`,
    * hash-repartition on the unique id column — deterministic, and
    * result-identical for every consumer (aggregations, sorted heads,
    * least/greatest-normalized pair sets). `repartition(n, col)` is
    * REPARTITION_BY_NUM, so AQE cannot coalesce it back to one task; on a
    * real many-file 100 TB input `parts >= cores` and the guard is a
    * no-op. Filters still push through the repartition to the scan
    * (`PushPredicateThroughNonJoin` handles RepartitionByExpression). */
  private def wideScan(spark: SparkSession, dir: String,
                       name: String, idCol: String): DataFrame = {
    val df = table(spark, dir, name)
    if (sys.env.get("SPARK_GRAFT_WIDE_SCAN").contains("off")) return df
    val cores = spark.sparkContext.defaultParallelism
    val perSession = scanPartsCache.synchronized {
      var m = scanPartsCache.get(spark)
      if (m == null) {
        m = new ConcurrentHashMap[String, Integer]()
        scanPartsCache.put(spark, m)
      }
      m
    }
    val parts = perSession.computeIfAbsent(s"$dir/$name",
      { _: String => Integer.valueOf(df.rdd.getNumPartitions) })
    if (parts < cores) df.repartition(cores, col(idCol)) else df
  }

  /** `events.parquet` stores ts as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects by default; `nanosAsLong` reads it as epoch-nanos
    * (LongType). The conf is OWNED by session bootstrap — every
    * engine-built session (Verify / Bench / Time / Explain / tests) sets
    * it in its builder, and the one externally-owned session (the
    * driver's smoke session) is patched in [[SparkEntry.entry]]. Loaders
    * must not mutate session state per call.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")

  /** Events with `ts` as TimestampType (microseconds, floor-truncated from
    * nanos — matching the DuckDB oracles' `CAST(ts AS TIMESTAMP)`).
    *
    * `sinceMicros` is THE scan-pruning hook: the predicate is applied to
    * the *raw epoch-nano long column before conversion*, so it reaches the
    * parquet scan as a pushed filter (row-group min/max skipping now,
    * partition pruning on a partitioned layout). A filter on the converted
    * timestamp would sit above a projection and never push down — the
    * round-1 scale-killer. `floor(ns/1000) >= us ⟺ ns >= us*1000` for the
    * positive epochs in play, so pre- and post-conversion filtering agree.
    */
  def events(spark: SparkSession, dir: String,
             sinceMicros: Option[Long] = None): DataFrame = {
    val raw = eventsRaw(spark, dir)
    raw.schema("ts").dataType match {
      case LongType =>
        val pruned = sinceMicros
          .map(us => raw.where(col("ts") >= lit(us * 1000L)))
          .getOrElse(raw)
        // integer division: a double division would lose precision above 2^53 ns
        pruned.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        // Non-nanos sources land here. TIMESTAMP_NTZ (what e.g. DuckDB-
        // written parquet reads back as) is normalized to TimestampType:
        // under the engine's fixed UTC session the cast is instant-
        // preserving, and downstream epoch math (unix_micros & co.)
        // requires the zoned type. The filter goes on the SOURCE column
        // before the cast so it still pushes down to the scan.
        val pruned = sinceMicros
          .map(us => raw.where(col("ts") >=
            lit(java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))
              .cast(raw.schema("ts").dataType)))
          .getOrElse(raw)
        pruned.schema("ts").dataType match {
          case org.apache.spark.sql.types.TimestampNTZType =>
            pruned.withColumn("ts", col("ts").cast("timestamp"))
          case _ => pruned
        }
    }
  }

  /** `events` role-cast as the reference's `crypto.trades` fact table
    * (reference: sql/V1__create_trades_table.sql:3-16). Column-for-column
    * mirror of the oracle CTE in [[graft.queries.Sql.tradesCte]] — the two
    * must stay in lockstep for the DuckDB hash-compare.
    */
  def trades(spark: SparkSession, dir: String,
             sinceMicros: Option[Long] = None): DataFrame =
    events(spark, dir, sinceMicros).select(
      col("event_type").as("symbol"),
      col("event_id").as("trade_id"),
      col("value").as("price"),
      (abs(col("value")) / lit(1000.0d)).as("qty"),
      col("ts"),
      (col("event_id") % 2).cast("int").as("is_buyer_maker"))

  // Weak-keyed by session so entries die with their session (an
  // identity-hash key could collide after GC and would leak forever);
  // invalidate(dir) covers data changing under a live session.
  private val anchorCache =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, Long]]()

  /** Drop memoized anchors for `dir` (all sessions) — call after
    * appending to / regenerating a corpus a live session already
    * queried. */
  def invalidateAnchor(dir: String): Unit = anchorCache.synchronized {
    anchorCache.values.forEach(m => { m.remove(dir); () })
  }

  /** Deterministic "query time" anchor: max event ts, in epoch-micros.
    * The reference anchors every lookback window at `now()` (reference:
    * api/server.py:73,98,122,153,190); wall-clock can never hash-match an
    * oracle, so windows anchor at max(ts) instead (SURVEY.md §5.1).
    *
    * Resolved ONCE per (session, dir) with a single ts-column scan and
    * memoized — a 1-row driver-side action, not a hot-path collect. Round 1
    * instead broadcast a 1-row anchor frame and compared two columns, which
    * (a) rescanned events per query and (b) kept the time predicate off the
    * parquet scan entirely (runtime filters apply to join keys, not range
    * predicates vs a broadcast scalar). A literal predicate is the
    * 100 TB-safe formulation: it prunes row groups and partitions.
    */
  /** Epoch-micros → `java.sql.Timestamp` at FULL micro precision — the
    * one conversion shared by every JVM-side anchor consumer (a
    * millisecond-based constructor would silently drop the µs remainder
    * and shift window cutoffs up to 999 µs). floorDiv/floorMod keep
    * pre-epoch instants exact too. */
  def microsToTimestamp(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  def anchorMicros(spark: SparkSession, dir: String): Long = {
    val perSession = anchorCache.synchronized {
      var m = anchorCache.get(spark)
      if (m == null) { m = new ConcurrentHashMap[String, Long](); anchorCache.put(spark, m) }
      m
    }
    perSession.computeIfAbsent(dir, { _ =>
      val raw = eventsRaw(spark, dir)
      val row = raw.agg(max(col("ts"))).head()
      if (row.isNullAt(0))
        throw new IllegalStateException(
          s"cannot anchor queries: events table at $dir has no rows")
      raw.schema("ts").dataType match {
        case LongType => row.getLong(0) / 1000L
        case _ =>
          // TIMESTAMP surfaces as java.sql.Timestamp, TIMESTAMP_NTZ as
          // LocalDateTime (treated as UTC wall time, matching the
          // session zone) — accept both row representations
          val t = row.get(0) match {
            case ts: java.sql.Timestamp => ts.toInstant
            case ldt: java.time.LocalDateTime =>
              ldt.toInstant(java.time.ZoneOffset.UTC)
            case i: java.time.Instant => i
            case other => throw new IllegalStateException(
              s"unsupported ts representation: ${other.getClass}")
          }
          t.getEpochSecond * 1000000L + t.getNano / 1000L
      }
    })
  }
}

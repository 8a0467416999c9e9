package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  /** `events.parquet` stores ts as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects by default. `nanosAsLong` reads it as epoch-nanos
    * (LongType); the loader converts back to TimestampType via integer
    * division (a double division would lose precision above 2^53 ns).
    * DuckDB oracles apply the matching `CAST(ts AS TIMESTAMP)` truncation.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events` role-cast as the reference's `crypto.trades` fact table
    * (reference: sql/V1__create_trades_table.sql:3-16). Column-for-column
    * mirror of the oracle CTE in [[graft.queries.Sql.tradesCte]] — the two
    * must stay in lockstep for the DuckDB hash-compare.
    */
  def trades(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_type").as("symbol"),
      col("event_id").as("trade_id"),
      col("value").as("price"),
      (abs(col("value")) / lit(1000.0d)).as("qty"),
      col("ts"),
      (col("event_id") % 2).cast("int").as("is_buyer_maker"))

  /** One-row frame holding the deterministic "query time" anchor: the max
    * event timestamp. The reference anchors every lookback window at
    * `now()` (reference: api/server.py:73,98,122,153,190); wall-clock can
    * never hash-match an oracle, so all windows anchor here instead
    * (SURVEY.md §5.1). Broadcast-joined, so it adds no shuffle.
    */
  def asOf(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).agg(max(col("ts")).as("_asof"))
}

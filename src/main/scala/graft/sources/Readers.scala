package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType, TimestampType}

import graft.streaming.TradeIngest

/** Batch source formats beyond parquet — schema-EXPLICIT readers (the
  * engine never infers schemas, SURVEY.md §1.2: the reference's shapes
  * are DDL-declared). Each reader takes the target StructType so a
  * malformed file surfaces as null columns / permissive-mode rows rather
  * than a silently different schema.
  *
  * The trades wire schema lives in [[graft.streaming.TradeIngest]];
  * [[tradesCsv]]/[[tradesJson]] read at-rest exports of the same rows —
  * the interchange formats a reference user would hand the engine
  * besides parquet.
  */
object Readers {

  /** CSV with explicit schema: header expected, UTC timestamps,
    * permissive mode (corrupt rows null out, never abort a 100 TB
    * backfill mid-way). Timestamp columns read as strings and convert
    * via the lenient string→timestamp CAST rather than one strict
    * `timestampFormat`: real exports legitimately vary between
    * space-separated, ISO-'T', and offset-suffixed renderings (Spark's
    * own CSV writer emits the 'T' form), and a single strict pattern
    * would silently null every one of the other shapes. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val stringized = StructType(schema.map(f =>
      if (f.dataType == TimestampType) f.copy(dataType = StringType) else f))
    val raw = spark.read
      .schema(stringized)
      .option("header", "true")
      // validate the header NAMES against the declared schema instead of
      // binding columns by position: a legitimately exported CSV with a
      // different column order must be REJECTED, not silently misparsed
      .option("enforceSchema", "false")
      .option("mode", "PERMISSIVE")
      .csv(path)
    schema.fields.filter(_.dataType == TimestampType)
      .foldLeft(raw)((df, f) =>
        df.withColumn(f.name, col(f.name).cast(TimestampType)))
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** JSON-lines with explicit schema (same contract as the streaming
    * ingest's `from_json`, batch-shaped). */
  def jsonLines(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** ORC with explicit schema — the other columnar at-rest format Spark
    * carries natively (predicate pushdown + column pruning work the same
    * as parquet; schema is asserted, not inferred, like every reader
    * here). Avro is deliberately absent: `spark-avro` is an external
    * module, not part of the core distribution this engine pins to. */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .orc(path)

  /** Trade-row exports in any supported format. */
  def tradesCsv(spark: SparkSession, path: String): DataFrame =
    csv(spark, path, TradeIngest.tradeSchema)

  def tradesJson(spark: SparkSession, path: String): DataFrame =
    jsonLines(spark, path, TradeIngest.tradeSchema)

  def tradesOrc(spark: SparkSession, path: String): DataFrame =
    orc(spark, path, TradeIngest.tradeSchema)
}

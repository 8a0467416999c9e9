package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

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
    * backfill mid-way). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** JSON-lines with explicit schema (same contract as the streaming
    * ingest's `from_json`, batch-shaped). */
  def jsonLines(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** Trade-row exports in either format. */
  def tradesCsv(spark: SparkSession, path: String): DataFrame =
    csv(spark, path, TradeIngest.tradeSchema)

  def tradesJson(spark: SparkSession, path: String): DataFrame =
    jsonLines(spark, path, TradeIngest.tradeSchema)
}

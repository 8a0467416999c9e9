package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.Readers

/** Schema-explicit CSV/JSON readers: same rows through every format,
  * identical schema, and permissive handling of corrupt input. */
class ReadersSpec extends SparkSpec {

  private def writeFixtures(): (String, String) = {
    val csvDir = tmpDir("readers-csv")
    val jsonDir = tmpDir("readers-json")
    Files.writeString(Paths.get(csvDir, "t.csv"),
      """symbol,trade_id,price,qty,ts,is_buyer_maker
        |BTC,1,100.5,1.0,2024-01-01 00:00:05,0
        |ETH,2,10.25,2.5,2024-01-01 00:01:10,1
        |""".stripMargin)
    Files.writeString(Paths.get(jsonDir, "t.json"),
      """{"symbol":"BTC","trade_id":1,"price":100.5,"qty":1.0,"ts":"2024-01-01T00:00:05.000Z","is_buyer_maker":0}
        |{"symbol":"ETH","trade_id":2,"price":10.25,"qty":2.5,"ts":"2024-01-01T00:01:10.000Z","is_buyer_maker":1}
        |not json at all
        |""".stripMargin)
    (csvDir, jsonDir)
  }

  test("csv and json read the same trades with the declared schema") {
    val (csvDir, jsonDir) = writeFixtures()
    val c = Readers.tradesCsv(spark, csvDir)
    val j = Readers.tradesJson(spark, jsonDir).where(col("symbol").isNotNull)
    assert(c.schema == j.schema)
    val snap = (df: org.apache.spark.sql.DataFrame) =>
      df.orderBy("trade_id").collect().map(_.toString).toSeq
    assert(snap(c) == snap(j))
    assert(c.count() == 2)
    // declared types, not inferred ones
    assert(c.schema("trade_id").dataType.typeName == "long")
    assert(c.schema("ts").dataType.typeName == "timestamp")
  }

  test("orc round-trips the trade schema with pushdown-capable scans") {
    val (csvDir, _) = writeFixtures()
    val orcDir = tmpDir("readers-orc") + "/t"
    Readers.tradesCsv(spark, csvDir).write.orc(orcDir)
    val o = Readers.tradesOrc(spark, orcDir)
    assert(o.schema == Readers.tradesCsv(spark, csvDir).schema)
    assert(o.count() == 2)
    // the columnar contract: an equality filter reaches the ORC scan
    val p = o.where(col("symbol") === "BTC")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters") && p.contains("EqualTo(symbol,BTC)"),
      s"ORC scan did not receive the pushed filter:\n$p")
  }

  test("csv with a reordered header is rejected, not silently misparsed") {
    val dir = tmpDir("readers-csv-misordered")
    // legitimate export, different column order: positional binding would
    // map ts-strings into `symbol` and produce shape-valid garbage
    Files.writeString(Paths.get(dir, "t.csv"),
      """ts,symbol,trade_id,price,qty,is_buyer_maker
        |2024-01-01 00:00:05,BTC,1,100.5,1.0,0
        |""".stripMargin)
    val e = intercept[Throwable] {
      Readers.tradesCsv(spark, dir).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.toLowerCase.contains("header") ||
      msgs.toLowerCase.contains("schema"), s"unexpected failure: $msgs")
  }

  test("corrupt json rows null out instead of aborting (permissive mode)") {
    val (_, jsonDir) = writeFixtures()
    val all = Readers.tradesJson(spark, jsonDir)
    assert(all.count() == 3)
    assert(all.where(col("symbol").isNull).count() == 1)
  }

  test("csv accepts both space-separated and ISO-'T'/offset timestamps") {
    val dir = tmpDir("readers-csv-iso")
    Files.writeString(Paths.get(dir, "t.csv"),
      """symbol,trade_id,price,qty,ts,is_buyer_maker
        |BTC,1,100.5,1.0,2024-01-01T00:00:05.000Z,0
        |ETH,2,10.25,2.5,2024-01-01 00:01:10,1
        |""".stripMargin)
    val rows = Readers.tradesCsv(spark, dir).orderBy("trade_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[java.sql.Timestamp]("ts").getTime == 1704067205000L)
    assert(rows(1).getAs[java.sql.Timestamp]("ts").getTime == 1704067270000L)
  }

  test("events with TIMESTAMP_NTZ ts normalize to TimestampType, pruned") {
    // parquet written by other engines (e.g. DuckDB) reads back as
    // TIMESTAMP_NTZ; Tables.events must hand downstream the zoned type
    // (epoch math requires it) and still push the sinceMicros filter down
    import spark.implicits._
    val dir = tmpDir("readers-ntz")
    Seq(
      (1L, "2024-01-01 00:00:05", 7L, "view", 1.0, "{}"),
      (2L, "2024-01-01 01:00:05", 7L, "click", 2.0, "{}"))
      .toDF("event_id", "s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp_ntz(col("s"))).drop("s")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val all = Tables.events(spark, dir)
    assert(all.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // unix_micros (the engine's epoch math) must resolve on the result
    assert(all.select(unix_micros(col("ts"))).collect().length == 2)

    val cutoff = java.time.Instant.parse("2024-01-01T00:30:00Z")
      .getEpochSecond * 1000000L
    val late = Tables.events(spark, dir, Some(cutoff))
    assert(late.count() == 1)
    val plan = late.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(ts"),
      s"NTZ source filter did not push down:\n$plan")
  }
}

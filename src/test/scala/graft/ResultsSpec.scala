package graft

import org.apache.spark.sql.functions._

import graft.api.Results

/** S10/F8: JSON row serialization with ISO-8601 timestamps, preserving
  * query row order (reference: api/server.py:31-37,81-83). */
class ResultsSpec extends SparkSpec {
  import spark.implicits._

  test("timestamps render ISO-8601 and row order is preserved") {
    val df = Seq(
      (2L, "b", java.sql.Timestamp.valueOf("2024-03-05 07:08:09")),
      (1L, "a", java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))
    ).toDF("id", "tag", "ts").orderBy(col("id").desc)
    val rows = Results.toJsonRows(df)
    assert(rows == Seq(
      """{"id":2,"tag":"b","ts":"2024-03-05T07:08:09"}""",
      """{"id":1,"tag":"a","ts":"2024-01-02T03:04:05"}"""))
  }

  test("micro-precision timestamps keep a 6-digit fraction (isoformat rules)") {
    val t = java.sql.Timestamp.valueOf("2024-01-02 03:04:05")
    t.setNanos(100900000) // .100900 — distinct micros must stay distinct
    val df = Seq((1L, t)).toDF("id", "ts")
    assert(Results.toJsonRows(df) ==
      Seq("""{"id":1,"ts":"2024-01-02T03:04:05.100900"}"""))
  }

  test("non-timestamp columns pass through untouched") {
    val df = Seq((1.5, true, "x")).toDF("v", "flag", "s")
    assert(Results.toJsonRows(df) ==
      Seq("""{"v":1.5,"flag":true,"s":"x"}"""))
  }
}

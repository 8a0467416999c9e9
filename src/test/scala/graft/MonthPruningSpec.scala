package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.store.Store

/** The month-derivation optimizer rule: a bare `ts >=` filter over the
  * partitioned store must prune month partitions (no manual month
  * predicate), with identical results. Runs on an ISOLATED child session
  * (`newSession` — own session state, shared context) so the installed
  * rule cannot leak into other suites' plan assertions. */
class MonthPruningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ruleSession = {
    val s = spark.newSession()
    GraftFunctions.installRules(s)
    s
  }

  private lazy val storePath = {
    val path = tmpDir("prune-rule")
    val rows = Seq("2024-01", "2024-02", "2024-03").zipWithIndex.flatMap {
      case (m, mi) => (1 to 10).map(i =>
        ("BTC", (mi * 100 + i).toLong, 100.0, 1.0,
          java.sql.Timestamp.valueOf(s"$m-15 00:00:0${i % 10}")))
    }
    Store.writeTrades(
      rows.toDF("symbol", "trade_id", "price", "qty", "ts"),
      path, SaveMode.Overwrite)
    path
  }

  test("a bare ts filter gains the derived month partition predicate") {
    val cutoff = java.sql.Timestamp.valueOf("2024-02-10 00:00:00")
    val df = Store.readTrades(ruleSession, storePath).where(col("ts") >= cutoff)
    // only month>=202402 files may feed the scan
    val files = df.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(f =>
      f.contains("month=202402") || f.contains("month=202403")),
      s"january files not pruned: ${files.mkString("\n")}")
    assert(df.count() == 20)
  }

  test("rule does not fire without a literal lower bound or on month-filtered plans") {
    val all = Store.readTrades(ruleSession, storePath)
    assert(all.count() == 30) // no filter → untouched
    val explicit = all.where(col("month") === "202401" &&
      col("ts") >= java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))
    assert(explicit.count() == 0) // user's month predicate respected, not overridden
  }

  test("rule never fires on a foreign table that merely has month+ts") {
    // a table whose `month` derives from a DIFFERENT timestamp (billing
    // month ≠ event ts): the row below is legitimate under that layout
    // but violates month = yyyyMM(ts) — pruning it would be data loss
    // months behind ts by far more than the rule's 27 h zone-skew margin,
    // so a (wrongly) derived bound month >= 202312 WOULD drop the row
    val path = tmpDir("prune-foreign") + "/t"
    Seq(("202310", java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 1L))
      .toDF("month", "ts", "id")
      .write.partitionBy("month").parquet(path)
    // plain reader — NOT Store.readTrades, so no graft.monthFromTs opt-in
    val df = ruleSession.read.parquet(path)
      .where(col("ts") >= java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(df.count() == 1,
      "rule pruned a foreign month+ts table it has no layout contract for")
  }

  test("results match the rule-free plan exactly") {
    val cutoff = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    val withRule = Store.readTrades(ruleSession, storePath)
      .where(col("ts") >= cutoff).orderBy("trade_id")
      .collect().map(_.toString).toSeq
    // equivalent manual formulation (what queries did before the rule)
    val manual = Store.readTrades(spark, storePath)
      .where(col("month") >= "202401" && col("ts") >= cutoff)
      .orderBy("trade_id").collect().map(_.toString).toSeq
    assert(withRule == manual && withRule.length == 20)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** NanoTsPushdownRule: every comparison shape rewrites to a raw-long
  * bound with identical results at the 1000-nano boundaries. */
class NanoTsPushdownSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.installRules(spark)

  // nanos straddling microsecond boundaries around T0 = 10^18 ns
  // (= 10^9 s = 2001-09-09 01:46:40 UTC)
  private val t0 = 1000000000000000000L
  private lazy val nanos =
    Seq(t0 - 1000, t0 - 1, t0, t0 + 1, t0 + 999, t0 + 1000, t0 + 1999)
      .toDF("ns")

  private def converted = nanos
    .withColumn("ts", timestamp_micros(expr("ns div 1000")))

  private def viaRule(cmp: String): Set[Long] = {
    val df = converted.where(expr(s"ts $cmp TIMESTAMP'2001-09-09 01:46:40'"))
    // rewrite must have eliminated the conversion from the filter
    val cond = df.queryExecution.optimizedPlan.toString
    assert(!cond.contains("timestamp_micros"),
      s"rule did not fire for '$cmp': $cond")
    df.select("ns").collect().map(_.getLong(0)).toSet
  }

  private def reference(cmp: Long => Boolean): Set[Long] =
    Seq(t0 - 1000, t0 - 1, t0, t0 + 1, t0 + 999, t0 + 1000, t0 + 1999)
      .filter(ns => cmp(ns / 1000L)) // floor to micros, then compare
      .toSet

  private val usBound = t0 / 1000L // 2001-09-09 01:46:40 UTC in micros

  test(">= rewrites with exact boundary semantics") {
    assert(viaRule(">=") == reference(_ >= usBound))
  }
  test("> rewrites with exact boundary semantics") {
    assert(viaRule(">") == reference(_ > usBound))
  }
  test("< rewrites with exact boundary semantics") {
    assert(viaRule("<") == reference(_ < usBound))
  }
  test("<= rewrites with exact boundary semantics") {
    assert(viaRule("<=") == reference(_ <= usBound))
  }
  test("= rewrites to the exact 1000-nano range") {
    val df = converted.where(expr("ts = TIMESTAMP'2001-09-09 01:46:40'"))
    assert(!df.queryExecution.optimizedPlan.toString
      .contains("timestamp_micros"))
    assert(df.select("ns").collect().map(_.getLong(0)).toSet ==
      reference(_ == usBound))
  }

  test("mirrored orientation rewrites too") {
    val df = converted.where(
      expr("TIMESTAMP'2001-09-09 01:46:40' <= ts"))
    assert(!df.queryExecution.optimizedPlan.toString
      .contains("timestamp_micros"))
    assert(df.select("ns").collect().map(_.getLong(0)).toSet ==
      reference(_ >= usBound))
  }
}

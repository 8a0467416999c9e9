package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.TradeQueries

/** Randomized equivalence property for the two-pass bucketed exact
  * rank selection (`TradeQueries.bucketedRankSelect`, the shared
  * execution of `trades_price_quantiles` and `trades_hist_quantiles`'s
  * accuracy readout): against a naive per-symbol full-sort selection it
  * must agree EXACTLY — for heavy price ties (bucket order only
  * REFINES the selection order, ties broken by trade_id inside one
  * bucket), a degenerate one-price symbol (all rows collapse to bucket
  * 0), a single-row symbol, and bucket counts from 2 (every target
  * straddles half the corpus) to far beyond the per-symbol row count
  * (most buckets empty — the cumulative straddle must still locate the
  * unique non-empty one). */
class QuantileSelectSpec extends SparkSpec {
  import spark.implicits._

  private val ranks = Seq(
    "med" -> expr("(n + 1) div 2"),
    "p90" -> expr("(9 * n + 9) div 10"),
    "p10" -> expr("(n + 9) div 10"))

  private def naive(rows: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("symbol").orderBy("price", "trade_id")
    rows
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .groupBy("symbol")
      .agg(
        min(when(col("rn") === expr("(n + 1) div 2"), col("price")))
          .as("med"),
        min(when(col("rn") === expr("(9 * n + 9) div 10"), col("price")))
          .as("p90"),
        min(when(col("rn") === expr("(n + 9) div 10"), col("price")))
          .as("p10"))
  }

  private def bucketed(rows: org.apache.spark.sql.DataFrame, b: Int) =
    TradeQueries.bucketedRankSelect(rows, b, ranks)
      .groupBy("symbol")
      .agg(
        min(when(col("q") === "med", col("price"))).as("med"),
        min(when(col("q") === "p90", col("price"))).as("p90"),
        min(when(col("q") === "p10", col("price"))).as("p10"))

  test("bucketed selection == naive full-sort selection on adversarial " +
    "random data, across bucket widths") {
    val rnd = new scala.util.Random(0xA11CE)
    // 5 symbols: s0..s2 heavy-tie random, s3 degenerate one-price,
    // s4 single-row
    val rows = (0 until 3).flatMap { s =>
      (0 until 400).map { i =>
        // one decimal place over a narrow band ⇒ ~90 distinct values
        // for 400 rows: every bucket boundary lands amid ties
        val price = math.floor(rnd.nextDouble() * 90.0 + 10.0 * s) / 10.0
        (s"s$s", price, (s * 1000 + i).toLong)
      }
    } ++ (0 until 50).map(i => ("s3", 42.5, (9000 + i).toLong)) ++
      Seq(("s4", 7.25, 9999L))
    val df = rows.toDF("symbol", "price", "trade_id")
    val expect = naive(df).collect()
      .map(r => r.getString(0) -> r).toMap
    for (b <- Seq(2, 7, 64, 256, 4096)) {
      val got = bucketed(df, b).collect()
      assert(got.length == expect.size, s"B=$b: symbol count mismatch")
      got.foreach { r =>
        val e = expect(r.getString(0))
        for (i <- 1 to 3)
          assert(r.getDouble(i) == e.getDouble(i),
            s"B=$b symbol=${r.getString(0)} col=$i: " +
              s"bucketed ${r.getDouble(i)} != naive ${e.getDouble(i)}")
      }
    }
  }
}

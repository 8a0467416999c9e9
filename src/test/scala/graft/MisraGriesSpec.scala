package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.queries.EventQueries

/** The Misra-Gries mergeable summary: the completeness guarantee (every
  * item above n/(k+1) survives any update/merge order), the exact-mode
  * degenerate case, and the end-to-end heavy-hitters query against a
  * direct exact formulation. */
class MisraGriesSpec extends SparkSpec {

  private def candidates(items: Seq[Long], k: Int, parts: Int): Set[Long] = {
    import spark.implicits._
    GraftFunctions.register(spark)
    items.toDF("item").repartition(parts)
      .agg(expr(s"graft_mg(item, $k)").as("c"))
      .select(explode(col("c")).as("i"))
      .collect().map(_.getLong(0)).toSet
  }

  test("items above n/(k+1) survive every partition/merge layout") {
    // adversarial: 2 heavy items drowned in 1000 singletons, k=8 —
    // capacity pressure forces constant decrements and merge reductions
    val items: Seq[Long] =
      Seq.fill(500)(1L) ++ Seq.fill(300)(2L) ++ (3L to 1002L)
    val n = items.size // 1800; threshold n/(k+1) = 200
    assert(500 > n / 9 && 300 > n / 9)
    for (parts <- Seq(1, 3, 13)) {
      // deterministic shuffle of input order per layout
      val shuffled = new scala.util.Random(parts).shuffle(items)
      val c = candidates(shuffled, 8, parts)
      assert(c.size <= 8, s"summary exceeded k: ${c.size}")
      assert(c.contains(1L) && c.contains(2L),
        s"guaranteed heavy hitters missing at parts=$parts: $c")
    }
  }

  test("distinct <= k degenerates to the exact item set") {
    val items: Seq[Long] = (1L to 5L).flatMap(i => Seq.fill(i.toInt)(i))
    assert(candidates(items, 8, 4) == (1L to 5L).toSet)
  }

  test("string items: the dashboard top-symbols shape, same guarantee") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // "BTC" heavy among 400 one-off symbols, k=8 → threshold n/(k+1)=100
    val items: Seq[String] =
      Seq.fill(500)("BTC") ++ (1 to 400).map(i => s"ALT$i")
    val shuffled = new scala.util.Random(11).shuffle(items)
    val c = shuffled.toDF("symbol").repartition(7)
      .agg(expr("graft_mg(symbol, 8)").as("c"))
      .select(explode(col("c")).as("s"))
      .collect().map(_.getString(0)).toSet
    assert(c.size <= 8)
    assert(c.contains("BTC"), s"heavy symbol missing from $c")
    // pairs form carries counters with the string ids
    val pairs = shuffled.toDF("symbol")
      .agg(expr("graft_mg_pairs(symbol, 8)").as("p"))
      .select(explode(col("p")).as("e"))
      .select(col("e.id"), col("e.cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val btc = pairs.find(_._1 == "BTC")
    assert(btc.isDefined && btc.get._2 <= 500 && btc.get._2 > 100)
  }

  test("mg-driven heavy hitters == direct exact group-by + having") {
    val viaMg = EventQueries.mgHeavy.run(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val n = ev.count()
    val direct = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
      .where(col("n_events") > n / 128.0)
      .orderBy(col("n_events").desc, col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    assert(viaMg.nonEmpty, "fixture should produce heavy hitters")
    assert(viaMg == direct)
  }
}

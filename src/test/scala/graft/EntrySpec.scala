package graft

import graft.queries.TradeQueries

/** Driver-contract smoke: the flagship entry returns rows at sf0.001 and
  * every registered query has a unique name; parameterized builders (S9)
  * respond to their parameters. */
class EntrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique and every oracle has a query") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.length == names.length)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("parameterized builders honor their parameters") {
    val top3 = TradeQueries.topSymbolsBy(10080, 3)(spark, sf)
    assert(top3.count() <= 3)
    val wide = TradeQueries.ohlcv("click", 100000)(spark, sf).count()
    val narrow = TradeQueries.ohlcv("click", 1)(spark, sf).count()
    assert(wide >= narrow)
    val lim = TradeQueries.liveTradesFor("view", 100000, 7)(spark, sf)
    assert(lim.count() <= 7)
  }
}

package graft

import graft.api.Typed

/** The typed Dataset boundary: encoders assert the schema at compile
  * time and candle invariants hold on the real corpus. */
class TypedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("Dataset[Trade] round-trips the fact schema") {
    val ts = Typed.trades(spark, dir)
    val one = ts.head()
    assert(one.qty == math.abs(one.price) / 1000.0)
    assert(Set(0, 1)(one.is_buyer_maker))
    // typed filter + map still runs (encoder-backed), count matches DF
    assert(ts.filter(_.is_buyer_maker == 1).count() ==
      ts.toDF().where("is_buyer_maker = 1").count())
  }

  test("Dataset[Candle] satisfies the candle invariants") {
    val cs = Typed.candles(spark, dir).collect()
    assert(cs.nonEmpty)
    cs.foreach { c =>
      assert(c.low <= math.min(c.open, c.close))
      assert(c.high >= math.max(c.open, c.close))
      assert(c.volume > 0 && c.trades > 0)
      assert(c.minute.getTime % 60000 == 0)
    }
  }
}

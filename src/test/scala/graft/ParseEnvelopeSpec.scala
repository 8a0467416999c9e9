package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.ParseTradeEnvelope
import graft.streaming.TradeIngest

/** [[graft.functions.ParseTradeEnvelope]]'s contract is SUBSUMPTION,
  * not equality: wherever the fast path returns a struct it must be
  * byte-for-byte what `from_json` would have produced, and everywhere
  * else it must return null so `coalesce` routes the row to Jackson.
  * Pinned three ways: (1) struct-level fast⊆jackson over the full edge
  * grammar, (2) end-to-end `normalize` ≡ the Jackson-only spelling on
  * the same corpus, (3) direct unit checks that the CLEAN wire shape is
  * actually handled (a fast path that always falls back would pass
  * (1)+(2) while silently deleting the optimization). */
class ParseEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private def env(dataMembers: String*): String =
    s"""{"stream":"btcusdt@trade","data":{${dataMembers.mkString(",")}}}"""

  private val clean = env(
    """"e":"trade"""", """"s":"BTCUSDT"""", """"t":12345""",
    """"p":"97000.12"""", """"q":"0.004"""", """"T":1700000000123""",
    """"m":true""")

  /** Envelopes exercising every branch of the fast path and every
    * reason to fall back. */
  private val edges: Seq[String] = Seq(
    clean,
    env(""""s":"ETHUSDT"""", """"t":1""", """"p":"1.0"""", """"q":"2.0"""",
      """"T":1700000000000""", """"m":false"""),
    // each key missing (the oracle generator's shapes)
    env(""""t":2""", """"p":"3.3"""", """"q":"4"""",
      """"T":1700000000001""", """"m":true"""),
    env(""""s":"X"""", """"p":"3.3"""", """"q":"4"""",
      """"T":1700000000001""", """"m":true"""),
    env(""""s":"X"""", """"t":2""", """"q":"4"""",
      """"T":1700000000001""", """"m":true"""),
    env(""""s":"X"""", """"t":2""", """"p":"3.3"""",
      """"T":1700000000001""", """"m":true"""),
    env(""""s":"X"""", """"t":2""", """"p":"3.3"""", """"q":"4""""),
    // JSON nulls (→ null fields, row then dropped/defaulted downstream)
    env(""""s":null""", """"t":null""", """"p":null""", """"q":null""",
      """"T":1700000000002""", """"m":null"""),
    // reordered + unknown keys + whitespace
    env(""""m":true""", """"T":1700000000003""", """"q":"9"""",
      """"p":"8"""", """"t":77""", """"s":"SOLUSDT"""", """"E":123"""),
    """ { "stream" : "x" , "data" : { "s" : "A" , "t" : 5 ,
      | "p" : "1" , "q" : "2" , "T" : 1700000000004 , "m" : false } } """
      .stripMargin,
    // fallback shapes: escapes, unicode escapes, non-ASCII bytes
    env(""""s":"BTC\"USD"""", """"T":1700000000005"""),
    env(""""s":"ABC"""", """"T":1700000000006"""),
    env(""""s":"BTCÜSD"""", """"T":1700000000007"""),
    // fallback shapes: numeric edges
    env(""""t":1.5""", """"T":1700000000008"""),
    env(""""t":-42""", """"T":1700000000009"""),
    env(""""t":9223372036854775807""", """"T":1700000000010"""),
    env(""""t":9223372036854775808""", """"T":1700000000011"""),
    env(""""t":007""", """"T":1700000000012"""),
    env(""""t":0""", """"T":1700000000013"""),
    env(""""t":"12"""", """"T":1700000000014"""),
    env(""""p":1.5""", """"T":1700000000015"""),
    env(""""m":"true"""", """"T":1700000000016"""),
    env(""""m":1""", """"T":1700000000017"""),
    // fallback shapes: structure
    env(""""x":{"y":1}""", """"T":1700000000018"""),
    env(""""x":[1,2]""", """"T":1700000000019"""),
    env(""""t":3""", """"t":4""", """"T":1700000000020"""),
    """{"data":{"T":1700000000021},"data":{"T":9}}""",
    """{"stream":{"nested":1},"data":{"T":1700000000022}}""",
    """{"data":{"T":1700000000023}}extra""",
    """{"stream":"x"}""",
    """{"data":{}}""",
    "{}",
    "",
    "not json at all",
    clean.dropRight(5),
    clean.dropRight(1),
    "{" + clean,
    env(""""s":"tab\there"""", """"T":1700000000024"""))

  test("struct-level: wherever the fast path answers, it answers " +
    "exactly what Jackson answers; the clean shape IS answered") {
    graft.functions.GraftFunctions.register(spark)
    val rows = edges.toDF("value")
      .select(
        col("value"),
        expr("graft_parse_envelope(value)").as("fast"),
        from_json(col("value"), TradeIngest.envelopeSchema)
          .getField("data").as("jackson"))
      .select(col("value"),
        col("fast").isNull.as("fellBack"),
        to_json(col("fast")).as("fastJson"),
        to_json(col("jackson")).as("jacksonJson"))
      .collect()
    rows.foreach { r =>
      if (!r.getBoolean(1)) {
        assert(r.getString(2) == r.getString(3),
          s"fast path DIVERGED on ${r.getString(0)}: " +
            s"fast=${r.getString(2)} jackson=${r.getString(3)}")
      }
    }
    // the optimization must exist: the clean wire shape may not fall back
    val byValue = rows.map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!byValue(clean), "clean envelope fell back to Jackson")
    assert(!byValue(edges(1)), "maker=false envelope fell back")
    assert(!byValue(edges(7)), "JSON-null envelope fell back")
    assert(!byValue(edges(8)), "reordered-keys envelope fell back")
  }

  test("end-to-end: normalize ≡ the Jackson-only spelling over every " +
    "edge envelope") {
    val df = edges.toDF("value")
    val fused = TradeIngest.normalize(df)
      .orderBy("trade_id", "symbol", "ts", "price", "qty")
      .collect().map(_.toString).toSeq
    val composed = TradeIngest.normalizeJacksonOnly(df)
      .orderBy("trade_id", "symbol", "ts", "price", "qty")
      .collect().map(_.toString).toSeq
    assert(fused == composed,
      s"normalize diverged from Jackson-only:\n$fused\nvs\n$composed")
    assert(fused.nonEmpty)
  }

  test("random mutation sweep: fast ⊆ jackson holds under truncation, " +
    "key shuffles, junk insertion and whitespace") {
    val rnd = new scala.util.Random(0xD14E)
    val members = Array(
      () => s""""s":"${Seq("BTCUSDT", "ETHUSDT", "X Y", "")(rnd.nextInt(4))}"""",
      () => s""""t":${rnd.nextLong()}""",
      () => s""""p":"${rnd.nextInt(100000)}.${rnd.nextInt(100)}"""",
      () => s""""q":"${rnd.nextInt(99)}.${rnd.nextInt(10)}"""",
      () => s""""T":${1700000000000L + rnd.nextInt(1000000)}""",
      () => s""""m":${rnd.nextBoolean()}""",
      () => s""""e":"trade"""",
      () => s""""E":${rnd.nextInt(1000)}""")
    val cases = (0 until 600).map { _ =>
      val picks = rnd.shuffle(members.toSeq).take(1 + rnd.nextInt(8))
        .map(_.apply())
      var e = env(picks: _*)
      rnd.nextInt(4) match {
        case 0 => // truncate somewhere
          e = e.substring(0, rnd.nextInt(e.length + 1))
        case 1 => // inject one random ASCII char at a random spot
          val at = rnd.nextInt(e.length + 1)
          e = e.substring(0, at) + (33 + rnd.nextInt(90)).toChar +
            e.substring(at)
        case 2 => // random whitespace padding
          e = e.replace(":", " : ").replace(",", " ,\n")
        case _ => () // keep clean
      }
      e
    }
    graft.functions.GraftFunctions.register(spark)
    val rows = cases.toDF("value")
      .select(
        col("value"),
        col("value").isNull.as("nullIn"),
        expr("graft_parse_envelope(value)").isNull.as("fellBack"),
        to_json(expr("graft_parse_envelope(value)")).as("fastJson"),
        to_json(from_json(col("value"), TradeIngest.envelopeSchema)
          .getField("data")).as("jacksonJson"))
      .collect()
    var handled = 0
    rows.foreach { r =>
      if (!r.getBoolean(2)) {
        handled += 1
        assert(r.getString(3) == r.getString(4),
          s"fast path DIVERGED on [${r.getString(0)}]: " +
            s"fast=${r.getString(3)} jackson=${r.getString(4)}")
      }
    }
    // the sweep must exercise BOTH paths to mean anything
    assert(handled > 50, s"fast path handled only $handled/600")
    assert(handled < 600, "nothing fell back — mutations not reaching")
  }

  test("unit: field extraction from the clean shape is exact") {
    val row = ParseTradeEnvelope.parse(UTF8String.fromString(clean))
    assert(row != null)
    assert(row.getUTF8String(0).toString == "BTCUSDT")
    assert(row.getLong(1) == 12345L)
    assert(row.getUTF8String(2).toString == "97000.12")
    assert(row.getUTF8String(3).toString == "0.004")
    assert(row.getLong(4) == 1700000000123L)
    assert(row.getBoolean(5))
    // missing keys stay null
    val sparse = ParseTradeEnvelope.parse(
      UTF8String.fromString("""{"data":{"T":1700000000000}}"""))
    assert(sparse != null)
    assert(sparse.isNullAt(0) && sparse.isNullAt(1) && sparse.isNullAt(2)
      && sparse.isNullAt(3) && !sparse.isNullAt(4) && sparse.isNullAt(5))
  }

  test("streaming plan: normalize over a stream keeps working with the " +
    "fast path in place") {
    // the expression must be usable inside a streaming projection —
    // regression guard for the ingest chain (S2) this parser sits in
    import java.nio.file.{Files, Paths}
    val src = Files.createTempDirectory("penv_src").toString
    Files.writeString(Paths.get(src, "b1.json"),
      Seq(clean, clean.dropRight(3), env(""""T":1700000000050"""))
        .mkString("\n"))
    val q = TradeIngest.normalize(
        spark.readStream.format("text").load(src))
      .writeStream.format("memory").queryName("penv_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(60000) finally q.stop()
    // clean parses on the fast path; the truncated twin and the
    // id-less-but-timed row go through Jackson — 2 rows survive the
    // event-time gate (truncated is dropped)
    val got = spark.table("penv_stream").collect()
    assert(got.length == 2, got.mkString("; "))
    graft.store.Store.deleteRecursively(Paths.get(src))
  }
}

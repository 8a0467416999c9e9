package graft

import org.apache.spark.sql.functions._

/** [[graft.functions.SimhashSig]] must be EXACTLY the composed
  * per-token-instance vote arithmetic of the distributed signature
  * build it replaces (DocQueries.simhashFramesOf): for every token of
  * `split(trim(text), '\\s+')`, bit (31−pos) of the first 32 MD5 bits
  * votes ±1 at position pos; sum > 0 → '1', ties → '0'. The composed
  * spelling below is written out independently with Spark's own
  * `aggregate` over the token array, so either side drifting fails
  * here. The distributed spelling's equality is carried by the
  * `docs_simhash` oracle row (hash-gated at three SFs). */
class SimhashSigSpec extends SparkSpec {
  import spark.implicits._

  private def composedExpr: String =
    """array_join(transform(sequence(0, 31), pos ->
      |  CASE WHEN aggregate(split(trim(text), '\\s+'), 0L, (acc, tok) ->
      |    acc + CASE WHEN shiftright(
      |        cast(conv(substr(md5(tok), 1, 8), 16, 10) AS bigint),
      |        31 - pos) % 2 = 1 THEN 1 ELSE -1 END) > 0
      |  THEN '1' ELSE '0' END), '')""".stripMargin.replace("\n", " ")

  private def bothForms(texts: Seq[String]): Array[(String, String)] = {
    graft.functions.GraftFunctions.register(spark)
    texts.toDF("text")
      .select(
        expr("graft_simhash(text)").as("fused"),
        expr(composedExpr).as("composed"))
      .as[(String, String)].collect()
  }

  private val trickyCases = Seq(
    "",                       // [''] — the empty token still votes
    " ",                      // trims to the same
    "\t",                     // ['', ''] — two empty-token votes
    "\ta b\n",                // leading + trailing empty tokens
    "a",                      // single token: signature IS its hash bits
    "a a a b",                // weighting: 'a' outvotes 'b' 3:1
    "x y z x y z x y z",
    "  padded  tokens  ",
    ("tok " * 300).trim,      // long doc
    "Ünïcödé tökens vote by their UTF-8 bytes",
    "多字节 字符 も 正确 に 投票 される")

  test("fused signature matches the composed per-instance vote form") {
    for (((fused, composed), t) <- bothForms(trickyCases).zip(trickyCases))
      assert(fused == composed, s"text='$t'")
  }

  test("weighting: k copies of a token vote k times, exactly") {
    // 'aa' and 'bb' hash to different words; with 3 'aa' vs 1 'bb' the
    // signature must be 'aa''s hash bits wherever the two disagree
    val Seq((sigMixed, _)) = bothForms(Seq("aa aa aa bb")).toSeq
    val Seq((sigA, _)) = bothForms(Seq("aa")).toSeq
    assert(sigMixed == sigA,
      "3:1 majority must reproduce the majority token's bits")
  }

  test("deterministic random sweep: 1200 strings") {
    val rnd = new scala.util.Random(14)
    val alpha = "ab XY09 \t\n\r\f.é😀 "
    val texts = (0 until 1200).map(_ =>
      (0 until rnd.nextInt(100))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    for (((fused, composed), t) <- bothForms(texts).zip(texts))
      assert(fused == composed,
        s"text=${t.getBytes("UTF-8").map("%02x".format(_)).mkString(" ")}")
  }

  test("null stays null") {
    graft.functions.GraftFunctions.register(spark)
    val r = Seq[Option[String]](None).toDF("text")
      .selectExpr("graft_simhash(text)").collect()
    assert(r(0).isNullAt(0))
  }
}

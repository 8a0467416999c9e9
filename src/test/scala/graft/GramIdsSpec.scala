package graft

import org.apache.spark.sql.functions._

/** [[graft.functions.GramIds]] must be EXACTLY the composed
  * per-token-md5 + 52-bit polynomial fold it fuses (the gram
  * representation of `docs_contamination*` / `docs_span_dedup` at
  * n=13 and `docs_lm_surprise` at n=2) — pinned on the tokenizer's
  * edge grammar (Java `split("\\s+", -1)` empty-token semantics, trim
  * = 0x20 only), on both window widths, and by a deterministic random
  * sweep against the composed form evaluated by Spark itself. The
  * composed spelling below is written out INDEPENDENTLY of
  * DocQueries' production string so a drift in either is a failure
  * here, not a silently-shared bug. */
class GramIdsSpec extends SparkSpec {
  import spark.implicits._

  /** The composed form, verbatim shape of DocQueries.gramsCol. */
  private def composedExpr(n: Int): String = {
    val fold = (1 until n).foldLeft("element_at(hs, i)") { (acc, j) =>
      s"(($acc * 1031 + element_at(hs, i + $j)) % ${1L << 52})"
    }
    s"""element_at(transform(array(transform(split(trim(text), '\\\\s+'),
       |  x -> cast(conv(substr(md5(x), 1, 13), 16, 10) AS bigint))), hs ->
       |CASE WHEN size(hs) < $n THEN array()
       |ELSE transform(sequence(1, size(hs) - ${n - 1}),
       |  i -> $fold) END), 1)""".stripMargin.replace("\n", " ")
  }

  private def bothForms(texts: Seq[String], n: Int)
      : Array[(Seq[Long], Seq[Long])] = {
    graft.functions.GraftFunctions.register(spark)
    texts.toDF("text")
      .select(
        expr(s"graft_gram_ids(text, $n)").as("fused"),
        expr(composedExpr(n)).as("composed"))
      .as[(Seq[Long], Seq[Long])].collect()
  }

  private val trickyCases = Seq(
    "",                        // split('') = [''] — one empty token
    " ",                       // trims to '' — same
    "\t",                      // trim keeps \t; split → ['', ''] (2 tokens)
    "\ta b",                   // leading separator → leading empty token
    "a b\n",                   // trailing separator → trailing empty token
    "\t \n a \r\f b \u000b",   // mixed ws runs collapse to ONE separator
    "a  b   c",                // multi-space runs
    "  padded  ",              // trim strips only 0x20
    "one two three four five six seven eight nine ten eleven twelve",
    "one two three four five six seven eight nine ten eleven twelve thirteen",
    "one two three four five six seven eight nine ten eleven twelve thirteen fourteen",
    ("tok " * 400).trim,       // long doc, many windows
    "same same same same same same same same same same same same same same",
    "Ünïcödé tökens ärê hashed by their UTF-8 bytes — no ASCII fast path",
    "多字节 字符 の トークン も 正确 に 分割 される 十三 窗口 未満 でも",
    "emoji 😀 tokens  nbsp-is-not-\\s so it glues words")

  test("fused matches composed on the tokenizer edge grammar, n=13") {
    for (((fused, composed), t) <- bothForms(trickyCases, 13).zip(trickyCases))
      assert(fused == composed, s"n=13 text='$t'")
  }

  test("fused matches composed at the bigram width, n=2") {
    for (((fused, composed), t) <- bothForms(trickyCases, 2).zip(trickyCases))
      assert(fused == composed, s"n=2 text='$t'")
  }

  test("deterministic random sweep: 1500 strings, both widths") {
    val rnd = new scala.util.Random(14)
    // alphabet dense in whitespace variants and token-boundary chars
    val alpha = "ab XY09 \t\n\r\f\u000b.é—😀 "
    def gen(n: Int) = (0 until n).map(_ =>
      (0 until rnd.nextInt(120))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val texts = gen(1500)
    for (n <- Seq(2, 13); ((fused, composed), t) <- bothForms(texts, n).zip(texts))
      assert(fused == composed,
        s"n=$n text=${t.getBytes("UTF-8").map("%02x".format(_)).mkString(" ")}")
  }

  test("null text stays null; window must be a positive literal") {
    graft.functions.GraftFunctions.register(spark)
    val r = Seq[Option[String]](None, Some("a b c"))
      .toDF("text").selectExpr("graft_gram_ids(text, 2)").collect()
    assert(r(0).isNullAt(0))
    assert(!r(1).isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT graft_gram_ids('a b', 0)").collect()
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** ScalaCheck properties for the two r13 kernels whose fast paths have
  * exactness ARGUMENTS (fused normalize ≡ composed regex chain; narrow
  * cents decimals ≡ general Money decimals) — randomized inputs probe
  * the argument's boundary conditions the fixed cases can't enumerate.
  * Seeded, so a failure replays. Batched: each ScalaCheck case is a
  * multi-row DataFrame, so the property runs thousands of rows through
  * the REAL codegen'd expressions, not one row per Spark job. */
class KernelRandomSpec extends SparkSpec {
  import spark.implicits._

  private def check(n: Int)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withMaxDiscardRatio(1.0f)
        .withInitialSeed(Seed(20260815L)),
      p)
    assert(res.passed, res.status.toString)
  }

  // --- graft_normalize ≡ trim(regex(regex(lower(...)))) ----------------

  /** Strings biased toward the loop's decision points: case boundaries,
    * digit/letter edges, space runs, strip-run joins, non-ASCII (slow
    * path), and the empty/all-stripped degenerates. */
  private val textGen: Gen[String] = {
    val atom = Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      3 -> Gen.const(" "),
      2 -> Gen.oneOf(".", ",", "!", "--", "'", "\t", "\n"),
      1 -> Gen.oneOf("é", "Ü", "ß", "Ω", "中", "K" /* Kelvin sign */),
      1 -> Gen.const("  "))
    Gen.chooseNum(0, 60).flatMap(k => Gen.listOfN(k, atom).map(_.mkString))
  }

  test("property: fused graft_normalize ≡ the composed form (batched)") {
    graft.functions.GraftFunctions.register(spark)
    check(30)(Prop.forAllNoShrink(Gen.listOfN(200, textGen)) { texts =>
      val out = texts.toDF("text")
        .select(
          expr("graft_normalize(text)").as("fused"),
          trim(regexp_replace(regexp_replace(lower(col("text")),
            "[^a-z0-9 ]+", ""), " +", " ")).as("composed"))
        .as[(String, String)].collect()
      out.forall { case (f, c) => f == c }
    })
  }

  // --- dsumProdCents ≡ dsumProd on exact 2-dp money ---------------------

  /** (price, factor) rows: prices across the full TPC-H money range
    * including negatives and the values whose double representation sits
    * epsilon below the 2-dp decimal; factors on the (1 - discount) grid. */
  private val moneyRowGen: Gen[(Double, Double)] = for {
    cents <- Gen.chooseNum(-99999999L, 99999999L) // ±1e6 at 2 dp
    disc <- Gen.chooseNum(0, 99)
  } yield (cents / 100.0, 1.0 - disc / 100.0)

  test("property: cents decimal path ≡ general Money path (batched)") {
    check(30)(Prop.forAllNoShrink(Gen.listOfN(300, moneyRowGen)) { rows =>
      val r = rows.toDF("a", "b")
        .repartition(5)
        .agg(
          graft.ops.Ops.dsumProd(col("a"), col("b")).as("g"),
          graft.ops.Ops.dsumProdCents(col("a"), col("b")).as("c"))
        .collect()(0)
      r.getDouble(0) == r.getDouble(1)
    })
  }

  // --- graft_gram_ids / graft_simhash ≡ composed (r14 kernels) ----------

  /** Token-shaped strings biased toward the TOKENIZER's decision points
    * — the part of the r14 fused kernels with non-obvious semantics
    * (Java `split("\\s+", -1)` empty-token grammar): whitespace
    * variants singly and in runs, leading/trailing separators, 0x20
    * padding the trim strips vs \t it keeps, multi-byte tokens, and
    * enough plain tokens that 13-windows occur. */
  private val docGen: Gen[String] = {
    val atom = Gen.frequency(
      8 -> Gen.chooseNum(1, 3).flatMap(k =>
        Gen.listOfN(k, Gen.alphaNumChar).map(_.mkString)),
      5 -> Gen.const(" "),
      2 -> Gen.oneOf("\t", "\n", "\r", "\f", "\u000b"),
      1 -> Gen.oneOf("  ", " \t ", "\r\n"),
      1 -> Gen.oneOf("é", "Ω", "中文", "😀"))
    Gen.chooseNum(0, 50).flatMap(k => Gen.listOfN(k, atom).map(_.mkString))
  }

  private def composedGramExpr(n: Int): String = {
    val fold = (1 until n).foldLeft("element_at(hs, i)") { (acc, j) =>
      s"(($acc * 1031 + element_at(hs, i + $j)) % ${1L << 52})"
    }
    s"""element_at(transform(array(transform(split(trim(text), '\\\\s+'),
       |  x -> cast(conv(substr(md5(x), 1, 13), 16, 10) AS bigint))), hs ->
       |CASE WHEN size(hs) < $n THEN array()
       |ELSE transform(sequence(1, size(hs) - ${n - 1}),
       |  i -> $fold) END), 1)""".stripMargin.replace("\n", " ")
  }

  test("property: fused graft_gram_ids ≡ the composed fold, n=2 and n=13") {
    graft.functions.GraftFunctions.register(spark)
    for (n <- Seq(2, 13))
      check(20)(Prop.forAllNoShrink(Gen.listOfN(150, docGen)) { texts =>
        texts.toDF("text")
          .select(
            expr(s"graft_gram_ids(text, $n)").as("fused"),
            expr(composedGramExpr(n)).as("composed"))
          .as[(Seq[Long], Seq[Long])].collect()
          .forall { case (f, c) => f == c }
      })
  }

  test("property: fused graft_simhash ≡ the composed per-instance votes") {
    graft.functions.GraftFunctions.register(spark)
    val composed =
      """array_join(transform(sequence(0, 31), pos ->
        |  CASE WHEN aggregate(split(trim(text), '\\s+'), 0L, (acc, tok) ->
        |    acc + CASE WHEN shiftright(
        |        cast(conv(substr(md5(tok), 1, 8), 16, 10) AS bigint),
        |        31 - pos) % 2 = 1 THEN 1 ELSE -1 END) > 0
        |  THEN '1' ELSE '0' END), '')""".stripMargin.replace("\n", " ")
    check(20)(Prop.forAllNoShrink(Gen.listOfN(150, docGen)) { texts =>
      texts.toDF("text")
        .select(
          expr("graft_simhash(text)").as("fused"),
          expr(composed).as("composed"))
        .as[(String, String)].collect()
        .forall { case (f, c) => f == c }
    })
  }
}

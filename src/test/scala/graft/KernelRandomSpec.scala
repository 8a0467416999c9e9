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
}

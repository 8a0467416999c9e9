package graft

import org.apache.spark.sql.functions._

/** Pins the properties every scale measurement rests on, for BOTH
  * ScaleCorpus recipes: id-range disjointness and byte-identity of
  * non-id columns for the dup recipe; and for the r15 clean recipe the
  * three invariants the Bloom-crossover bracket depends on — copy 0 is
  * byte-identical to the source, copies past the first share NO word
  * n-grams with any other copy (every token carries a per-copy
  * suffix), and `n_chars` tracks the rewritten text. */
class ScaleCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val src = Seq(
    (1L, "alpha beta gamma", "en", 16L),
    (2L, " padded  tokens here ", "de", 21L),
    (3L, "solo", "en", 4L))
    .toDF("doc_id", "text", "lang", "n_chars")

  test("dup recipe: ids shift by copy stride, everything else copies") {
    val out = ScaleCorpus.scaled(src, Seq("doc_id"), 3)
    assert(out.count() == 9)
    // per copy, the non-id columns are byte-identical to the source
    (0 until 3).foreach { c =>
      val copy = out
        .where(col("doc_id") >= c * 10000000L &&
          col("doc_id") < (c + 1) * 10000000L)
        .select(col("doc_id") - lit(c * 10000000L), col("text"),
          col("lang"), col("n_chars"))
      assert(copy.exceptAll(src.toDF(copy.columns: _*)).isEmpty &&
        src.toDF(copy.columns: _*).exceptAll(copy).isEmpty,
        s"copy $c is not byte-identical under the id shift")
    }
  }

  test("clean recipe: copy 0 identical; later copies share no tokens " +
    "with any other copy; n_chars recomputed") {
    val out = ScaleCorpus.scaledCleanDocs(src, Seq("doc_id"), 3)
      .localCheckpoint() // deterministic, but pin one materialization
    val copy0 = out.where(col("doc_id") < 10000000L)
      .select("doc_id", "text", "lang", "n_chars")
    assert(copy0.exceptAll(src).isEmpty && src.exceptAll(copy0).isEmpty,
      "clean copy 0 must stay byte-identical to the source")
    // token sets of distinct copies are DISJOINT (the property that
    // kills cross-copy gram overlap: every word 13-gram, 4-gram
    // profile and simhash frame is built from these tokens)
    val toks = out.select(
        (col("doc_id") / 10000000L).cast("long").as("copy"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .distinct()
    val shared = toks.groupBy("tok")
      .agg(countDistinct(col("copy")).as("nc"))
      .where(col("nc") > 1).count()
    assert(shared == 0, s"$shared tokens shared across clean copies")
    // n_chars == char_length(text) on every row
    assert(out.where(col("n_chars") =!= char_length(col("text")))
      .count() == 0)
    // determinism: a second build is row-identical
    val again = ScaleCorpus.scaledCleanDocs(src, Seq("doc_id"), 3)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("clean recipe: fixed-width suffix keeps adversarial token shapes " +
    "disjoint across copies (the r15 ADVICE collision)") {
    // with the old variable-width suffix, 'a' from copy 12 and 'ac1'
    // from copy 2 both became 'ac12'; fixed width makes them
    // 'ac0012' vs 'ac1c0002'
    val tricky = Seq((1L, "a ac1", "en", 5L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val out = ScaleCorpus.scaledCleanDocs(tricky, Seq("doc_id"), 13)
    val toks = out.select(
        (col("doc_id") / 10000000L).cast("long").as("copy"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .distinct()
    val shared = toks.groupBy("tok")
      .agg(countDistinct(col("copy")).as("nc"))
      .where(col("nc") > 1).count()
    assert(shared == 0, s"$shared tokens shared across clean copies")
  }

  test("clean recipe: build-time guard refuses a source token that " +
    "already wears a live copy suffix") {
    // 'xc0002' in the SOURCE collides with copy 2's rewrite of 'x'
    val poisoned = Seq((1L, "x xc0002", "en", 8L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val e = intercept[IllegalArgumentException] {
      ScaleCorpus.assertCleanSuffixSafe(poisoned, 3)
    }
    assert(e.getMessage.contains("xc0002"))
    // a suffix value OUTSIDE [1, factor) is harmless and must pass:
    // factor 3 never writes suffix c0007
    val safe = Seq((1L, "x xc0007", "en", 8L))
      .toDF("doc_id", "text", "lang", "n_chars")
    ScaleCorpus.assertCleanSuffixSafe(safe, 3)
    // and the real sf0.1 corpus must pass for the factors we build
    val real = Tables.table(spark, "/root/testdata/sf0.1", "documents")
    ScaleCorpus.assertCleanSuffixSafe(real, 300)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.queries.DocQueries

/** Randomized pin of the gram-id refactor: the 52-bit polynomial fold
  * of per-token md5 prefixes (`acc·1031 + h mod 2⁵²`, see
  * `DocQueries.gramListDuck`) must induce EXACTLY the duplication
  * structure of the md5-of-the-joined-13-word-window spelling it
  * replaced. Gram ids enter the registered queries only through
  * equality, so the two schemes are interchangeable iff they agree on
  * every window-pair equality over the corpus; this spec asserts that
  * two ways on randomized span-sharing corpora:
  *
  *  1. the registered `docs_span_dedup` output equals a reference
  *     pipeline re-run with the naive string-window gram ids, and
  *  2. the corpus-wide distinct-id count equals the distinct distinct
  *     string-window count (fold collisions would collapse ids and
  *     make the fold count smaller; a non-injective tokenize bug would
  *     do the reverse).
  *
  * Seeded, so a failure replays. */
class GramFoldSpec extends SparkSpec {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  /** Span blocks ≥13 tokens long that documents share verbatim — the
    * structure span dedup measures. */
  private case class Corpus(rows: Seq[(Long, String)]) {
    override def toString: String =
      s"Corpus(${rows.size} docs, ${rows.map(_._2).distinct.size} distinct)"
  }

  private val corpusGen: Gen[Corpus] = for {
    nBlocks <- Gen.choose(2, 4)
    blocks <- Gen.listOfN(nBlocks, for {
      len <- Gen.choose(13, 18)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
    nDocs <- Gen.choose(8, 20)
    docs <- Gen.listOfN(nDocs, for {
      // each doc = a shared block (or two) + a private tail, so some
      // windows repeat across docs and some are unique to one doc
      b1 <- Gen.oneOf(blocks)
      extra <- Gen.option(Gen.oneOf(blocks))
      tailLen <- Gen.choose(0, 6)
      tl <- Gen.listOfN(tailLen, Gen.oneOf(vocab))
      n <- Gen.choose(0, 99)
    } yield (Seq(b1) ++ extra.toSeq ++ tl :+ s"tail$n").mkString(" "))
    nCopies <- Gen.choose(0, 3)
    nShort <- Gen.choose(0, 3) // <13 tokens: must carry zero grams
    shuffle <- Gen.long
  } yield {
    val texts = docs ++ docs.take(nCopies) ++
      Seq.fill(nShort)("alpha beta gamma")
    val rnd = new scala.util.Random(shuffle)
    val ids = rnd.shuffle(texts.indices.map(_ + 1L).toVector)
    Corpus(texts.zip(ids).map { case (t, id) => (id, t) })
  }

  private def writeCorpus(c: Corpus): String = {
    val dir = tmpDir("gramfold")
    import spark.implicits._
    c.rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("synthetic"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def collect(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toList

  private def checkCorpora(n: Int)(p: Corpus => Boolean): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withMaxDiscardRatio(1.0f)
        .withInitialSeed(Seed(20260815L)),
      Prop.forAllNoShrink(corpusGen)(c => p(c)))
    assert(res.passed, res.status.toString)
  }

  /** The REPLACED gram spelling: 52-bit md5 prefix of each joined
    * 13-word window (the pre-refactor `gramsCol`), kept here as the
    * reference the fold must reproduce. */
  private def naiveGrams = expr(
    """element_at(transform(array(split(trim(text), '\\s+')), t ->
      |CASE WHEN size(t) < 13 THEN array()
      |ELSE transform(sequence(1, size(t) - 12),
      |  i -> cast(conv(substr(md5(array_join(slice(t, i, 13), ' ')),
      |                 1, 13), 16, 10) AS bigint)) END), 1)"""
      .stripMargin.replace("\n", " "))

  /** `docs_span_dedup`'s exact pipeline over the naive gram ids. */
  private def naiveSpanDedup(dir: String): DataFrame = {
    val pg = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(naiveGrams)).as("gram"))
    val st = pg.groupBy("gram")
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
    val per = pg.join(st, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("d0") =!= col("d1"), 1)).as("n_dup_grams"))
    per.join(
      Tables.documents(spark, dir).select(col("doc_id"), col("source")),
      "doc_id")
      .select(col("doc_id"), col("source"), col("n_grams"),
        col("n_dup_grams"),
        (col("n_dup_grams").cast("double") / col("n_grams").cast("double"))
          .as("dup_frac"))
      .orderBy(col("dup_frac").desc, col("doc_id"))
      .limit(20)
  }

  test("randomized span-sharing corpora: registered span dedup over " +
    "folded gram ids == the naive string-window-md5 reference") {
    checkCorpora(20) { c =>
      val dir = writeCorpus(c)
      collect(DocQueries.spanDedup.run(spark, dir)) ==
        collect(naiveSpanDedup(dir))
    }
  }

  test("folded gram ids are corpus-wide injective exactly where string " +
    "windows are (no fold collisions, no tokenize drift)") {
    checkCorpora(20) { c =>
      val dir = writeCorpus(c)
      val docs = Tables.documents(spark, dir)
      val windows = docs.select(explode(expr(
        """CASE WHEN size(split(trim(text), '\\s+')) < 13 THEN array()
          |ELSE transform(sequence(1, size(split(trim(text), '\\s+')) - 12),
          |  i -> array_join(slice(split(trim(text), '\\s+'), i, 13), ' '))
          |END""".stripMargin.replace("\n", " "))).as("w"))
        .agg(countDistinct(col("w"))).head.getLong(0)
      val folded = DocQueries.spanDedupGramsFor(docs)
        .agg(countDistinct(col("gram"))).head.getLong(0)
      windows == folded
    }
  }
}

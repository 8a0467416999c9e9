package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.queries.DocQueries

/** ScalaCheck extension of [[CollapseBoundsSpec]]: the fixed
  * adversarial corpus there pins each collapse against one crafted
  * input; here RANDOMIZED corpora (random dup-group sizes spanning the
  * >64-member branch switch, random multiplicities, shared-vocabulary
  * singles, shorts, interleaved ids, score TIES at the k=20 ranking
  * boundary) assert collapsed ≡ flat family-wide — jaccard,
  * containment, simhash-hamming, and dup-cluster component sizes under
  * multiplicity expansion. Seeded, so a failure replays. */
class CollapseRandomSpec extends SparkSpec {

  /** One generated corpus: dup groups (text, copies) + near-dup singles
    * sharing the groups' vocabulary + short docs, ids shuffled so group
    * members interleave (pair reconstruction must mix groups). */
  private case class Corpus(rows: Seq[(Long, String)]) {
    override def toString: String =
      s"Corpus(${rows.size} docs, ${rows.map(_._2).distinct.size} distinct)"
  }

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private val corpusGen: Gen[Corpus] = for {
    nGroups <- Gen.choose(2, 4)
    // at least one group past the 64-member simhash branch switch and
    // past the 21-id collapse bound, so every slice cuts something
    sizes <- Gen.listOfN(nGroups, Gen.choose(2, 40))
      .map(ss => 70 :: ss)
    // group texts share a long common prefix (same LSH/gram buckets,
    // near-dup but not equal) and differ in one trailing token
    groupTexts = sizes.indices.map(i =>
      s"alpha beta gamma delta epsilon zeta ${vocab(i % vocab.size)}$i")
    nSingles <- Gen.choose(5, 25)
    singles <- Gen.listOfN(nSingles, for {
      a <- Gen.oneOf(vocab); b <- Gen.oneOf(vocab); n <- Gen.choose(0, 6)
    } yield s"alpha beta gamma $a $b tail$n end")
    nShort <- Gen.choose(0, 4)
    shuffle <- Gen.long
  } yield {
    val texts =
      sizes.zip(groupTexts).flatMap { case (n, t) => Seq.fill(n)(t) } ++
        singles ++ Seq.fill(nShort)("xy")
    val rnd = new scala.util.Random(shuffle)
    // ids 1..n in shuffled assignment — members of one group get
    // non-contiguous, interleaved ids
    val ids = rnd.shuffle(texts.indices.map(_ + 1L).toVector)
    Corpus(texts.zip(ids).map { case (t, id) => (id, t) })
  }

  private def writeCorpus(c: Corpus): String = {
    val dir = tmpDir("collapse-rand")
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

  /** Run a seeded property over `n` random corpora, failing the test
    * with ScalaCheck's shrunk counterexample on a mismatch. */
  private def checkCorpora(n: Int)(p: Corpus => Boolean): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withMaxDiscardRatio(1.0f)
        .withInitialSeed(Seed(20260814L)),
      Prop.forAllNoShrink(corpusGen)(c => p(c)))
    assert(res.passed, res.status.toString)
  }

  // ---- the flat reference spellings (same as CollapseBoundsSpec) ----

  private def flatJaccard(dir: String): DataFrame = {
    val g = DocQueries.gramProfilesOf(
      graft.Tables.documents(spark, dir).select("doc_id", "text"))
    val inter = size(array_intersect(col("x.grams"), col("y.grams")))
      .cast("double")
    DocQueries.inBucketPairs(g)
      .join(g.as("x"), col("x.doc_id") === col("doc_a"))
      .join(g.as("y"), col("y.doc_id") === col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (inter / size(array_distinct(
          concat(col("x.grams"), col("y.grams"))))).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  private def flatContainment(dir: String): DataFrame = {
    val g = DocQueries.gramProfilesOf(
      graft.Tables.documents(spark, dir).select("doc_id", "text"))
    def inter = size(array_intersect(col("x.grams"), col("y.grams")))
      .cast("double")
    DocQueries.inBucketPairs(g)
      .join(g.as("x"), col("x.doc_id") === col("doc_a"))
      .join(g.as("y"), col("y.doc_id") === col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (inter / size(col("x.grams"))).as("cont_a"),
        (inter / size(col("y.grams"))).as("cont_b"),
        greatest(inter / size(col("x.grams")),
          inter / size(col("y.grams"))).as("cont_max"))
      .orderBy(col("cont_max").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** Driver-side union-find over the flat ≥0.9-jaccard pair graph →
    * the (cluster_size, n_clusters, min/max label) expectation rows. */
  private def unionFindClusters(dir: String): Seq[Seq[Any]] = {
    val g = DocQueries.gramProfilesOf(
      graft.Tables.documents(spark, dir).select("doc_id", "text"))
    val inter = size(array_intersect(col("x.grams"), col("y.grams")))
      .cast("double")
    val edges = DocQueries.inBucketPairs(g)
      .join(g.as("x"), col("x.doc_id") === col("doc_a"))
      .join(g.as("y"), col("y.doc_id") === col("doc_b"))
      .where(inter / size(array_distinct(
        concat(col("x.grams"), col("y.grams")))) >= 0.9)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clusters = parent.keys.toSeq.groupBy(find).map { case (root, ms) =>
      (root, ms.size.toLong)
    }
    clusters.groupBy(_._2).toSeq.map { case (sz, cs) =>
      List[Any](sz, cs.size.toLong, cs.map(_._1).min, cs.map(_._1).max)
    }.sortBy(_.head.asInstanceOf[Long])
  }

  test("randomized corpora: collapsed jaccard ranking == flat spelling") {
    checkCorpora(4) { c =>
      val dir = writeCorpus(c)
      collect(DocQueries.ngramJaccard.run(spark, dir)) ==
        collect(flatJaccard(dir))
    }
  }

  test("randomized corpora: collapsed containment ranking == flat " +
    "spelling incl. side-dependent cont_a/cont_b") {
    checkCorpora(4) { c =>
      val dir = writeCorpus(c)
      collect(DocQueries.containment.run(spark, dir)) ==
        collect(flatContainment(dir))
    }
  }

  test("randomized corpora: grouped simhash-hamming == flat tail, with " +
    "distance ties crossing the k=20 boundary") {
    checkCorpora(4) { c =>
      val dir = writeCorpus(c)
      val sig = DocQueries.simhashFrames(spark, dir)
      // tie precondition: every within-group pair is distance 0, and
      // the 70-copy group alone yields 2415 such pairs — the k=20 cut
      // always lands INSIDE a tie run, so equality below certifies the
      // deterministic (doc_a, doc_b) tie-break through the collapse
      collect(DocQueries.simhashHamming.run(spark, dir)) ==
        collect(DocQueries.hammingTopPairsFlat(sig))
    }
  }

  test("randomized corpora: dup-cluster component sizes under " +
    "multiplicity expansion == driver union-find over the flat graph") {
    checkCorpora(4) { c =>
      val dir = writeCorpus(c)
      collect(DocQueries.dupClusters.run(spark, dir)) ==
        unionFindClusters(dir)
    }
  }
}

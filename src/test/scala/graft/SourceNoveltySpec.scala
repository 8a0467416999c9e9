package graft

import org.apache.spark.sql.functions._
import graft.queries.DocQueries

/** Hand-computed semantics pin for `docs_source_novelty` (the DuckDB
  * oracle gates Spark↔DuckDB agreement; this pins both against the
  * DEFINITION): novelty counts hashed word bigrams whose
  * lexicographically-first holding source is this one, single-token
  * docs contribute no vocabulary but still count as documents, shared
  * bigrams are credited only to the first source, and the cumulative
  * coverage per-mille is exact integer division. */
class SourceNoveltySpec extends SparkSpec {
  import spark.implicits._

  test("novel bigram credit goes to the lexicographically first source; " +
    "cumulative per-mille is exact integer division") {
    val dir = tmpDir("novelty-corpus")
    // srcA: bigrams {a b, b c}; srcB: {a b (shared), x y (novel)};
    // doc 4 has one token → no bigram, still a document of srcA
    Seq(
      (1L, "a b c", "en", 5L, "srcA"),
      (2L, "a b", "en", 3L, "srcB"),
      (3L, "x y", "en", 3L, "srcB"),
      (4L, "a", "en", 1L, "srcA"))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DocQueries.sourceNovelty.run(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_grams"), r.getAs[Long]("novel_grams"),
        r.getAs[Long]("cum_coverage_pm"))).toList
    // total distinct bigrams = 3 ({a b}, {b c}, {x y});
    // srcA holds 2 and is first for both → cum 2*1000 div 3 = 666;
    // srcB holds 2 but only {x y} is novel → cum 3000 div 3 = 1000
    assert(got == List(
      ("srcA", 2L, 2L, 2L, 666L),
      ("srcB", 2L, 2L, 1L, 1000L)))
  }

  test("a duplicate-only source contributes zero novel mass") {
    val dir = tmpDir("novelty-dup")
    Seq(
      (1L, "p q r s", "en", 7L, "s0"),
      (2L, "p q r s", "en", 7L, "s1"), // byte-dup of s0's doc
      (3L, "p q", "en", 3L, "s1"))     // subset of s0's bigrams
      .toDF("doc_id", "text", "lang", "n_chars", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DocQueries.sourceNovelty.run(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("novel_grams"),
        r.getAs[Long]("cum_coverage_pm"))).toList
    assert(got == List(("s0", 3L, 1000L), ("s1", 0L, 1000L)))
  }

  test("NULL source coalesces to '' and sorts first (r16 ADVICE: " +
    "engine-agnostic NULL ordering)") {
    val dir = tmpDir("novelty-null")
    Seq(
      (1L, "m n", "en", 3L, null.asInstanceOf[String]),
      (2L, "m n o", "en", 5L, "srcZ"))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DocQueries.sourceNovelty.run(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("novel_grams"), r.getAs[Long]("cum_coverage_pm")))
      .toList
    // '' sorts before 'srcZ' in both engines; {m n} is credited to ''
    // (lexicographically first), srcZ keeps only {n o}
    assert(got == List(("", 1L, 1L, 500L), ("srcZ", 1L, 1L, 1000L)))
  }

  test("greedy selection picks by marginal gain, not lexicographic " +
    "order, and stops when nothing novel remains") {
    val dir = tmpDir("novelty-greedy")
    // bigram masses: srcA {p q} (1); srcB {a b, b c, c d} (3);
    // srcC {c d (covered by B), d p, p q} — lexicographic order is
    // A, B, C; greedy is B (3 novel), then C (2 novel: d p + p q,
    // c d already covered), then A (0 novel → never emitted)
    Seq(
      (1L, "p q", "en", 3L, "srcA"),
      (2L, "a b c d", "en", 7L, "srcB"),
      (3L, "c d p q", "en", 7L, "srcC"))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DocQueries.sourceGreedy.run(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[String]("source"),
        r.getAs[Long]("novel_grams"), r.getAs[Long]("cum_coverage_pm")))
      .toList
    // total distinct bigrams = 5; cum: 3000/5 = 600, 5000/5 = 1000
    assert(got == List(
      (1L, "srcB", 3L, 600L),
      (2L, "srcC", 2L, 1000L)))
  }

  test("greedy ties break toward the lexicographically smaller source") {
    val dir = tmpDir("novelty-greedy-tie")
    Seq(
      (1L, "x y", "en", 3L, "sB"),
      (2L, "u v", "en", 3L, "sA"))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DocQueries.sourceGreedy.run(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[String]("source")))
      .toList
    assert(got == List((1L, "sA"), (2L, "sB")))
  }

  test("overlap matrix: shared counts, jaccard, directional containment, " +
    "and zero-overlap pairs from the completion join") {
    val dir = tmpDir("novelty-overlap")
    // srcA {ab, bc}; srcB {ab, xy}; srcC {ab, bc} (≡ A); srcD {mn}
    Seq(
      (1L, "a b c", "en", 5L, "srcA"),
      (2L, "a b", "en", 3L, "srcB"),
      (3L, "x y", "en", 3L, "srcB"),
      (4L, "a b c", "en", 5L, "srcC"),
      (5L, "m n", "en", 3L, "srcD"))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DocQueries.sourceOverlap.run(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"),
        r.getAs[Long]("shared_grams"), r.getAs[Double]("jaccard"),
        r.getAs[Double]("cont_a"), r.getAs[Double]("cont_b"))).toList
    assert(got == List(
      // identical vocabularies: jaccard 1, both containments 1
      ("srcA", "srcC", 2L, 1.0, 1.0, 1.0),
      // one of two bigrams shared: 1/(2+2-1); jaccard ties break on
      // the pair
      ("srcA", "srcB", 1L, 1.0 / 3, 0.5, 0.5),
      ("srcB", "srcC", 1L, 1.0 / 3, 0.5, 0.5),
      // disjoint vocabularies still emit a row (the completion join)
      ("srcA", "srcD", 0L, 0.0, 0.0, 0.0),
      ("srcB", "srcD", 0L, 0.0, 0.0, 0.0),
      ("srcC", "srcD", 0L, 0.0, 0.0, 0.0)))
  }

  test("overlap flags one-sided subsumption: a source wholly contained " +
    "in a bigger one shows cont≈1 on its side only") {
    val dir = tmpDir("novelty-overlap-sub")
    // small {ab} ⊂ big {ab, bc, cd}
    Seq(
      (1L, "a b", "en", 3L, "sSmall"),
      (2L, "a b c d", "en", 7L, "sBig"))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val Array(r) = DocQueries.sourceOverlap.run(spark, dir).collect()
    assert(r.getAs[String]("src_a") == "sBig" &&
      r.getAs[String]("src_b") == "sSmall")
    assert(r.getAs[Long]("shared_grams") == 1L)
    assert(r.getAs[Double]("cont_a") == 1.0 / 3) // big side: 1 of 3
    assert(r.getAs[Double]("cont_b") == 1.0)     // small side subsumed
    assert(r.getAs[Double]("jaccard") == 1.0 / 3)
  }

  test("capped overlap: a universal gram (> half the sources) leaves the " +
    "pair join, is reported in universal_grams, and a source holding " +
    "ONLY universal grams leaves the pair universe") {
    val dir = tmpDir("novelty-overlap-capped")
    // every doc opens "u v" → bigram {uv} held by all 5 sources
    // (5·2 > 5·1 ⇒ universal under τ=1/2); srcE holds NOTHING else
    Seq(
      (1L, "u v a b", "en", 7L, "srcA"),
      (2L, "u v a b", "en", 7L, "srcB"), // capped-identical to srcA
      (3L, "u v x y", "en", 7L, "srcC"),
      (4L, "u v m n", "en", 7L, "srcD"),
      (5L, "u v", "en", 3L, "srcE"))     // universal-only source
      .toDF("doc_id", "text", "lang", "n_chars", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = DocQueries.sourceOverlapCapped.run(spark, dir).collect()
    // srcE has an empty capped vocabulary → absent from the matrix
    assert(!rows.exists(r => r.getAs[String]("src_a") == "srcE" ||
      r.getAs[String]("src_b") == "srcE"))
    assert(rows.forall(_.getAs[Long]("universal_grams") == 1L))
    val got = rows.map(r => (r.getAs[String]("src_a"),
      r.getAs[String]("src_b"), r.getAs[Long]("shared_grams"),
      r.getAs[Double]("jaccard"))).toList
    // capped sets: A{va,ab} B{va,ab} C{vx,xy} D{vm,mn} — A≡B under the
    // cap (uncapped they'd share 3 grams of 3: both shapes jaccard 1,
    // but shared_grams pins that uv was EXCLUDED, not merely agreed on)
    assert(got == List(
      ("srcA", "srcB", 2L, 1.0),
      ("srcA", "srcC", 0L, 0.0),
      ("srcA", "srcD", 0L, 0.0),
      ("srcB", "srcC", 0L, 0.0),
      ("srcB", "srcD", 0L, 0.0),
      ("srcC", "srcD", 0L, 0.0)))
    // the uncapped twin on the same corpus: srcE present, shared
    // counts include the universal gram — the contrast the cap exists for
    val un = DocQueries.sourceOverlap.run(spark, dir).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"),
        r.getAs[Long]("shared_grams"))).toList
    assert(un.contains(("srcA", "srcB", 3L)))
    assert(un.count { case (a, b, _) => a == "srcE" || b == "srcE" } == 4)
  }

  test("many-sources corpus recipe: boilerplate bigrams are held by " +
    "every pseudo-source and fall to the cap") {
    val dir = tmpDir("novelty-manysrc")
    import org.apache.spark.sql.functions._
    // 12 docs over 4 pseudo-sources via the ScaleCorpus recipe at
    // factor 1 (id remap is identity at one copy)
    val base = (1L to 12L).map(i => (i, s"w$i x$i y$i", "en", 8L, "orig"))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
    ScaleCorpus.scaledManySrc(base, Seq("doc_id"), 1, 4)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(docs.select("source").distinct().count() == 4)
    assert(docs.where(col("text").contains("zzboiler00")).count() == 12)
    val capped = DocQueries.sourceOverlapCapped.run(spark, dir).collect()
    // the 63 boilerplate bigrams + nothing else is universal (each
    // doc's own bigrams are unique to it); every one is capped
    assert(capped.head.getAs[Long]("universal_grams") ==
      ScaleCorpus.BoilerplateTokens - 1)
    // with boilerplate capped, the pseudo-sources share only their
    // bridge bigrams (lastToken→zzboiler00 is per-doc unique): all
    // shared counts are 0
    assert(capped.forall(_.getAs[Long]("shared_grams") == 0L))
    // the uncapped twin sees every pair sharing all 63 boilerplate grams
    val un = DocQueries.sourceOverlap.run(spark, dir).collect()
    assert(un.forall(_.getAs[Long]("shared_grams") ==
      ScaleCorpus.BoilerplateTokens - 1))
  }
}

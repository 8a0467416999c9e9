package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Targeted fixtures for the round-7 pipeline-quality operators:
  * repetition flags (docs_repetition), train/test decontamination
  * (docs_contamination), and the PQ ANN ranking (emb_pq_topk). The two
  * doc operators run against crafted corpora written as temp parquet
  * dirs (the builders only need `$dir/documents.parquet`), so every
  * expected number is hand-derivable; the PQ check asserts ranking
  * invariants on the real sf0.001 corpus. */
class QualityOpsSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-qos").toString
    val data = rows.map { case (id, text, lang) =>
      Row(id, text, lang, "srcT", text.length.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** The split bucket of [[graft.queries.DocQueries.contamination]] /
    * trainSplit: first md5 byte of the decimal doc_id, mod 10. */
  private def bucket(id: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
    ((hex(0) >> 4) & 0xf) * 16 + (hex(0) & 0xf)
  } % 10

  private def idWithBucket(b: Int, skip: Int = 0): Long =
    Iterator.from(0).map(_.toLong).filter(bucket(_) == b)
      .drop(skip).next()

  test("repetition: flags fire exactly on the constructed docs") {
    val dir = writeDocs(Seq(
      // all-same tokens: dup-word flagged (1 unique of 10) AND
      // rep-flagged (the single bigram 'x x' is 9 of 9 occurrences)
      (1L, Seq.fill(10)("x").mkString(" "), "aa"),
      // all-distinct tokens: 9 unique bigrams of 9 -> top_c=1, 5*1 < 9,
      // no flag; 10 unique tokens of 10, no dup flag
      (2L, (1 to 10).map(i => s"a$i").mkString(" "), "aa"),
      // alternating pair: 2 unique of 12 -> dup flag; 'p q' is 6 of 11
      // bigrams -> rep flag (5*6 >= 11)
      (3L, Seq.fill(6)("p q").mkString(" "), "bb")))
    val out = graft.queries.DocQueries.repetition.run(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val aa = out("aa")
    assert(aa.getLong(1) == 2L)
    assert(math.abs(aa.getDouble(2) - 9.0 / 20.0) < 1e-15) // dup_tok_frac
    assert(math.abs(aa.getDouble(3) - 10.0 / 18.0) < 1e-15) // top_bigram
    assert(aa.getLong(4) == 1L, "only the all-same doc is rep-flagged")
    assert(aa.getLong(5) == 1L, "only the all-same doc is dupword-flagged")
    val bb = out("bb")
    assert(bb.getLong(1) == 1L)
    assert(math.abs(bb.getDouble(2) - 10.0 / 12.0) < 1e-15)
    assert(math.abs(bb.getDouble(3) - 6.0 / 11.0) < 1e-15)
    assert(bb.getLong(4) == 1L && bb.getLong(5) == 1L)
  }

  test("contamination: only a 13-gram shared with TRAIN marks a test doc") {
    val trainId = idWithBucket(0)
    val valId = idWithBucket(8)
    val testA = idWithBucket(9)
    val testB = idWithBucket(9, skip = 1)
    val testC = idWithBucket(9, skip = 2)
    val shared = (1 to 20).map(i => s"t$i").mkString(" ") // 8 13-grams
    val fresh = (1 to 20).map(i => s"u$i").mkString(" ") // 8 13-grams
    val dir = writeDocs(Seq(
      (trainId, shared, "aa"), // train source of contamination
      (valId, fresh, "aa"), // VAL copy of testB's text: must NOT contaminate
      (testA, shared, "aa"), // shares all 8 grams with train -> contaminated
      (testB, fresh, "aa"), // grams only match the val doc -> clean
      (testC, (1 to 12).map(i => s"v$i").mkString(" "), "aa"))) // no grams
    val rows = graft.queries.DocQueries.contamination.run(spark, dir)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "aa")
    assert(r.getLong(1) == 3L, "n_test")
    assert(r.getLong(2) == 1L, "only the train-overlapping doc is contaminated")
    assert(math.abs(r.getDouble(3) - 1.0 / 3.0) < 1e-15, "contam_rate")
    assert(r.getLong(4) == 16L, "distinct test grams: 8 shared + 8 fresh")
    assert(r.getLong(5) == 8L, "hit grams: the shared doc's 8 only")
  }

  test("kmeans refine: every base vector assigned exactly once, " +
    "nonnegative finite shifts") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.EmbQueries.kmeansRefine.run(spark, sf).collect()
    val nBase = spark.read.parquet(s"$sf/embeddings.parquet")
      .where("vec_id <> 0").count()
    assert(rows.map(_.getLong(1)).sum == nBase,
      "cell populations must partition the base vectors")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_moved bounded by n_assigned")
      val shift = r.getDouble(3)
      assert(shift >= 0.0 && !shift.isNaN && !shift.isInfinite)
    }
  }

  test("span dedup: identical docs score 1.0, disjoint docs 0.0") {
    // 15 tokens -> 3 distinct 13-grams per doc
    val shared = (1 to 15).map(i => s"s$i").mkString(" ")
    val lonely = (1 to 15).map(i => s"w$i").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, shared, "aa"), (2L, shared, "aa"), (3L, lonely, "aa"),
      (4L, "too short", "aa"))) // <13 tokens: no grams, no row
    val rows = graft.queries.DocQueries.spanDedup.run(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    Seq(1L, 2L).foreach { id =>
      assert(rows(id).getLong(2) == 3L, "n_grams")
      assert(rows(id).getLong(3) == 3L, "all grams cross-duplicated")
      assert(rows(id).getDouble(4) == 1.0)
    }
    assert(rows(3L).getLong(3) == 0L && rows(3L).getDouble(4) == 0.0)
  }

  test("filter funnel: each stage drops exactly the constructed doc") {
    val stop2 = "the a " // two stopwords, keeps the quality stage alive
    val dir = writeDocs(Seq(
      // passes every stage: 40 distinct lowercase tokens incl 2 stopwords
      (1L, stop2 + (1 to 38).map(i => s"w$i").mkString(" "), "aa"),
      // fails length: 10 tokens
      (2L, (1 to 10).map(i => s"x$i").mkString(" "), "aa"),
      // fails repetition: 40 identical tokens (top bigram = all bigrams)
      (3L, Seq.fill(40)("z").mkString(" "), "aa"),
      // fails quality: 40 distinct tokens, zero stopwords
      (4L, (1 to 40).map(i => s"y$i").mkString(" "), "aa")))
    val rows = graft.queries.DocQueries.filterFunnel.run(spark, dir)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "srcT")
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((4L, 3L, 2L, 1L)), "funnel must drop one doc per stage")
  }

  test("fuzzy contamination: cross-split near-dup flags the test doc, " +
    "train-train dups do not count") {
    val trainA = idWithBucket(0)
    val trainB = idWithBucket(1)
    val trainC = idWithBucket(2)
    val testA = idWithBucket(9)
    val testB = idWithBucket(9, skip = 1)
    val testC = idWithBucket(9, skip = 2)
    val dupText = (1 to 20).map(i => s"d$i").mkString(" ")
    val trainDup = (1 to 20).map(i => s"e$i").mkString(" ")
    val dir = writeDocs(Seq(
      (trainA, dupText, "aa"), // train twin of testA
      (testA, dupText, "aa"), // identical across the split -> flagged
      (testB, (1 to 20).map(i => s"f$i").mkString(" "), "aa"), // clean
      (trainB, trainDup, "bb"), // train-train duplicate pair:
      (trainC, trainDup, "bb"), // must NOT register anywhere
      (testC, (1 to 20).map(i => s"g$i").mkString(" "), "bb"))) // clean
    val rows = graft.queries.DocQueries.fuzzyContamination.run(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("aa", "bb"))
    val aa = rows("aa")
    assert(aa.getLong(1) == 2L, "n_test")
    assert(aa.getLong(2) == 1L, "only the cross-split twin is flagged")
    assert(aa.getLong(3) == 1L, "one verified pair")
    val bb = rows("bb")
    assert(bb.getLong(1) == 1L)
    assert(bb.getLong(2) == 0L && bb.getLong(3) == 0L,
      "train-train duplicates must not count as contamination")
  }

  test("semantic dedup: kept + removed partitions every cluster") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.EmbQueries.semanticDedup.run(spark, sf)
      .collect()
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total,
      "cluster populations must partition the corpus")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) < r.getLong(1),
        "a cluster never removes every member")
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2), "n_kept")
    }
  }

  test("capped semantic dedup: removals are a subset of the uncapped " +
    "query's, and zero-bit clusters reproduce it exactly") {
    // sf0.001: every cluster is under the 64-row target, the staircase
    // gives 0 bits, the sub-key is '' — the capped query must equal the
    // uncapped one row-for-row (modulo its extra n_buckets=1 column)
    val tiny = "/root/testdata/sf0.001"
    val cap0 = graft.queries.EmbQueries.semanticDedupCapped.run(spark, tiny)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3),
        r.getLong(4))).toList
    val unc0 = graft.queries.EmbQueries.semanticDedup.run(spark, tiny)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    assert(cap0 == unc0, "0-bit clusters must reproduce plain SemDeDup")
    // sf0.1: 200-row clusters refine to 2 bits; candidate pairs are a
    // subset of the uncapped all-pairs, so per-cluster removals can
    // only shrink, populations must still partition, and the bucket
    // count is bounded by 2^bits
    val sf = "/root/testdata/sf0.1"
    val cap = graft.queries.EmbQueries.semanticDedupCapped.run(spark, sf)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val unc = graft.queries.EmbQueries.semanticDedup.run(spark, sf)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(cap.keySet == unc.keySet)
    cap.foreach { case (label, (nVecs, nBuckets, nRemoved, nKept)) =>
      assert(nVecs == unc(label)._1)
      assert(nRemoved <= unc(label)._2,
        s"label $label: capped removals exceed the uncapped superset")
      assert(nKept == nVecs - nRemoved)
      assert(nBuckets >= 1 && nBuckets <= 4,
        s"label $label: ${nBuckets} buckets from a 2-bit refinement")
    }
  }

  test("cluster split: near-dup clusters never straddle the boundary, " +
    "and the naive split's leak is counted exactly") {
    // cluster 1 STRADDLES the naive split by construction: a train-
    // bucket doc and a test-bucket doc share a text verbatim (an exact
    // dup is the strongest near-dup). cluster 2 is a genuine GRAPH
    // near-dup (one same-length token differs at the tail, so the
    // stride-4 shingle jaccard stays >= 0.9) with both members in
    // train buckets — it must count as a multi cluster but NOT leak.
    val trainId = idWithBucket(0)
    val testId = idWithBucket(9)
    val t1 = (1 to 50).map(i => f"dup$i%03d").mkString(" ")
    val t2a = (1 to 100).map(i => f"tok$i%03d").mkString(" ")
    val t2b = t2a.dropRight(4) + "XXXX"
    val dir = writeDocs(Seq(
      (trainId, t1, "aa"),
      (testId, t1, "aa"),
      (idWithBucket(0, skip = 1), t2a, "aa"),
      (idWithBucket(1), t2b, "aa"),
      (idWithBucket(8), "a lone validation document body", "aa"),
      (idWithBucket(2), "some other unrelated document text", "aa")))
    val r = graft.queries.DocQueries.clusterSplit.run(spark, dir).collect()(0)
    val m = r.schema.fieldNames.zipWithIndex.toMap
    assert(r.getLong(m("n_docs")) == 6L)
    assert(r.getLong(m("n_clusters")) == 4L)
    assert(r.getLong(m("n_multi_clusters")) == 2L)
    assert(r.getLong(m("naive_leaky_clusters")) == 1L)
    assert(r.getLong(m("naive_cross_pairs")) == 1L)
    assert(r.getLong(m("cluster_leaky_clusters")) == 0L)
    // cluster 1's label is its min member id; exactly the member whose
    // naive class differs from the label's class moves. cluster 2's
    // label buckets train (0 or 1), so neither member moves.
    def cls(b: Int) = if (b < 8) 0 else if (b == 8) 1 else 2
    val lbl = math.min(trainId, testId)
    val expectMoved = Seq(trainId, testId)
      .count(id => cls(bucket(lbl)) != cls(bucket(id)))
    assert(r.getLong(m("n_docs_moved")) == expectMoved.toLong)
  }

  /** The stratified-sample hash of docs_corpus_build{,_neardup}:
    * first 8 hex chars of md5("s-" + decimal doc_id), mod 100. */
  private def sampleHash(id: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"s-$id".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % 100).toInt
  }

  test("near-dup corpus build: collapses the near-dup cluster to its " +
    "min-id rep where the exact-only capstone keeps both members") {
    // all texts are long, lowercase, stopword-free → score 0.7 ≥ 0.5
    // (gate passes everything); lang "aa" → 60% sample rate. Pick ids
    // that all land IN the sample so the collapse is the ONLY
    // difference between the twins.
    val t2a = (1 to 100).map(i => f"tok$i%03d").mkString(" ")
    val t2b = t2a.dropRight(4) + "XXXX" // same-length near-dup, jaccard ≥ 0.9
    val uni = (1 to 80).map(i => f"uni$i%03d").mkString(" ")
    val dup = (1 to 80).map(i => f"dup$i%03d").mkString(" ")
    def sampledId(skip: Int): Long =
      Iterator.from(0).map(_.toLong).filter(sampleHash(_) < 60)
        .drop(skip).next()
    val ids = (0 to 4).map(sampledId)
    val dir = writeDocs(Seq(
      (ids(0), t2a, "aa"), (ids(1), t2b, "aa"), // near-dup cluster
      (ids(2), uni, "aa"),                      // unique
      (ids(3), dup, "aa"), (ids(4), dup, "aa"))) // exact-dup pair
    def totalDocs(q: NamedQuery): Long =
      q.run(spark, dir).agg(org.apache.spark.sql.functions.sum("n_docs"))
        .collect()(0).getLong(0)
    val exact = totalDocs(graft.queries.DocQueries.corpusBuild)
    val nd = totalDocs(graft.queries.DocQueries.corpusBuildNearDup)
    // exact twin: near-dup members are distinct texts → both kept → 4
    // survivors; near-dup twin: cluster collapses to min(ids 0,1) → 3
    assert(exact == 4L, s"exact capstone kept $exact")
    assert(nd == 3L, s"near-dup capstone kept $nd")
  }

  test("keep-best corpus build: picks the cluster's best-quality member " +
    "where the min-id twin picks the smallest id") {
    // one near-dup cluster whose HIGHER-id member scores higher: B is A
    // plus an appended ' the the the' — +3 stopword tokens raise the
    // stop-ratio term (0.3 × 3/103) while appending at the tail only
    // ADDS ~3 stride-4 grams (earlier stride offsets don't move), so
    // char-4-gram jaccard ≈ 175/179 stays ≥ the 0.9 cluster tau and
    // the first-3-token blocking bucket is unchanged. Both ids are
    // in-sample; the split keys on the CLUSTER label (= min id) either
    // way, so survivor choice is the twins' only difference.
    val a = (1 to 100).map(i => f"kbt$i%03d").mkString(" ")
    val b = a + " the the the"
    def sampledId(skip: Int): Long =
      Iterator.from(0).map(_.toLong).filter(sampleHash(_) < 60)
        .drop(skip).next()
    val idA = sampledId(0)
    val idB = sampledId(1)
    assert(idA < idB)
    val dir = writeDocs(Seq((idA, a, "aa"), (idB, b, "aa")))
    def row(q: NamedQuery) =
      q.run(spark, dir).collect().ensuring(_.length == 1).head
    val kb = row(graft.queries.DocQueries.corpusBuildKeepBest)
    val nd = row(graft.queries.DocQueries.corpusBuildNearDup)
    val kbm = kb.schema.fieldNames.zipWithIndex.toMap
    val ndm = nd.schema.fieldNames.zipWithIndex.toMap
    // both twins collapse the cluster to ONE survivor…
    assert(kb.getLong(kbm("n_docs")) == 1L)
    assert(nd.getLong(ndm("n_docs")) == 1L)
    // …but keep-best keeps B (higher score, higher id, longer text)
    // while the min-id twin keeps A — identity pinned by the checksum
    assert(kb.getLong(kbm("id_sum")) == idB,
      s"keep-best kept id_sum ${kb.getLong(kbm("id_sum"))}, want $idB")
    assert(kb.getLong(kbm("total_chars")) == b.length.toLong)
    assert(nd.getLong(ndm("total_chars")) == a.length.toLong,
      "min-id twin must keep the smaller-id (shorter) member")
  }

  test("dedup-then-simhash equals the plain pairing on the pre-deduped corpus") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    // dup-heavy fixture: the corpus unioned with an id-shifted copy of
    // itself — every text becomes a 2-clique whose min-doc_id rep is the
    // ORIGINAL row, so "full corpus after exact dedup" is sf0.001 itself
    val dupDir = java.nio.file.Files.createTempDirectory("graft-dts").toString
    docsDf.unionByName(
        docsDf.withColumn("doc_id", col("doc_id") + 1000000000L))
      .write.mode("overwrite").parquet(s"$dupDir/documents.parquet")
    // dedup-first on the duplicated corpus == plain pairing on the
    // original: the pair stage must never see the injected clique mass;
    // the ORDER BY (hamming, doc_a, doc_b) is total, so row-for-row
    // equality is fair
    val a = graft.queries.DocQueries.dedupThenSimhash.run(spark, dupDir)
      .collect().map(_.toString).toSeq
    val b = graft.queries.DocQueries.simhashHamming.run(spark, sf)
      .collect().map(_.toString).toSeq
    assert(a.nonEmpty, "pairing produced no rows on the fixture corpus")
    assert(a == b)
  }

  test("pq ranking: 10 rows, bounded sims, deterministic, nonzero recall") {
    val sf = "/root/testdata/sf0.001"
    val run1 = graft.queries.EmbQueries.pqTopK.run(spark, sf).collect()
    assert(run1.length == 10)
    run1.foreach { r =>
      assert(r.getLong(0) != 0L, "query vector must not rank itself")
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9, "sim_pq in [-1,1]")
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9, "sim_exact in [-1,1]")
    }
    val run2 = graft.queries.EmbQueries.pqTopK.run(spark, sf).collect()
    assert(run1.map(_.toString).toSeq == run2.map(_.toString).toSeq,
      "PQ ranking must be deterministic")
    val exact = graft.queries.EmbQueries.cosineTopK.run(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val hits = run1.map(_.getLong(0)).count(exact)
    assert(hits >= 1, s"PQ recall@10 lost the entire exact top-10 ($hits)")
  }
}

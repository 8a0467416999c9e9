package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.{DocQueries, EmbQueries}

/** Sparse + hybrid retrieval (docs_bm25_topk / emb_hybrid_rrf):
  * hand-derived rational BM25 scores on a crafted corpus, the idf
  * ordering property, and a full driver-side reimplementation of the
  * RRF fusion on the real sf0.001 corpus. */
class RetrievalSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    val data = rows.map { case (id, text) =>
      Row(id, text, "en", "srcT", text.length.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** The query's rational term score, recomputed independently in
    * driver-side Scala: exact integers through IEEE division — the same
    * arithmetic the SQL spelling performs. */
  private def termScore(n: Long, df: Long, tf: Long, len: Long,
                        l: Long): Double =
    ((2 * n - 2 * df + 1).toDouble / (2 * df + 1).toDouble) *
      ((22 * tf * l).toDouble / (10 * tf * l + 3 * l + 9 * len * n).toDouble)

  test("crafted corpus: scores equal the hand-computed rationals") {
    // terms: dup (df 1), hash (df 2); N=3, L=9 tokens
    val dir = writeDocs(Seq(
      1L -> "dup cat cat",        // len 3: dup tf1
      2L -> "hash hash cat",      // len 3: hash tf2
      3L -> "hash cat cat"))      // len 3: hash tf1
    val got = DocQueries.bm25TopK.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toList
    val n = 3L; val l = 9L
    val exp = List(
      (1L, 1L, termScore(n, 1, 1, 3, l)),   // rare term wins on idf
      (2L, 1L, termScore(n, 2, 2, 3, l)),
      (3L, 1L, termScore(n, 2, 1, 3, l)))
    // rare-term doc must outrank the common-term docs (Robertson idf:
    // (2N-2df+1)/(2df+1) = 5/3 for df=1 vs 3/5 for df=2)
    assert(got.map(_._1) == exp.map(_._1))
    assert(got.map(_._2) == exp.map(_._2))
    got.zip(exp).foreach { case ((_, _, g), (_, _, e)) =>
      assert(math.abs(g - e) < 1e-9, s"score $g != $e")
    }
  }

  test("score is monotone in tf at fixed length and df") {
    // both docs match only 'scan', same length, tf 3 vs 1
    val dir = writeDocs(Seq(
      1L -> "scan scan scan cat",
      2L -> "scan cat cat cat"))
    val got = DocQueries.bm25TopK.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toList
    assert(got.map(_._1) == List(1L, 2L))
    assert(got.head._2 > got(1)._2)
  }

  test("phrase search: adjacency only, overlaps counted, 1-based first_pos") {
    val dir = writeDocs(Seq(
      1L -> "table hash table hash",   // two non-overlapping matches
      2L -> "table table hash",        // one match, at position 2
      3L -> "hash table",              // reversed order: no match
      4L -> "table x hash"))           // gap: no match
    val got = DocQueries.phraseSearch.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List((1L, 2L, 1L), (2L, 1L, 2L)))
  }

  test("hybrid RRF == driver-side fusion of the two rank lists (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    // sparse top-20, ranked exactly as the query does
    val sparse = DocQueries.bm25Scores(spark, dir)
      .select("doc_id", "score")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }.take(20)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    // dense top-20 against vec 0
    graft.functions.GraftFunctions.register(spark)
    val dense = Tables.embeddings(spark, dir)
      .crossJoin(broadcast(Tables.embeddings(spark, dir)
        .where(col("vec_id") === 0).select(col("embedding").as("qv"))))
      .where(col("vec_id") =!= 0)
      .select(col("vec_id"), expr("graft_cosine(qv, embedding)").as("sim"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }.take(20)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val expected = (sparse.keySet ++ dense.keySet).toSeq.map { id =>
      val rrf = sparse.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        dense.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, sparse.get(id), dense.get(id), rrf)
    }.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(10).toList

    val got = EmbQueries.hybridRrf.run(spark, dir).collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getDouble(3))
    }.toList
    assert(got == expected)
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Hand-derivable fixtures for the corpus-scheduling operators added
  * late in round 7: temperature-scaled language rebalancing
  * (docs_temperature_mix), the deterministic epoch shuffle + sharding
  * (docs_epoch_shuffle), the linear quality classifier bands
  * (docs_classifier_score), and the Matryoshka truncation-recall
  * evaluation (emb_matryoshka_recall). The doc operators run on crafted
  * corpora so every expected count is computable in the test itself via
  * the same md5 the queries use. */
class MixScheduleSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mix").toString
    val data = rows.map { case (id, text, lang) =>
      Row(id, text, lang, "srcT", text.length.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** First md5 byte of `prefix + id`, as the queries compute it. */
  private def hashByte(prefix: String, id: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest((prefix + id.toString).getBytes("UTF-8"))
    h(0) & 0xff
  }

  test("temperature mix: integer acceptance matches the md5 replay, " +
    "smallest language keeps everything") {
    // 'aa' = 10 docs (the minority), 'bb' = 40 docs. n_min = 10, so
    // aa accepts iff b^2*10 < 65536*10 (always), bb iff b^2*40 < 655360
    // i.e. b < 128 — both replayable per-doc from the md5 byte.
    val aaIds = (0L until 10L)
    val bbIds = (100L until 140L)
    val dir = writeDocs(
      aaIds.map(i => (i, s"text $i", "aa")) ++
        bbIds.map(i => (i, s"text $i", "bb")))
    val out = graft.queries.DocQueries.temperatureMix.run(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("aa", "bb"))
    val expectBb = bbIds.count(i => hashByte("mix:", i) < 128).toLong
    val aa = out("aa")
    assert(aa.getLong(1) == 10L && aa.getLong(2) == 10L,
      "minority language must keep every doc")
    assert(aa.getDouble(5) == 1.0, "minority accept_rate must be exactly 1")
    val bb = out("bb")
    assert(bb.getLong(1) == 40L)
    assert(bb.getLong(2) == expectBb,
      s"bb acceptance must equal the md5 replay ($expectBb)")
    // shares are exact int/int divisions over the same totals
    assert(math.abs(aa.getDouble(3) - 10.0 / 50.0) < 1e-15)
    assert(math.abs(aa.getDouble(4) - 10.0 / (10.0 + expectBb)) < 1e-15)
  }

  test("epoch shuffle: shards partition each epoch, order re-deals " +
    "between epochs") {
    val dir = "/root/testdata/sf0.001"
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val rows = graft.queries.DocQueries.epochShuffle.run(spark, dir)
      .collect()
    Seq(0, 1).foreach { ep =>
      val mine = rows.filter(_.getInt(0) == ep)
      assert(mine.map(_.getLong(2)).sum == nDocs,
        s"epoch $ep shards must partition the corpus")
      assert(mine.map(_.getLong(1)).toSet.subsetOf((0L until 8L).toSet))
    }
    // the salted hash must actually re-deal the order: with 8 shards and
    // a real corpus, at least one shard head/tail doc changes across
    // epochs (equal heads on EVERY shard would mean the salt is dead)
    val heads = rows.groupBy(_.getLong(1)).map { case (_, rs) =>
      rs.map(r => (r.getInt(0), r.getLong(4), r.getLong(5))).toSet.size
    }
    assert(heads.exists(_ > 1),
      "per-shard head/tail docs identical across epochs: salt not applied")
  }

  test("classifier score: each band fires exactly on its crafted doc") {
    val dir = writeDocs(Seq(
      // 10 stopwords: w=20, 100*20 >= 60*10 -> high
      (1L, Seq.fill(10)("the").mkString(" "), "aa"),
      // 1 stopword + 9 neutral: w=2, 200 >= 20*10 (boundary) -> mid
      (2L, ("the " + (1 to 9).map(i => s"n$i").mkString(" ")), "aa"),
      // all neutral: w=0 -> low
      (3L, (1 to 10).map(i => s"n$i").mkString(" "), "aa"),
      // one spam word outweighs nothing: w=-3 -> spam
      (4L, ("free " + (1 to 9).map(i => s"n$i").mkString(" ")), "aa")))
    val out = graft.queries.DocQueries.classifierScore.run(spark, dir)
      .collect().map(r => (r.getString(1), r)).toMap
    assert(out.keySet == Set("high", "mid", "low", "spam"))
    assert(out.values.forall(_.getLong(2) == 1L),
      "each band must hold exactly its one crafted doc")
    assert(out("high").getLong(3) == 20L && out("mid").getLong(3) == 2L)
    assert(out("low").getLong(3) == 0L && out("spam").getLong(3) == -3L)
    assert(math.abs(out("mid").getDouble(5) - 20.0) < 1e-12,
      "mean_score = 100*2/10 on the mid doc")
  }

  test("matryoshka recall: 5 queries, overlap bounded, deterministic") {
    val sf = "/root/testdata/sf0.001"
    val run1 = graft.queries.EmbQueries.matryoshkaRecall.run(spark, sf)
      .collect()
    assert(run1.map(_.getLong(0)).toSeq == (0L until 5L).toSeq)
    run1.foreach { r =>
      val overlap = r.getLong(1)
      assert(overlap >= 0L && overlap <= 10L)
      assert(math.abs(r.getDouble(2) - overlap / 10.0) < 1e-15)
    }
    // truncation to a 16-dim prefix must retain SOME signal: requiring
    // every query to lose the entire top-10 would mean the slice is
    // ranking noise, not an embedding prefix
    assert(run1.map(_.getLong(1)).sum > 0L,
      "16-dim prefix ranking found no overlap with the full ranking")
    val run2 = graft.queries.EmbQueries.matryoshkaRecall.run(spark, sf)
      .collect()
    assert(run1.map(_.toString).toSeq == run2.map(_.toString).toSeq)
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.DocQueries

/** The inverted-index build (docs_posting_lists): exact expected rows on
  * a crafted corpus, the k-bound on postings, and full agreement with
  * the window-sort spelling on the real sf0.001 corpus (the bounded
  * aggregate must be a pure optimization, never a semantics change). */
class PostingSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-post").toString
    val data = rows.map { case (id, text) =>
      Row(id, text, "en", "srcT", text.length.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("crafted corpus: df/cf/postings exactly as hand-derived") {
    // "cat": docs 1 (x3), 2 (x1) -> df 2, cf 4, postings tf-desc = 1,2
    // "dog": docs 2 (x2), 3 (x2) -> df 2, cf 4, tf tie -> id asc = 2,3
    // "owl": doc 3 only          -> df 1, cf 1
    val dir = writeDocs(Seq(
      1L -> "cat cat cat",
      2L -> "cat dog dog",
      3L -> "dog dog owl"))
    val rows = DocQueries.postingLists.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toList
    assert(rows == List(
      ("cat", 2L, 4L, "1,2"),
      ("dog", 2L, 4L, "2,3"),
      ("owl", 1L, 1L, "3")))
  }

  test("postings are bounded at k=5 even when df is larger") {
    // one term in 8 docs, increasing tf with doc_id -> top-5 = ids 8..4
    val dir = writeDocs((1L to 8L).map(i =>
      i -> Seq.fill(i.toInt)("hot").mkString(" ")))
    val Array(row) = DocQueries.postingLists.run(spark, dir)
      .where(col("term") === "hot").collect()
    assert(row.getLong(1) == 8L)                 // df counts ALL docs
    assert(row.getLong(2) == 36L)                // cf counts ALL hits
    assert(row.getString(3) == "8,7,6,5,4")      // postings stop at k
  }

  test("bounded aggregate == window spelling on the sf0.001 corpus") {
    val dir = "/root/testdata/sf0.001"
    val got = DocQueries.postingLists.run(spark, dir).collect().toList
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr(graft.queries.DocQueries.tokSpark)).as("tok"))
    val tf = tok.groupBy("tok", "doc_id").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("tok").orderBy(col("c").desc, col("doc_id"))
    val post = tf.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5)
      .groupBy("tok")
      .agg(expr("transform(array_sort(collect_list(struct(rk, doc_id)))," +
        " p -> cast(p.doc_id AS string))").as("ids"))
      .select(col("tok"), concat_ws(",", col("ids")).as("top_docs"))
    val expect = tf.groupBy("tok")
      .agg(count(lit(1)).as("df"), sum(col("c")).as("cf"))
      .join(post, "tok")
      .select(col("tok").as("term"), col("df"), col("cf"), col("top_docs"))
      .orderBy(col("df").desc, col("term"))
      .limit(20)
      .collect().toList
    assert(got == expect)
  }
}

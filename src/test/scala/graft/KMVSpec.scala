package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The KMV distinct sketch aggregate: parity with the exact "k smallest
  * distinct values" formulation, dedup semantics, partial-merge across
  * partitions, estimator accuracy, and null handling. */
class KMVSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  /** Exact reference: sorted distinct values, first k. */
  private def exactBottomK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.select("g", "hv").distinct()
      .groupBy("g")
      .agg(slice(array_sort(collect_set(col("hv"))), 1, k).as("kmv"))

  private lazy val dupHeavy = {
    val rnd = new scala.util.Random(11)
    // many repeats per value so the distinct-set semantics matter
    (1 to 8000).map(i => ("g" + i % 5, rnd.nextInt(300).toLong))
      .toDF("g", "hv")
      .repartition(8) // force partial buffers + serialize/merge path
  }

  test("graft_kmv == exact bottom-k distinct, duplicates collapsed") {
    val agg = dupHeavy.groupBy("g")
      .agg(expr("graft_kmv(hv, 16)").as("kmv"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toList)).toList
    val ref = exactBottomK(dupHeavy, 16)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toList)).toList
    assert(agg == ref)
  }

  test("groups with fewer than k distinct values return all, ascending") {
    val tiny = Seq(("a", 7L), ("a", 3L), ("a", 7L), ("b", 9L))
      .toDF("g", "hv").repartition(3)
    val out = tiny.groupBy("g")
      .agg(expr("graft_kmv(hv, 16)").as("kmv"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Long](1) == Seq(3L, 7L))
    assert(out(1).getSeq[Long](1) == Seq(9L))
  }

  test("nulls are ignored, matching count(distinct) semantics") {
    val df = Seq(Some(5L), None, Some(2L), None, Some(5L))
      .toDF("hv").withColumn("g", lit("a"))
    val out = df.groupBy("g")
      .agg(expr("graft_kmv(hv, 4)").as("kmv")).collect()
    assert(out(0).getSeq[Long](1) == Seq(2L, 5L))
  }

  test("estimator lands within ~3/sqrt(k) of the true distinct count") {
    val k = 128
    val h = 1L << 40
    val n = 20000
    // deterministic "uniform" hashes from md5, the query's own recipe
    val df = (1 to n).map(i => ("u" + i)).toDF("id")
      .select(expr(
        "CAST(conv(substr(md5(id), 1, 10), 16, 10) AS BIGINT)").as("hv"))
      .withColumn("g", lit("a"))
    val kth = df.groupBy("g")
      .agg(expr(s"graft_kmv(hv, $k)").as("kmv"))
      .select(element_at(col("kmv"), k)).collect()(0).getLong(0)
    val est = ((k - 1).toDouble * h / kth)
    val rel = math.abs(est - n) / n
    assert(rel < 3.0 / math.sqrt(k), s"estimate $est vs $n (rel err $rel)")
  }

  test("k must be a positive literal") {
    intercept[Exception] {
      dupHeavy.groupBy("g").agg(expr("graft_kmv(hv, 0)")).collect()
    }
  }
}

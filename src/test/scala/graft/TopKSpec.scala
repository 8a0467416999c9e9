package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The bounded top-k aggregate: parity with the window formulation
  * (including score ties), correct partial-merge across partitions, and
  * O(k) result shape. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id"))
    df.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .groupBy("g")
      .agg(array_sort(collect_list(struct(
        (lit(0) - col("score")).as("negscore"), col("id")))).as("x"))
      .select(col("g"), expr(
        "transform(x, p -> struct(-p.negscore AS score, p.id AS id))")
        .as("topk"))
  }

  private lazy val skewed = {
    val rnd = new scala.util.Random(3)
    // scores drawn from a SMALL set so ties are common
    (1 to 5000).map(i =>
      ("g" + i % 7, (rnd.nextInt(20) / 10.0), i.toLong))
      .toDF("g", "score", "id")
      .repartition(8) // force partial buffers + serialize/merge path
  }

  test("graft_topk == window row_number formulation, ties included") {
    val agg = skewed.groupBy("g")
      .agg(expr("graft_topk(score, id, 5)").as("topk"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Any](1).toList)).toList
    val win = windowTopK(skewed, 5)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Any](1).toList)).toList
    assert(agg == win)
  }

  test("groups smaller than k return all their rows, sorted") {
    val tiny = Seq(("a", 1.0, 10L), ("a", 3.0, 11L), ("b", 2.0, 20L))
      .toDF("g", "score", "id")
    val out = tiny.groupBy("g")
      .agg(expr("graft_topk(score, id, 5)").as("topk"))
      .orderBy("g").collect()
    val a = out(0).getSeq[org.apache.spark.sql.Row](1)
    assert(a.map(r => (r.getDouble(0), r.getLong(1))) ==
      Seq((3.0, 11L), (1.0, 10L)))
    assert(out(1).getSeq[org.apache.spark.sql.Row](1).length == 1)
  }

  test("result is bounded at k") {
    val out = skewed.groupBy("g")
      .agg(expr("graft_topk(score, id, 3)").as("topk"))
      .select(size(col("topk"))).collect()
    assert(out.forall(_.getInt(0) == 3))
  }

  test("NaN scores rank first (total order), matching the window sort") {
    val df = Seq(
      ("a", Double.NaN, 1L), ("a", 5.0, 2L), ("a", 3.0, 3L),
      ("a", Double.NaN, 4L), ("a", 7.0, 5L), ("a", 1.0, 6L))
      .toDF("g", "score", "id").repartition(3)
    val out = df.groupBy("g")
      .agg(expr("graft_topk(score, id, 4)").as("topk"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1)))
    // NaN greatest (ties by id asc), then finite scores descending —
    // the same placement Spark's ORDER BY score DESC produces
    assert(out.map(_._2) == Seq(1L, 4L, 5L, 2L))
    assert(out.take(2).forall(_._1.isNaN))
  }

  test("signed-zero ties break by id, not by the zero's sign") {
    // engine ORDER BY treats -0.0 = +0.0 and falls to the id tie-break;
    // a raw Double.compare would rank +0.0 (id 2) above -0.0 (id 1)
    val df = Seq(("a", 1.0, 3L), ("a", -0.0, 1L), ("a", 0.0, 2L))
      .toDF("g", "score", "id").repartition(2)
    val out = df.groupBy("g")
      .agg(expr("graft_topk(score, id, 2)").as("topk"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(out.map(_._2) == Seq(3L, 1L), s"zero sign decided the order: $out")
  }

  test("k must be a positive literal") {
    intercept[Exception] {
      skewed.groupBy("g").agg(expr("graft_topk(score, id, 0)")).collect()
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The elementwise vector-sum aggregate: parity with the posexplode
  * formulation, correct partial-merge across partitions, null handling,
  * and the width-mismatch guard. */
class VectorSumSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    (1 to 2000).map { i =>
      ("g" + i % 5, Array.fill(8)(rnd.nextInt(100).toLong - 50L))
    }.toDF("g", "v")
      .repartition(8) // force partial buffers + serialize/merge path
  }

  test("graft_vec_sum == posexplode + per-position sum") {
    val agg = vecs.groupBy("g")
      .agg(expr("graft_vec_sum(v)").as("s"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toList)).toList
    val exploded = vecs
      .select(col("g"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("g", "pos").agg(sum(col("x")).as("s"))
      .groupBy("g")
      .agg(expr("transform(array_sort(collect_list(struct(pos, s))), p -> p.s)")
        .as("s"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toList)).toList
    assert(agg == exploded)
  }

  test("null vectors are skipped; all-null group yields null") {
    val df = Seq(
      ("a", Some(Array(1L, 2L))),
      ("a", None),
      ("b", None)).toDF("g", "v")
    val out = df.groupBy("g").agg(expr("graft_vec_sum(v)").as("s"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Long](1) == Seq(1L, 2L))
    assert(out(1).isNullAt(1))
  }

  test("int arrays widen to long") {
    val df = Seq(("a", Array(1, 2, 3)), ("a", Array(4, 5, 6)))
      .toDF("g", "v")
    val out = df.groupBy("g").agg(expr("graft_vec_sum(v)").as("s")).collect()
    assert(out(0).getSeq[Long](1) == Seq(5L, 7L, 9L))
  }

  test("all-empty-array group sums to an empty array, not null") {
    val df = Seq(("a", Array.empty[Long]), ("a", Array.empty[Long]))
      .toDF("g", "v").repartition(2)
    val out = df.groupBy("g").agg(expr("graft_vec_sum(v)").as("s")).collect()
    assert(!out(0).isNullAt(1) && out(0).getSeq[Long](1).isEmpty)
  }

  test("empty-vs-nonempty width mix throws like any other mismatch") {
    val df = Seq(("a", Array.empty[Long]), ("a", Array(1L, 2L))).toDF("g", "v")
    intercept[Exception] {
      df.groupBy("g").agg(expr("graft_vec_sum(v)")).collect()
    }
  }

  test("width mismatch throws") {
    val df = Seq(("a", Array(1L, 2L)), ("a", Array(1L, 2L, 3L))).toDF("g", "v")
    intercept[Exception] {
      df.groupBy("g").agg(expr("graft_vec_sum(v)")).collect()
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftBloom, GraftFunctions}
import graft.queries.DocQueries

/** The Bloom filter pair (`graft_bloom_agg` / `graft_bloom_contains`)
  * and the decontamination query built on it: membership soundness (no
  * false negatives — the property exactness rests on), a measured
  * false-positive bound, build determinism under repartitioning (OR is
  * commutative, so the bytes must not depend on the merge order), and
  * the Bloom twin's bit-equality with the exact contamination query on
  * the driver corpus. */
class BloomSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no false negatives; FP rate near the sized bound") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val members = (0L until 1000L).map(i => i * 7919L + 13L)
    val mBits = members.size * 10
    val bloom = members.toDF("v")
      .agg(expr(s"graft_bloom_agg(v, $mBits, 7)")).head.getAs[Array[Byte]](0)
    members.foreach(v => assert(GraftBloom.contains(bloom, v),
      s"member $v reported absent — false negative"))
    // disjoint probe set: 10 bits/key + k=7 sizes for ~0.8% FPs;
    // 10000 probes keep the observed rate tight around it
    val probes = (0L until 10000L).map(i => -(i * 104729L) - 7L)
    val fps = probes.count(GraftBloom.contains(bloom, _))
    assert(fps < 300, s"$fps false positives in 10000 — filter badly sized")
    assert(fps > 0, "zero FPs in 10000 at 0.8% sizing — probe suspicious")
  }

  test("filter bytes are independent of partitioning and input order") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val vs = (0L until 500L).map(i => i * 31L)
    def build(parts: Int, shuffled: Seq[Long]): Seq[Byte] =
      spark.sparkContext.parallelize(shuffled, parts).toDF("v")
        .agg(expr("graft_bloom_agg(v, 4096, 5)"))
        .head.getAs[Array[Byte]](0).toSeq
    val one = build(1, vs)
    assert(build(8, vs) == one)
    assert(build(8, vs.reverse) == one)
  }

  test("null inputs are ignored; empty input yields an all-clear filter") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val withNulls = Seq[Option[Long]](Some(1L), None, Some(2L), None)
      .toDF("v").agg(expr("graft_bloom_agg(v, 1024, 3)"))
      .head.getAs[Array[Byte]](0)
    assert(GraftBloom.contains(withNulls, 1L))
    assert(GraftBloom.contains(withNulls, 2L))
    val empty = Seq.empty[Long].toDF("v")
      .agg(expr("graft_bloom_agg(v, 1024, 3)")).head.getAs[Array[Byte]](0)
    (0L until 100L).foreach(v => assert(!GraftBloom.contains(empty, v)))
  }

  test("bloom twin equals the exact contamination query bit-for-bit") {
    val exact = DocQueries.contamination.run(spark, sf).collect().toSeq
    val pruned = DocQueries.contaminationBloom.run(spark, sf).collect().toSeq
    assert(pruned == exact)
  }

  test("plan: map-side bloom probe, survivor semi-join, no data-sized " +
    "broadcast") {
    val plan = DocQueries.contaminationBloom.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"),
      "train side must be pre-pruned by the codegen'd bloom probe")
    // the FP-removing join is a partitioned hash SEMI-join of the test
    // grams against the DEDUPED bloom survivors — by construction never
    // a larger exchange than the exact twin's, and neither gram frame is
    // ever broadcast (both broadcast spellings were measured and lost;
    // the scaladoc records the three-way A/B). The report's O(langs)
    // rollup joins may broadcast — those are 5-row frames.
    assert(plan.contains("ShuffledHashJoin") && plan.contains("LeftSemi"),
      "the FP-removing join must be a partitioned hash semi-join")
  }
}

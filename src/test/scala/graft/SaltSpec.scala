package graft

import org.apache.spark.sql.functions._

import graft.ops.Ops

/** Skew-handling: the two-stage salted aggregation must equal the direct
  * aggregation exactly (decimal partials make the sum order-insensitive),
  * and must actually spread a hot key over multiple stage-1 groups. */
class SaltSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    // one hot key with 10k rows, a few cold keys
    val hot = (1 to 10000).map(i => ("hot", i / 100.0))
    val cold = (1 to 50).map(i => (s"cold$i", i.toDouble))
    (hot ++ cold).toDF("k", "v")
  }

  test("saltedAgg == direct groupBy on sum and count") {
    val direct = skewed.groupBy("k")
      .agg(Ops.dsum(col("v")).as("sum"), count(lit(1)).as("count"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val salted = Ops.saltedAgg(skewed, Seq("k"), "v", buckets = 8)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(salted == direct)
  }

  test("salting spreads the hot key over multiple stage-1 groups") {
    val stage1Groups = skewed
      .withColumn("_salt",
        pmod(hash(col("v"), monotonically_increasing_id()), lit(8)))
      .where(col("k") === "hot")
      .select("_salt").distinct().count()
    assert(stage1Groups > 1)
  }
}

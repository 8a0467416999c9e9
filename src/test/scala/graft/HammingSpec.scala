package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The codegen'd Hamming distance expression: parity with the
  * interpreted higher-order spelling, null on length mismatch, null
  * propagation. */
class HammingSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("matches the interpreted per-character spelling") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i.toLong,
        (0 until 32).map(_ => if (rnd.nextBoolean()) '1' else '0').mkString,
        (0 until 32).map(_ => if (rnd.nextBoolean()) '1' else '0').mkString)
    }
    val df = rows.toDF("id", "a", "b").repartition(4)
    val out = df.select(
      expr("graft_hamming(a, b)").as("native"),
      expr("""aggregate(zip_with(split(a, ''), split(b, ''),
             |  (x, y) -> CASE WHEN x <> y THEN 1 ELSE 0 END),
             |  0, (acc, v) -> acc + v)""".stripMargin.replace("\n", " "))
        .as("composed"),
      col("a"), col("b")).collect()
    out.foreach { r =>
      assert(r.getInt(0) == r.getInt(1),
        s"diverged on ${r.getString(2)} / ${r.getString(3)}")
    }
  }

  test("identical and fully-different strings hit the bounds") {
    val df = Seq(("0101", "0101", 0), ("0000", "1111", 4)).toDF("a", "b", "want")
    df.select(expr("graft_hamming(a, b)").as("got"), col("want"))
      .collect().foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("length mismatch and null inputs yield null") {
    val df = Seq(("01", "0101"), (null, "01"), ("01", null))
      .toDF("a", "b")
    val got = df.select(expr("graft_hamming(a, b)")).collect()
    assert(got.forall(_.isNullAt(0)))
  }
}

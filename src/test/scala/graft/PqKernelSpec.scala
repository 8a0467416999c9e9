package graft

import org.apache.spark.sql.functions._

/** The codegen'd PQ kernels must match the composed higher-order-function
  * spelling bit-for-bit (the same contract CosineSpec pins for
  * graft_cosine): same fold orders, same per-subspace subtotals, and the
  * argmin tie-break must pick the FIRST (smallest-index) cell. */
class PqKernelSpec extends SparkSpec {

  private def df(vals: (Seq[Float], Seq[Double], Seq[Double])*) = {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    vals.toSeq.toDF("emb", "cents", "qv")
      .select(col("emb").cast("array<float>").as("emb"),
        col("cents"), col("qv"))
  }

  // reference implementation: the oracle's fold shape in plain Scala
  private def ref(v: Seq[Float], cents: Seq[Double], qv: Seq[Double],
                  m: Int): (Double, Double) = {
    val len = v.length; val sub = len / m; val cells = cents.length / len
    var ad = 0.0; var an = 0.0
    for (s <- 0 until m) {
      val code = (0 until cells).minBy { c =>
        var d2 = 0.0
        for (j <- 0 until sub) {
          val d = v(s * sub + j).toDouble - cents(c * len + s * sub + j)
          d2 += d * d
        }
        d2 // minBy keeps the first minimum -> smallest cell index on ties
      }
      var qd = 0.0; var cn = 0.0
      for (j <- 0 until sub) {
        val cx = cents(code * len + s * sub + j)
        qd += qv(s * sub + j) * cx
        cn += cx * cx
      }
      ad += qd; an += cn
    }
    (ad, an)
  }

  test("kernels match the reference folds on a 2-cell 4-dim codebook") {
    val v = Seq(1.0f, 2.0f, 3.0f, 4.0f)
    val cents = Seq( // cell 0, then cell 1, each 4 dims (m=2 -> sub=2)
      1.1, 1.9, 2.0, 5.0,
      0.0, 0.0, 3.1, 3.9)
    val qv = Seq(0.5, -1.0, 2.0, 0.25)
    val row = df((v, cents, qv))
      .select(expr("graft_pq_score(emb, cents, qv, 2)").as("ad"),
        expr("graft_pq_norm(emb, cents, 2)").as("an"))
      .head()
    val (ad, an) = ref(v, cents, qv, 2)
    assert(row.getDouble(0) == ad, s"score ${row.getDouble(0)} != $ad")
    assert(row.getDouble(1) == an, s"norm ${row.getDouble(1)} != $an")
  }

  test("argmin ties pick the first (smallest-label) cell") {
    // two identical cells: distances tie exactly in every subspace; the
    // kernel must encode against cell 0, matching the oracle's
    // (d2, clabel) tie-break
    val v = Seq(1.0f, 1.0f)
    val cents = Seq(2.0, 2.0, 2.0, 2.0) // cell 0 == cell 1 (m=1, sub=2)
    val qv = Seq(3.0, 5.0)
    val row = df((v, cents, qv))
      .select(expr("graft_pq_score(emb, cents, qv, 1)").as("ad"),
        expr("graft_pq_norm(emb, cents, 1)").as("an"))
      .head()
    assert(row.getDouble(0) == 3.0 * 2.0 + 5.0 * 2.0)
    assert(row.getDouble(1) == 8.0)
  }

  test("interpreted eval matches codegen (constant-folded) output") {
    // a foldable projection takes the interpreted nullSafeEval path;
    // evaluating over a column takes codegen — both must agree exactly
    graft.functions.GraftFunctions.register(spark)
    val v = Seq(0.25f, -1.5f, 2.0f, 8.0f)
    val cents = Seq(0.3, -1.0, 1.0, 7.5, 1.0, 1.0, 2.5, 7.9)
    val qv = Seq(1.0, 2.0, 3.0, 4.0)
    val (ad, an) = ref(v, cents, qv, 2)
    def arrD(xs: Seq[Double]) =
      s"CAST(array(${xs.mkString(",")}) AS ARRAY<DOUBLE>)"
    val arrV = s"array(${v.map(_ + "F").mkString(",")})"
    val lit = spark.sql(
      s"SELECT graft_pq_score($arrV, ${arrD(cents)}, ${arrD(qv)}, 2) AS ad," +
        s" graft_pq_norm($arrV, ${arrD(cents)}, 2) AS an").head()
    assert(lit.getDouble(0) == ad && lit.getDouble(1) == an)
  }
}

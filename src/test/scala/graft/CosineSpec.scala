package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The native CosineSimilarity expression: numeric parity with the
  * composed higher-order-function form (bit-exact — same fold order),
  * geometric sanity, null handling, and SQL registration. */
class CosineSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val hofCosine =
    """aggregate(zip_with(a, b, (x, y) -> cast(x AS double) * cast(y AS double)), cast(0.0 AS double), (acc, v) -> acc + v)
      | / (sqrt(aggregate(zip_with(a, a, (x, y) -> cast(x AS double) * cast(y AS double)), cast(0.0 AS double), (acc, v) -> acc + v))
      |  * sqrt(aggregate(zip_with(b, b, (x, y) -> cast(x AS double) * cast(y AS double)), cast(0.0 AS double), (acc, v) -> acc + v)))"""
      .stripMargin.replace("\n", "")

  test("bit-exact parity with the composed zip_with/aggregate form") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      (Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("a", "b")
    val out = df.select(
      expr("graft_cosine(a, b)").as("native"),
      expr(hofCosine).as("composed")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native ${r.getDouble(0)} != composed ${r.getDouble(1)}")
    }
  }

  test("geometric sanity: parallel=1, antiparallel=-1, orthogonal=0") {
    val df = Seq(
      (Array(1f, 0f, 2f), Array(2f, 0f, 4f)),    // parallel
      (Array(1f, 0f, 0f), Array(-3f, 0f, 0f)),   // antiparallel
      (Array(1f, 0f, 0f), Array(0f, 5f, 0f))     // orthogonal
    ).toDF("a", "b")
    val sims = df.select(expr("graft_cosine(a, b)")).collect().map(_.getDouble(0))
    assert(math.abs(sims(0) - 1.0) < 1e-12)
    assert(math.abs(sims(1) + 1.0) < 1e-12)
    assert(sims(2) == 0.0)
  }

  test("null input yields null") {
    val df = Seq((Option(Array(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(expr("graft_cosine(a, b)")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("registers through SparkSessionExtensions too") {
    val ext = new graft.functions.GraftExtensions
    // building a second session in the same JVM just to probe injection
    // is heavyweight; assert the injection tuple is well-formed instead
    assert(ext.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
    val fn = spark.sessionState.functionRegistry
      .lookupFunction(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine"))
    assert(fn.isDefined)
  }
}

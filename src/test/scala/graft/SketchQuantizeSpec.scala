package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.queries.{DocQueries, EmbQueries, EventQueries, JoinQueries}

/** Invariants of the round-5 operators: int8 quantization, count-min
  * sketch, stratified sampling, range-join bands, grouping sets. The
  * DuckDB hash-compare covers exact values; these pin the properties
  * that must hold at ANY scale factor. */
class SketchQuantizeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("quantized cosine tracks exact cosine and ranks a shared top set") {
    val rows = EmbQueries.quantizedTopK.run(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val q8 = r.getAs[Double]("sim_q8")
      val ex = r.getAs[Double]("sim_exact")
      assert(!q8.isNaN && !ex.isNaN)
      // int8 codes keep ~2 decimal digits of the direction: the top
      // scores here are well separated, so the error stays small
      assert(math.abs(q8 - ex) < 0.02, s"quantization error too big: $r")
    }
    val exactTop = EmbQueries.cosineTopK.run(spark, sf)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val q8Top = rows.map(_.getAs[Long]("vec_id")).toSet
    assert((exactTop & q8Top).size >= 6,
      s"quantized top-10 diverged from exact top-10: $q8Top vs $exactTop")
  }

  test("kmeans trainer: round 1 equals the single refine step; " +
    "populations conserve vectors") {
    // the loop's first round IS kmeansRefine (same seed centroids, same
    // argmin, same recompute) — if they ever diverge, one of the two
    // lineages drifted
    val train = EmbQueries.kmeansTrain.run(spark, sf).collect()
    val refine = EmbQueries.kmeansRefine.run(spark, sf).collect()
    val round1 = train.filter(_.getAs[Int]("iter") == 1)
      .map(r => (r.getAs[Int]("cell"), r.getAs[Long]("n_assigned"),
        r.getAs[Long]("n_moved"), r.getAs[Double]("shift"))).toSeq
    val refined = refine
      .map(r => (r.getAs[Int]("cell"), r.getAs[Long]("n_assigned"),
        r.getAs[Long]("n_moved"), r.getAs[Double]("shift"))).toSeq
    assert(round1 == refined,
      "kmeans_train round 1 diverged from kmeans_refine")
    // every round partitions the full base-vector set
    val base = EmbQueries.kmeansRefine.run(spark, sf)
      .agg(sum(col("n_assigned"))).head.getLong(0)
    train.groupBy(_.getAs[Int]("iter")).foreach { case (it, rows) =>
      assert(rows.map(_.getAs[Long]("n_assigned")).sum == base,
        s"iteration $it lost or duplicated vectors")
    }
  }

  test("quantization maps the zero vector to zero codes, not NaN") {
    val df = spark.sql(
      """SELECT transform(array(cast(0.0 AS float), cast(0.0 AS float)),
        |  x -> CASE WHEN mx = 0 THEN cast(0 AS bigint)
        |       ELSE cast((CASE WHEN cast(x AS double) < 0 THEN -1 ELSE 1 END)
        |            * floor(abs(cast(x AS double)) * (127.0D / mx) + 0.5D)
        |            AS bigint) END) AS q
        |FROM (SELECT cast(0.0 AS double) AS mx)""".stripMargin)
    assert(df.collect()(0).getSeq[Long](0) == Seq(0L, 0L))
  }

  test("count-min estimates are upward-biased and exact for the top user") {
    val rows = EventQueries.cmsHeavy.run(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("cms_est")
      // CMS never under-counts; collisions only inflate
      assert(est >= exact, s"CMS under-counted: $r")
    }
  }

  test("stratified sample matches a direct recomputation and its strata") {
    val got = DocQueries.stratifiedSample.run(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_total"),
        r.getAs[Long]("n_sampled"))).toSet
    val h = expr(
      "cast(conv(substr(md5(concat('s-', cast(doc_id AS string))), 1, 8), 16, 10) AS bigint) % 100")
    val want = Tables.documents(spark, sf)
      .select(col("lang"), h.as("h"))
      .groupBy("lang")
      .agg(count(lit(1)).as("t"),
        count(when(col("h") < when(col("lang") === "en", 25).otherwise(60), 1))
          .as("s"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // every stratum drew SOMETHING and no stratum kept everything
    got.foreach { case (lang, t, s) =>
      assert(s > 0 && s < t, s"degenerate stratum $lang: $s of $t")
    }
  }

  test("value bands partition the events exactly") {
    val rows = EventQueries.valueBands.run(spark, sf).collect()
    val banded = rows.map(_.getAs[Long]("n_events")).sum
    val total = Tables.events(spark, sf).count()
    assert(banded == total,
      s"bands are not a partition: $banded banded vs $total events")
  }

  test("grouping sets levels are mutually consistent") {
    val rows = JoinQueries.groupingSets.run(spark, sf).collect()
    def items(r: Row) = r.getAs[Long]("n_items")
    val detail = rows.filter(_.getAs[Long]("gid") == 0L)
    val subtotal = rows.filter(_.getAs[Long]("gid") == 1L)
    val grand = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1)
    assert(detail.map(items).sum == items(grand.head))
    assert(subtotal.map(items).sum == items(grand.head))
    subtotal.foreach { st =>
      val flag = st.getAs[String]("returnflag")
      assert(detail.filter(_.getAs[String]("returnflag") == flag)
        .map(items).sum == items(st))
    }
  }

  test("the adaptive LSH width staircase matches its closed form and " +
    "its SQL twin carries the same thresholds") {
    // closed form: clamp(ceil(log2(n / 32)), 8, 16) — occupancy ≈ 32
    def closed(n: Long): Int = {
      val buckets = math.max(1L, (n + 31) / 32)
      var bits = 0
      while ((1L << bits) < buckets) bits += 1
      math.max(8, math.min(16, bits))
    }
    // every boundary on both sides, plus interior points
    val ns = Seq(1L, 100L, 8192L, 8193L, 16384L, 16385L, 32768L, 60000L,
      65536L, 65537L, 131072L, 200000L, 262144L, 524288L, 1048576L,
      1048577L, 5000000L, Long.MaxValue / 2)
    ns.foreach { n =>
      assert(EmbQueries.lshBits(n) == closed(n),
        s"lshBits($n) = ${EmbQueries.lshBits(n)}, closed form ${closed(n)}")
    }
    // the oracle ladder must carry EXACTLY the thresholds the Spark loop
    // walks, in order — a drifted constant would split the engines only
    // above 8192 vectors, which no oracle-gated SF reaches
    val sql = EmbQueries.lshBitsDuck("n")
    val thresholds = (0 to 7).map(k => 8192L << k)
    val positions = thresholds.dropRight(1).zipWithIndex.map {
      case (t, i) =>
        val pat = s"n <= $t THEN ${8 + i}"
        val pos = sql.indexOf(pat)
        assert(pos >= 0, s"oracle ladder missing arm '$pat':\n$sql")
        pos
    }
    assert(positions == positions.sorted, "oracle ladder arms out of order")
    assert(sql.contains("ELSE 16"), "oracle ladder missing the 16-bit cap")
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{Asof, AsofJoinExec}

/** The custom AS-OF join operator: parity with a reference formulation
  * under random data (duplicate left times, sparse right sides, missing
  * keys, nulls), edge cases, and physical-plan shape. */
class AsofSpec extends SparkSpec {
  import spark.implicits._

  /** Reference result via the union+window built-in formulation. */
  private def viaWindow(left: DataFrame, right: DataFrame)
      : Set[(Long, Long, Option[Long], Option[Double])] = {
    val l = left.select(col("k"), col("t"), lit(1).as("side"),
      lit(null).cast("double").as("v"))
    val r = right.select(col("rk").as("k"), col("rt").as("t"),
      lit(0).as("side"), col("v"))
    val w = Window.partitionBy("k").orderBy(col("t"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("m_t",
        last(when(col("side") === 0, col("t")), ignoreNulls = true).over(w))
      .withColumn("m_v",
        last(when(col("side") === 0, col("v")), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("k"), col("t"), col("m_t"), col("m_v"))
      .collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1),
        if (r0.isNullAt(2)) None else Some(r0.getLong(2)),
        if (r0.isNullAt(3)) None else Some(r0.getDouble(3))))
      .toSet
  }

  private def viaAsof(left: DataFrame, right: DataFrame)
      : Set[(Long, Long, Option[Long], Option[Double])] =
    Asof.join(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1),
        if (r0.isNullAt(3)) None else Some(r0.getLong(3)),
        if (r0.isNullAt(4)) None else Some(r0.getDouble(4))))
      .toSet

  test("parity with union+window on random data") {
    val rnd = new scala.util.Random(11)
    // duplicate left times, right rows denser than keys, some keys only
    // on one side; right (key, time) pairs kept unique (operator contract)
    val left = (1 to 2000).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(500).toLong))
      .toDF("k", "t").repartition(7)
    val right = rnd.shuffle((0 until 45).flatMap(k =>
      (0 until 500).filter(_ => rnd.nextBoolean() && rnd.nextBoolean())
        .map(t => (k.toLong, t.toLong, rnd.nextDouble()))))
      .toDF("rk", "rt", "v").repartition(5)
    assert(viaAsof(left, right) == viaWindow(left, right))
  }

  test("inclusive bound: equal timestamps match") {
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 100L, 7.0)).toDF("rk", "rt", "v")
    assert(viaAsof(left, right) ==
      Set((1L, 100L, Some(100L), Some(7.0))))
  }

  test("empty right side yields all-null matches") {
    val left = Seq((1L, 5L), (2L, 6L)).toDF("k", "t")
    val right = Seq.empty[(Long, Long, Double)].toDF("rk", "rt", "v")
    assert(viaAsof(left, right) ==
      Set((1L, 5L, None, None), (2L, 6L, None, None)))
  }

  test("null keys and null times never match") {
    val left = Seq((Some(1L), Some(10L)), (None, Some(10L)),
      (Some(1L), None)).toDF("k", "t")
    val right = Seq((Some(1L), Some(5L), 3.0), (None, Some(1L), 9.0),
      (Some(1L), None, 8.0)).toDF("rk", "rt", "v")
    val got = Asof.join(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .collect()
      .map(r0 => (Option(r0.get(0)), Option(r0.get(1)), Option(r0.get(3))))
      .toSet
    assert(got == Set(
      (Some(1L), Some(10L), Some(5L)), // the only real match
      (None, Some(10L), None),
      (Some(1L), None, None)))
  }

  test("plan uses AsofJoinExec with shuffled+sorted children") {
    val left = Seq((1L, 5L)).toDF("k", "t")
    val right = Seq((1L, 3L, 1.0)).toDF("rk", "rt", "v")
    val df = Asof.join(left, right, Seq("k"), Seq("rk"), "t", "rt")
    df.collect() // force AQE final plan
    // query stages hide their plans from `children`, so assert on the
    // final-plan string: the operator itself plus the exchanges + sorts
    // EnsureRequirements derived from its declared requirements
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"))
    assert(plan.contains("Sort"))
    assert(plan.contains("Exchange hashpartitioning"))
    assert(classOf[AsofJoinExec].getSimpleName.startsWith("AsofJoin")) // linkage
  }

  test("left output ordering and partitioning survive (no extra exchange on reuse)") {
    val left = Seq((1L, 5L), (1L, 7L), (2L, 4L)).toDF("k", "t")
    val right = Seq((1L, 3L, 1.0)).toDF("rk", "rt", "v")
    // grouping the join output by the join key must not need a second
    // shuffle: outputPartitioning is inherited from the left child
    val df = Asof.join(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .groupBy("k").count()
    df.collect()
    // AdaptiveSparkPlan's toString prints final AND initial plans — count
    // exchanges in the final section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.split("Exchange hashpartitioning").length - 1 == 2) // one per join side only
  }

  test("clashing column names are rejected") {
    val left = Seq((1L, 5L)).toDF("k", "t")
    val right = Seq((1L, 3L)).toDF("k", "rt")
    intercept[IllegalArgumentException] {
      Asof.join(left, right, Seq("k"), Seq("k"), "t", "rt")
    }
  }

  test("SQL path: graft_asof table function plans AsofJoinExec") {
    // proves the injection path end-to-end: parse → TVF builder →
    // analyzer-resolved AsofJoin → strategy → physical sorted-merge
    graft.functions.GraftFunctions.register(spark)
    Seq((1L, 5L), (1L, 2L), (2L, 9L)).toDF("k", "t")
      .createOrReplaceTempView("asof_sql_l")
    Seq((1L, 3L, 1.5), (2L, 1L, 2.5)).toDF("rk", "rt", "v")
      .createOrReplaceTempView("asof_sql_r")
    val df = spark.sql(
      "SELECT * FROM graft_asof('asof_sql_l', 'asof_sql_r', 'k', 'rk', 't', 'rt')")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSet
    assert(got == Set(
      (1L, 5L, Some(1L), Some(3L), Some(1.5)), // match: rt=3 <= t=5
      (1L, 2L, None, None, None),              // no right row at/before t=2
      (2L, 9L, Some(2L), Some(1L), Some(2.5))))
    assert(df.queryExecution.executedPlan.toString.contains("AsofJoin"),
      "SQL-built plan did not use AsofJoinExec")
  }

  test("SQL path: non-literal and mistyped graft_asof args are refused") {
    graft.functions.GraftFunctions.register(spark)
    Seq((1L, 5L)).toDF("k", "t").createOrReplaceTempView("asof_sql_l2")
    Seq((1L, "x", 1.0)).toDF("rk", "rt", "v")
      .createOrReplaceTempView("asof_sql_r2")
    // time columns of different types must be refused at planning, not
    // silently compared through mismatched row orderings
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_asof('asof_sql_l2', 'asof_sql_r2', " +
        "'k', 'rk', 't', 'rt')").collect()
    }
    assert(e.getMessage.contains("type mismatch"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_asof('asof_sql_l2', 'asof_sql_r2', " +
        "'k', 'rk', 't')").collect()
    }
    assert(e2.getMessage.contains("graft_asof"))
  }
}

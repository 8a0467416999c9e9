package graft

import org.apache.spark.sql.functions._

/** [[graft.functions.NormalizeText]] must be EXACTLY the composed
  * `trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]+',''),' +',' '))`
  * — pinned case-by-case on the tricky interactions and by a
  * deterministic random sweep against the composed form evaluated by
  * Spark itself. */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def bothForms(texts: Seq[String]): Array[(String, String)] = {
    graft.functions.GraftFunctions.register(spark)
    texts.toDF("text")
      .select(
        expr("graft_normalize(text)").as("fused"),
        trim(regexp_replace(regexp_replace(lower(col("text")),
          "[^a-z0-9 ]+", ""), " +", " ")).as("composed"))
      .as[(String, String)].collect()
  }

  test("fused loop matches the composed form on the tricky cases") {
    val cases = Seq(
      "",                       // empty
      "...!!!",                 // everything stripped → empty
      "   ",                    // all spaces → empty
      "a.,b",                   // strip joins neighbours with NO space
      "a . b",                  // strip then collapse → single space
      "  leading and   trailing  ",
      "MiXeD CaSe 42 OK",
      "tabs\tand\nnewlines stay stripped", // \t\n are not [a-z0-9 ]
      "a" * 5000,               // long single token
      ("ab " * 2000).trim,      // long many-token
      "5 o'clock: don't-stop!! 123x",
      "UPPER lower 0123456789")
    for ((fused, composed) <- bothForms(cases))
      assert(fused == composed, s"fused='$fused' composed='$composed'")
  }

  test("non-ASCII takes the slow path and still matches the composed form") {
    val cases = Seq(
      "café CRÈME über",        // accents strip after lowercase
      "ΚΑΛΗΜΕΡΑ κόσμε",         // non-latin strips entirely
      "K elvin sign",      // U+212A lowercases to ascii 'k'
      "naïve  mix 3ème",
      "emoji 😀 inside")
    for ((fused, composed) <- bothForms(cases))
      assert(fused == composed, s"fused='$fused' composed='$composed'")
  }

  test("deterministic random sweep: 2000 strings, both alphabets") {
    val rnd = new scala.util.Random(13)
    val ascii = " aZ09.!-_#  "
    val wide = " aZ09.!é Ω"
    def gen(alpha: String, n: Int) =
      (0 until n).map(_ => (0 until rnd.nextInt(80))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    for ((fused, composed) <- bothForms(gen(ascii, 1500) ++ gen(wide, 500)))
      assert(fused == composed, s"fused='$fused' composed='$composed'")
  }

  test("stays inside whole-stage codegen") {
    graft.functions.GraftFunctions.register(spark)
    val exec = spark.range(5)
      .select(expr("graft_normalize(cast(id AS string))"))
      .queryExecution.executedPlan
    val inCodegen = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("graft_normalize") => w
    }
    assert(inCodegen.nonEmpty, exec.toString)
  }
}

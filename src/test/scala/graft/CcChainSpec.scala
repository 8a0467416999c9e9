package graft

import org.apache.spark.sql.functions._
import graft.queries.DocQueries

/** Round-bounds the connected-component labeling on an ADVERSARIAL
  * long-chain component — the shape min-label propagation is worst at.
  * A diameter-39 path forces plain propagation to 39 rounds (the min
  * label moves one hop per round, 2 Spark jobs each); the r15
  * pointer-doubling shortcut must converge in O(log diameter).
  *
  * The chain is built from TEXTS, not injected edges, so the whole
  * production pipeline (bucket grammar, strided char-4-gram profile,
  * in-bucket pairing, Jaccard threshold 0.9) is exercised: doc i is a
  * shared 3-token bucket prefix plus a 20-unit sliding window over a
  * pool of distinct 4-char units, giving consecutive docs Jaccard
  * (3+19)/(3+21) = 0.9167 ≥ 0.9 and skip-level docs at most
  * (3+18)/(3+22) = 0.84 < 0.9 — the spec ASSERTS the edge set is
  * exactly the path before trusting any round-count claim on it. */
class CcChainSpec extends SparkSpec {
  import spark.implicits._

  private val N = 40 // path of N nodes → diameter N-1 = 39

  /** All texts share the first three tokens (one bucket); the tail is
    * units i..i+19, each exactly 4 chars, so the strided gram extractor
    * (stride 4 from a 12-char aligned prefix) picks each unit whole. */
  private def chainText(i: Int): String =
    "aaa bbb ccc " + (i until i + 20).map(j => f"u$j%03d").mkString

  private val chainDocs =
    (0 until N).map(i => (100L + i, chainText(i))).toDF("doc_id", "text")

  // Independent spelling of the production Jaccard (strided distinct
  // char-4-grams) so a drift in gramProfilesOf is a failure here too.
  private def gramSet(t: String): Set[String] =
    (1 to (t.length - 3) by 4).map(i => t.substring(i - 1, i + 3)).toSet

  test("the crafted corpus is exactly a diameter-39 path under the " +
    "production bucket + Jaccard-0.9 edge rule") {
    val texts = (0 until N).map(chainText)
    // one bucket: identical first three tokens
    assert(texts.map(_.split("\\s+").take(3).toList).distinct.size == 1)
    // gram alignment: every text yields 3 prefix grams + its 20 units
    assert(gramSet(texts(0)).size == 23)
    for (a <- 0 until N; b <- a + 1 until N) {
      val (ga, gb) = (gramSet(texts(a)), gramSet(texts(b)))
      val j = (ga & gb).size.toDouble / (ga | gb).size
      if (b == a + 1) assert(j >= 0.9, s"consecutive pair ($a,$b) j=$j")
      else assert(j < 0.9, s"skip pair ($a,$b) j=$j must not edge")
    }
  }

  test("pointer-doubled labeling converges in O(log diameter) rounds " +
    "on the diameter-39 path, to the component-min fixpoint") {
    val g = DocQueries.gramProfilesOf(chainDocs)
    val (labels, rounds) = DocQueries.repClusterLabelsWithRounds(g)
    val got = labels.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    // every node labeled with the component minimum (doc_id 100)
    assert(got == (0 until N).map(i => (100L + i) -> 100L).toMap)
    // the round bound this spec exists for: plain propagation needs
    // diameter+1 = 40 rounds here; the shortcut variant is logarithmic
    info(s"converged in $rounds rounds on a diameter-39 path")
    assert(rounds <= 10, s"pointer doubling regressed: $rounds rounds " +
      "on a diameter-39 path (plain propagation would take 40)")
  }

  test("clique + singletons still converge in a constant round count") {
    // sanity at the other extreme: a 5-clique (identical windows) and
    // two isolated docs — isolated docs are absent from the labels
    val clique = (0 until 5).map(i => (200L + i, chainText(0)))
    val far = Seq((300L, chainText(25)), (301L, "zzz yyy xxx " +
      (60 until 80).map(j => f"u$j%03d").mkString))
    val g = DocQueries.gramProfilesOf((clique ++ far).toDF("doc_id", "text"))
    val (labels, rounds) = DocQueries.repClusterLabelsWithRounds(g)
    val got = labels.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(got == (0 until 5).map(i => (200L + i) -> 200L).toMap)
    assert(rounds <= 3, s"clique converged in $rounds rounds")
  }
}

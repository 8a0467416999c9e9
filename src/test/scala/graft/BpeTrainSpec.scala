package graft

import org.apache.spark.sql.functions._

import graft.queries.DocQueries

/** Property tests for the iterated BPE trainer ([[DocQueries.bpeTrain]]):
  * the engine's merge table must equal an INDEPENDENT in-memory BPE
  * implementation run over the same word-type histogram (different code
  * path: plain Scala collections, no SQL), and the selected pair counts
  * must be monotonically non-increasing — a theorem of greedy BPE (a
  * just-merged symbol XY contributes at most count(X,Y) occurrences to
  * any new pair; every pre-existing pair already lost the argmax), so a
  * violation is an engine bug regardless of corpus. */
class BpeTrainSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Reference BPE: greedy left-to-right merge application over symbol
    * vectors, argmax by (count desc, pair-string asc) — the textbook
    * algorithm, written against collections so it shares nothing with
    * the SQL spelling it checks. */
  private def referenceBpe(hist: Map[String, Long],
                           k: Int): Seq[(String, Long)] = {
    var types: Seq[(Vector[String], Long)] =
      hist.toSeq.map { case (w, c) => (w.map(_.toString).toVector, c) }
    (1 to k).map { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      types.foreach { case (syms, c) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      val ((a, b), n) = counts.toSeq
        .minBy { case ((x, y), c) => (-c, s"$x $y") }
      types = types.map { case (syms, c) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), c)
      }
      (s"$a $b", n)
    }
  }

  test("merge table equals an independent in-memory BPE over the same " +
    "histogram") {
    val hist = Tables.documents(spark, sf)
      .select(explode(expr(DocQueries.tokSpark)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceBpe(hist, DocQueries.BpeMerges)

    val got = DocQueries.bpeTrain.run(spark, sf)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getLong(3))).toSeq
    assert(got == expected,
      s"engine merges $got != reference merges $expected")
  }

  test("selected pair counts are monotonically non-increasing") {
    val counts = DocQueries.bpeTrain.run(spark, sf)
      .orderBy("step").collect().map(_.getLong(3)).toSeq
    assert(counts.size == DocQueries.BpeMerges)
    counts.sliding(2).foreach { w =>
      assert(w(0) >= w(1), s"pair count increased across merges: $counts")
    }
  }

  test("merged symbols compose: a late merge can consume an earlier " +
    "merge's output symbol") {
    // guards the loop against the degenerate "K independent char pairs"
    // reading — at least one merge must pair a multi-char symbol
    val merges = DocQueries.bpeTrain.run(spark, sf)
      .orderBy("step").collect().map(_.getString(1))
    assert(merges.exists(_.split(' ').exists(_.length > 1)),
      s"no merge consumed a merged symbol: ${merges.toSeq}")
  }

  test("encoded token histogram equals an independent in-memory encode " +
    "(the DuckDB oracle shares the fold spelling; this one shares " +
    "nothing)") {
    // apply the reference merges greedily left-to-right in training
    // order — the textbook apply-BPE — then build the token histogram
    // the registered query reports (corpus occurrences via type
    // counts + distinct word types per token, top-20 by count desc,
    // token asc)
    val hist = Tables.documents(spark, sf)
      .select(explode(expr(DocQueries.tokSpark)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = referenceBpe(hist, DocQueries.BpeMerges)
      .map(_._1.split(' ') match { case Array(a, b) => (a, b) })
    var types: Seq[(Vector[String], Long)] =
      hist.toSeq.map { case (w, c) => (w.map(_.toString).toVector, c) }
    merges.foreach { case (a, b) =>
      types = types.map { case (syms, c) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), c)
      }
    }
    val occ = scala.collection.mutable.Map.empty[String, (Long, Long)]
    types.foreach { case (syms, c) =>
      // blank docs tokenize to [''] → an empty symbol vector joins/
      // splits back to a single '' token in the engine spelling
      val tokens = if (syms.isEmpty) Vector("") else syms
      tokens.distinct.foreach { t =>
        val n = tokens.count(_ == t).toLong
        val (o, w) = occ.getOrElse(t, (0L, 0L))
        occ(t) = (o + n * c, w + 1)
      }
    }
    val expected = occ.toSeq
      .map { case (t, (o, w)) => (t, o, w) }
      .sortBy { case (t, o, _) => (-o, t) }
      .take(20)

    val got = DocQueries.bpeEncode.run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected,
      s"engine token histogram $got != reference $expected")
  }
}

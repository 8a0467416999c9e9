package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Randomized first-seen-wins property for `docs_ingest_dedup_gate`.
  *
  * The trick that makes a driver-side expected value computable WITHOUT
  * reimplementing the MinHash lineage: on corpora whose distinct texts
  * draw from DISJOINT vocabularies, exact-Jaccard verification decides
  * everything — identical texts share every band bucket and verify at
  * Jaccard 1 (always dropped against an earlier kept copy), while any
  * chance bucket collision between different texts verifies at Jaccard
  * 0 < 0.5 (never dropped). So the gate's full per-block output
  * (counts AND the dup_of checksum) reduces to plain exact-dup
  * first-seen-wins bookkeeping: md5-spread block assignment, in-batch
  * min-id reps, and cross-block drops for texts whose earlier block
  * already kept a copy — with the one lineage-derived rule that docs
  * under 3 tokens have no shingles, hence no bands, hence can never be
  * flagged ACROSS blocks (in-batch exact dedup still catches them).
  * Random group sizes, multiplicities, short docs, and shuffled ids
  * exercise the 4-round kept-set recursion over arbitrary block
  * distributions; seeded, so a failure replays. */
class GateRandomSpec extends SparkSpec {

  private case class Corpus(rows: Seq[(Long, String)]) {
    override def toString: String =
      s"Corpus(${rows.size} docs, ${rows.map(_._2).distinct.size} distinct)"
  }

  private val corpusGen: Gen[Corpus] = for {
    nGroups <- Gen.choose(4, 12)
    sizes <- Gen.listOfN(nGroups, Gen.choose(1, 8))
    nShort <- Gen.choose(0, 4)
    shuffle <- Gen.long
  } yield {
    // group g's text uses tokens unique to g — cross-group shingle
    // overlap is exactly zero by construction
    val texts = sizes.zipWithIndex.flatMap { case (n, g) =>
      Seq.fill(n)((0 until 6).map(w => s"g${g}w$w").mkString(" "))
    } ++ Seq.fill(nShort)("xy")
    val rnd = new scala.util.Random(shuffle)
    val ids = rnd.shuffle(texts.indices.map(_ + 1L).toVector)
    Corpus(texts.zip(ids).map { case (t, id) => (id, t) })
  }

  /** The Spark side's md5-spread block key, re-derived in plain JVM:
    * first 4 hex chars of md5(doc_id as string), base-16, mod 4. */
  private def blockOf(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .take(2).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % 4
  }

  /** Driver-side expected rows (block, n_docs, n_flagged, n_dropped,
    * n_kept, dup_of_sum), by literal first-seen-wins bookkeeping. */
  private def expected(c: Corpus): Seq[Seq[Long]] = {
    val byDoc = c.rows.map { case (id, t) => (id, t, blockOf(id)) }
    // in-batch: rep = min id per (text, block); copies flag with rep id
    val reps = byDoc.groupBy(r => (r._2, r._3)).map { case (_, ds) =>
      ds.minBy(_._1)
    }.toSet
    val inb = byDoc.filterNot(reps).map(d =>
      d._1 -> reps.find(r => r._2 == d._2 && r._3 == d._3).get._1)
    // cross-block: block order 0..3; a rep drops iff an earlier-kept
    // doc holds the SAME text and the text shingles (≥ 3 tokens)
    var kept = Map.empty[String, Long] // text -> first kept doc id
    val cross = scala.collection.mutable.Map.empty[Long, Option[Long]]
    (0L to 3L).foreach { b =>
      val blockReps = reps.filter(_._3 == b).toSeq.sortBy(_._1)
      val decided = blockReps.map { case (id, t, _) =>
        val dup =
          if (t.split(" ").length < 3) None
          else kept.get(t)
        (id, t, dup)
      }
      decided.foreach { case (id, t, dup) =>
        if (dup.isDefined) cross(id) = dup
        else if (!kept.contains(t)) kept += t -> id
        else () // same-block later rep impossible: one rep per (text, block)
      }
    }
    // assemble per-block rows; flagged = docs with ANY decision row
    // (in-batch always carries dup_of; verified-clean cross candidates
    // cannot arise on disjoint vocabularies)
    val dupOf: Map[Long, Option[Long]] =
      inb.map { case (d, r) => d -> Some(r) }.toMap ++ cross.toMap
    byDoc.groupBy(_._3).toSeq.sortBy(_._1).map { case (b, ds) =>
      val flagged = ds.flatMap(d => dupOf.get(d._1).map(d._1 -> _))
      val dropped = flagged.collect { case (_, Some(r)) => r }
      Seq(b, ds.size.toLong, flagged.size.toLong, dropped.size.toLong,
        ds.size.toLong - dropped.size, dropped.sum)
    }
  }

  test("randomized exact-dup corpora: gate output equals driver-side " +
    "first-seen-wins bookkeeping, including the dup_of checksum") {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(5)
        .withInitialSeed(Seed(99110814L)),
      Prop.forAllNoShrink(corpusGen) { c =>
        val dir = tmpDir("gate-rand")
        import spark.implicits._
        c.rows.toDF("doc_id", "text")
          .withColumn("lang", lit("en"))
          .withColumn("source", lit("synthetic"))
          .withColumn("n_chars", length(col("text")))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val got = graft.queries.DocQueries.ingestDedupGate.run(spark, dir)
          .collect()
          .map(r => Seq(r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5)))
          .toSeq
        got == expected(c)
      })
    assert(res.passed, res.status.toString)
  }
}

package graft

import java.security.MessageDigest

import graft.multimodal.Media

/** Multimodal plumbing: the typed binary-column pipeline is deterministic
  * and its stubbed decode derives exactly from the payload digest (the
  * contract a real codec would replace). */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world", "en", "srcA", 11L),
    (2L, "quick brown fox", "en", "srcB", 15L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("payload carries the utf-8 text bytes") {
    val m = Media.mediaFromDocuments(docs).collect().sortBy(_.doc_id)
    assert(new String(m(0).payload, "UTF-8") == "hello world")
    assert(m.forall(_.media_type == "image/stub"))
  }

  test("decodeFeatures is deterministic and digest-derived") {
    val out = Media.decodeFeatures(Media.mediaFromDocuments(docs))
      .collect().sortBy(_.doc_id)
    val expectedDigest = MessageDigest.getInstance("SHA-256")
      .digest("hello world".getBytes("UTF-8"))
    def u(i: Int) = expectedDigest(i) & 0xff
    val r = out(0)
    assert(r.n_bytes == 11)
    assert(r.width == 64 + u(0) * 16 + u(1))
    assert(r.height == 64 + u(2) * 16 + u(3))
    assert(r.checksum == expectedDigest.map("%02x".format(_)).mkString)
    assert(r.features.length == 8)
    assert(r.features.forall(f => f >= 0f && f <= 1f))
    // run twice → identical (stub must be pure)
    val again = Media.decodeFeatures(Media.mediaFromDocuments(docs))
      .collect().sortBy(_.doc_id)
    assert(again(0).checksum == r.checksum &&
      again(0).features.sameElements(r.features))
  }

  test("decodeStats aggregates per source") {
    val stats = Media.decodeStats(docs).collect()
    assert(stats.map(r => (r.getAs[String]("source"),
      r.getAs[Long]("n_media"), r.getAs[Long]("total_bytes"))).toSeq ==
      Seq(("srcA", 1L, 11L), ("srcB", 1L, 15L)))
  }
}

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

  test("null payloads are skipped, not NPE-fatal") {
    val withNull = Seq(
      Media.MediaRow(1L, "srcA", "image/stub", "abc".getBytes("UTF-8")),
      Media.MediaRow(2L, "srcA", "image/stub", null)).toDS()
    assert(Media.decodeFeatures(withNull).collect().map(_.doc_id).toSeq
      == Seq(1L))
    assert(Media.sampleFrames(withNull, frameLen = 2, stride = 1)
      .collect().forall(_.doc_id == 1L))
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

  test("sampleFrames takes every stride-th frame, short tail included") {
    // 150-byte payload, frameLen 64 → frames {0,1,2}; stride 2 → {0, 2};
    // frame 2 is the 22-byte tail
    val d = Seq((1L, "x" * 150, "en", "srcA", 150L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val frames = Media.sampleFrames(Media.mediaFromDocuments(d),
      frameLen = 64, stride = 2).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    val tail = MessageDigest.getInstance("SHA-256")
      .digest(("x" * 22).getBytes("UTF-8"))
    assert(frames(1).checksum == tail.map("%02x".format(_)).mkString)
    assert(frames(1).luma == (tail(0) & 0xff))
  }

  test("resize downscales with preserved aspect, small dims untouched") {
    val decoded = Seq(
      ("srcA", 4000, 2000), // → (256, 128)
      ("srcA", 100, 200)    // ≤ 256 → untouched
    ).toDF("source", "width", "height")
    val out = Media.resize(decoded, maxDim = 256)
      .orderBy("width").collect()
    assert(out(1).getAs[Any]("resized_width").toString.toLong == 256L &&
      out(1).getAs[Any]("resized_height").toString.toLong == 128L &&
      out(1).getAs[Int]("downscaled") == 1)
    assert(out(0).getAs[Any]("resized_width").toString.toLong == 100L &&
      out(0).getAs[Int]("downscaled") == 0)
  }

  test("decodeStats aggregates per source") {
    val stats = graft.queries.MediaQueries.decodeStatsAgg(docs).collect()
    assert(stats.map(r => (r.getAs[String]("source"),
      r.getAs[Long]("n_media"), r.getAs[Long]("total_bytes"))).toSeq ==
      Seq(("srcA", 1L, 11L), ("srcB", 1L, 15L)))
  }
}

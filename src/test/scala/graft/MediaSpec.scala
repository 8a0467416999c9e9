package graft

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import graft.multimodal.Media

/** Multimodal plumbing: payloads are real PNG/BMP files and the decode is
  * a real `javax.imageio` parse — these tests check the round trip
  * against the synthesis formulas AND against independent literal
  * expectations, so a codec regression and a formula drift both fail. */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world", "en", "srcA", 11L),
    (2L, "quick brown fox", "en", "srcB", 15L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("payload is a genuine PNG with the formula dimensions and pixels") {
    val m = Media.imagesFromDocuments(docs).collect().sortBy(_.doc_id)
    assert(m.forall(_.media_type == "image/png"))
    // PNG magic bytes — the payload is a real file, not a digest fake
    assert(m(0).payload.take(4).map(_ & 0xff).toSeq ==
      Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt))
    // independent decode of doc_id = 1: literal expected dims (w = 4 +
    // 1 % 13 = 5, h = 4 + 0 % 11 = 4) and exact pixel values
    val img = ImageIO.read(new ByteArrayInputStream(m(0).payload))
    assert(img.getWidth == 5 && img.getHeight == 4)
    for (x <- 0 until 5; y <- 0 until 4)
      assert((img.getRGB(x, y) & 0xffffff) == Media.imgPixel(1, x, y),
        s"pixel ($x, $y) survived the PNG round trip wrong")
  }

  test("decodeFeatures parses real dims and exact channel sums") {
    val out = Media.decodeFeatures(Media.imagesFromDocuments(docs))
      .collect().sortBy(_.doc_id)
    val r = out(0) // doc_id = 1: 5×4, base = 1
    assert(r.width == 5 && r.height == 4)
    var (er, eg, eb) = (0L, 0L, 0L)
    for (x <- 0 until 5; y <- 0 until 4) {
      val p = Media.imgPixel(1, x, y)
      er += (p >> 16) & 0xff; eg += (p >> 8) & 0xff; eb += p & 0xff
    }
    assert((r.sum_r, r.sum_g, r.sum_b) == ((er, eg, eb)))
    assert(r.features.length == 3)
    assert(math.abs(r.features(0) - er / (20f * 255f)) < 1e-6f)
    // run twice → identical (synthesis and decode must both be pure)
    val again = Media.decodeFeatures(Media.imagesFromDocuments(docs))
      .collect().sortBy(_.doc_id)
    assert(again(0).checksum == r.checksum &&
      again(0).features.sameElements(r.features))
  }

  test("null and undecodable payloads are skipped, not fatal") {
    val png = Media.imagesFromDocuments(docs).collect()
      .find(_.doc_id == 1L).get.payload
    val mixed = Seq(
      Media.MediaRow(1L, "srcA", "image/png", png),
      Media.MediaRow(2L, "srcA", "image/png", null),
      Media.MediaRow(3L, "srcA", "image/png",
        "definitely not an image".getBytes("UTF-8"))).toDS()
    assert(Media.decodeFeatures(mixed).collect().map(_.doc_id).toSeq
      == Seq(1L))
    assert(Media.sampleFrames(mixed, frameLen = 8, stride = 1)
      .collect().isEmpty) // 8-byte slices of a PNG are not frames → skipped
  }

  test("video payloads are fixed-length BMP frames; sampling decodes them") {
    // 150 chars → ceil(150/64) = 3 frames; stride 2 → frames {0, 2}
    val d = Seq((1L, "x" * 150, "en", "srcA", 150L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val v = Media.videosFromDocuments(d).collect().head
    assert(v.payload.length == 3 * Media.bmpFrameLen)
    val frames = Media.sampleFrames(Media.videosFromDocuments(d),
      frameLen = Media.bmpFrameLen, stride = 2).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    // decoded luma of frame 2 (dk = 1) matches the synthesis formula
    var s = 0L
    for (x <- 0 until 4; y <- 0 until 4) {
      val p = Media.framePixel(1, 2, x, y)
      s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
    }
    assert(frames(1).luma == (s / 48L).toInt)
  }

  test("frames dedup across documents by content: same dk → same bytes") {
    // doc_ids 5 and 69 share dk = 5 % 64 = 69 % 64 = 5 → frame 0 bytes equal
    val d = Seq((5L, "x" * 64, "en", "srcA", 64L),
                (69L, "x" * 64, "en", "srcB", 64L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val frames = Media.sampleFrames(Media.videosFromDocuments(d),
      frameLen = Media.bmpFrameLen, stride = 1).collect()
    assert(frames.length == 2)
    assert(frames(0).checksum == frames(1).checksum)
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

  test("decodeStats aggregates per source over real decoded dims") {
    val stats = graft.queries.MediaQueries.decodeStatsAgg(docs).collect()
    // doc 1 → 5×4, doc 2 → 6×4
    assert(stats.map(r => (r.getAs[String]("source"),
      r.getAs[Long]("n_media"), r.getAs[Long]("sum_width"),
      r.getAs[Long]("sum_height"))).toSeq ==
      Seq(("srcA", 1L, 5L, 4L), ("srcB", 1L, 6L, 4L)))
  }
}

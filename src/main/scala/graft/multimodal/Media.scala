package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): image/audio/video payloads
  * travel as opaque `binary` columns with typed metadata; decode and
  * feature extraction run per-partition so a real codec would be
  * initialized once per task, not per row.
  *
  * The container has no image/audio libraries, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (dims/features derived from a
  * SHA-256 of the payload). Everything around it — the typed schema, the
  * partition-preserving batch iteration, the per-partition "codec" init,
  * the feature-vector shape — is the real Spark-side contract a codec
  * would drop into.
  */
object Media {

  /** One media object: payload + routing metadata (`source` rides along
    * so downstream aggregation needs no join back to the corpus). */
  final case class MediaRow(doc_id: Long, source: String, media_type: String,
                            payload: Array[Byte])

  /** Decoded metadata + extracted feature vector. */
  final case class MediaFeatures(doc_id: Long, source: String,
                                 media_type: String,
                                 n_bytes: Int, width: Int, height: Int,
                                 checksum: String, features: Array[Float])

  /** Synthesize an opaque binary media column from the documents table
    * (the corpus ships no real media; payloads are the utf-8 text
    * bytes). At 100 TB payloads would live in parquet binary columns or
    * object-store pointers — the schema is identical either way. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      col("source"),
      lit("image/stub").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Decode + feature-extract, batch-shaped: `mapPartitions` so the codec
    * (here: a MessageDigest standing in for a JPEG/audio decoder —
    * STUB, see object doc) is constructed once per partition and rows
    * stream through it. Replace the body of `decodeOne` with a real
    * codec call to productionize; nothing else changes. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition "codec" init — a real decoder would open here.
      // Null payloads (row has no media) are SKIPPED, the relational
      // analogue of null-propagating scalar decode — one NPE-ing row
      // must not abort a corpus-wide decode pass.
      val codec = MessageDigest.getInstance("SHA-256")
      rows.filter(_.payload != null).map(r => decodeOne(codec, r))
    }
  }

  /** STUB decode: a real implementation would parse the image header for
    * (width, height) and run a feature extractor over decoded pixels.
    * The deterministic fake derives both from the payload digest so
    * tests are stable and the full pipeline shape is exercised. */
  private def decodeOne(codec: MessageDigest, r: MediaRow): MediaFeatures = {
    val digest = codec.digest(r.payload)
    def u(i: Int): Int = digest(i) & 0xff
    MediaFeatures(
      doc_id = r.doc_id,
      source = r.source,
      media_type = r.media_type,
      n_bytes = r.payload.length,
      width = 64 + u(0) * 16 + u(1),    // "parsed" header dims
      height = 64 + u(2) * 16 + u(3),
      checksum = digest.map("%02x".format(_)).mkString,
      features = (0 until 8).map(i => u(i + 4) / 255.0f).toArray)
  }

  /** One sampled frame of a "video" payload. */
  final case class FrameSample(doc_id: Long, source: String, frame_idx: Int,
                               checksum: String, luma: Int)

  /** Frame sampling (the video-pipeline verb): the payload is treated as
    * consecutive `frameLen`-byte frames and every `stride`-th frame is
    * decoded — the keyframe-sampling shape. flatMap-shaped
    * `mapPartitions`: one codec init per partition, sampled frames
    * stream out without materializing whole videos. The per-frame decode
    * is the same deterministic STUB (digest → checksum + a fake luma
    * byte); a real decoder drops into the same loop. */
  def sampleFrames(media: Dataset[MediaRow], frameLen: Int = 64,
                   stride: Int = 4): Dataset[FrameSample] = {
    // fail at plan time with a clear message, not with an executor-side
    // ArithmeticException (frameLen = 0) or a silent one-frame result
    // (stride < 0 keeps only frame 0)
    require(frameLen > 0, s"frameLen must be positive, got $frameLen")
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val codec = MessageDigest.getInstance("SHA-256")
      rows.filter(_.payload != null).flatMap { r =>
        val nFrames = (r.payload.length + frameLen - 1) / frameLen
        (0 until nFrames).iterator.filter(_ % stride == 0).map { i =>
          val from = i * frameLen
          val until = math.min(from + frameLen, r.payload.length)
          val digest = codec.digest(
            java.util.Arrays.copyOfRange(r.payload, from, until))
          FrameSample(r.doc_id, r.source, i,
            digest.map("%02x".format(_)).mkString, digest(0) & 0xff)
        }
      }
    }
  }

  /** Aspect-preserving integer resize of decoded dimensions — pure
    * column arithmetic (codegen'd), deliberately NOT inside the
    * mapPartitions codec: only the decode needs partition-local init;
    * everything downstream of it should stay in Tungsten. Integer
    * `div` keeps the math exact and engine-independent. */
  def resize(decoded: DataFrame, maxDim: Int = 256): DataFrame = {
    val mx = greatest(col("width"), col("height"))
    def scaled(c: String) =
      when(mx <= maxDim, col(c)).otherwise(
        greatest(lit(1), expr(s"$c * $maxDim div greatest(width, height)")))
    decoded
      .withColumn("resized_width", scaled("width"))
      .withColumn("resized_height", scaled("height"))
      .withColumn("downscaled", (mx > maxDim).cast("int"))
  }

}

package graft.queries

import graft.{NamedQuery, Tables}
import graft.multimodal.Media

/** Oracle coverage for the multimodal plumbing: the Spark side runs the
  * REAL typed `mapPartitions` decode pipeline
  * ([[graft.multimodal.Media]]); the oracle re-derives the stub decode
  * arithmetically from `sha256` (identical hex in DuckDB), validating the
  * binary-column plumbing end-to-end — payload bytes, per-partition
  * decode, metadata extraction, downstream aggregation.
  */
object MediaQueries {

  /** byte `i` (0-based) of a hex digest string as an int, 0-255. */
  private def byteAt(h: String, i: Int): String = {
    def hexv(n: Int) =
      s"(strpos('0123456789abcdef', substr($h, $n, 1)) - 1)"
    s"(${hexv(2 * i + 1)} * 16 + ${hexv(2 * i + 2)})"
  }

  /** Aggregate decoded-media statistics per source — the downstream
    * query a training pipeline runs over extracted metadata. Lives HERE,
    * beside its oracle twin, so the two stay column-for-column in sight
    * of each other (single scan: source travels through the typed
    * pipeline, no join back to the corpus). */
  def decodeStatsAgg(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    Media.decodeFeatures(Media.mediaFromDocuments(docs)).toDF()
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("height").cast("long")).as("sum_height"))
      .orderBy("source")
  }

  val decodeStats: NamedQuery = NamedQuery(
    "media_decode_stats",
    s"""WITH m AS (
       |  SELECT source,
       |         octet_length(encode(text)) AS n_bytes,
       |         sha256(text) AS h
       |  FROM documents
       |),
       |d AS (
       |  SELECT source, n_bytes,
       |         64 + ${byteAt("h", 0)} * 16 + ${byteAt("h", 1)} AS width,
       |         64 + ${byteAt("h", 2)} * 16 + ${byteAt("h", 3)} AS height
       |  FROM m
       |)
       |SELECT source,
       |       count(*) AS n_media,
       |       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       |       CAST(sum(width) AS BIGINT) AS sum_width,
       |       CAST(sum(height) AS BIGINT) AS sum_height
       |FROM d
       |GROUP BY 1
       |ORDER BY 1""".stripMargin) { (s, d) =>
    decodeStatsAgg(Tables.documents(s, d))
  }

  /** Keyframe sampling over "video" payloads: every 4th 64-byte frame,
    * per-frame stub decode, per-source stats incl. cross-document frame
    * dedup (`n_unique_frames` — repeated frames collapse, the dedup-
    * before-training shape). The oracle re-derives each sampled frame's
    * sha256 from character offsets (corpus is pure ASCII, so DuckDB's
    * char-based substr slices the same bytes the Spark side hashes). */
  val frameSample: NamedQuery = NamedQuery(
    "media_frame_sample",
    s"""WITH f AS (
       |  SELECT doc_id, source, i AS frame_idx,
       |         sha256(substr(text, 1 + CAST(i AS INTEGER) * 64, 64)) AS h
       |  FROM documents,
       |       unnest(range(0, (len(text) + 63) // 64)) AS u(i)
       |  WHERE i % 4 = 0
       |)
       |SELECT source,
       |       count(*) AS n_frames,
       |       count(DISTINCT h) AS n_unique_frames,
       |       CAST(sum(${byteAt("h", 0)}) AS BIGINT) AS luma_total
       |FROM f
       |GROUP BY 1
       |ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.functions._
    Media.sampleFrames(Media.mediaFromDocuments(Tables.documents(s, d)))
      .toDF()
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_frames"),
        countDistinct(col("checksum")).as("n_unique_frames"),
        sum(col("luma").cast("long")).as("luma_total"))
      .orderBy("source")
  }

  /** Aspect-preserving resize over decoded dims — decode (partition-
    * local stub) then pure integer column arithmetic; per-source sums
    * of the resized dimensions stay exact in both engines. */
  val resizeStats: NamedQuery = NamedQuery(
    "media_resize_stats",
    s"""WITH m AS (
       |  SELECT source, sha256(text) AS h FROM documents
       |),
       |d AS (
       |  SELECT source,
       |         64 + ${byteAt("h", 0)} * 16 + ${byteAt("h", 1)} AS width,
       |         64 + ${byteAt("h", 2)} * 16 + ${byteAt("h", 3)} AS height
       |  FROM m
       |),
       |r AS (
       |  SELECT source, width, height,
       |         CASE WHEN greatest(width, height) <= 256 THEN width
       |              ELSE greatest(1, width * 256 // greatest(width, height))
       |         END AS rw,
       |         CASE WHEN greatest(width, height) <= 256 THEN height
       |              ELSE greatest(1, height * 256 // greatest(width, height))
       |         END AS rh,
       |         CASE WHEN greatest(width, height) > 256 THEN 1 ELSE 0
       |         END AS ds
       |  FROM d
       |)
       |SELECT source,
       |       count(*) AS n_media,
       |       CAST(sum(ds) AS BIGINT) AS n_downscaled,
       |       CAST(sum(rw) AS BIGINT) AS sum_rw,
       |       CAST(sum(rh) AS BIGINT) AS sum_rh
       |FROM r
       |GROUP BY 1
       |ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.functions._
    val decoded = Media.decodeFeatures(
      Media.mediaFromDocuments(Tables.documents(s, d))).toDF()
    Media.resize(decoded)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("downscaled").cast("long")).as("n_downscaled"),
        sum(col("resized_width").cast("long")).as("sum_rw"),
        sum(col("resized_height").cast("long")).as("sum_rh"))
      .orderBy("source")
  }

  val all: Seq[NamedQuery] = Seq(decodeStats, frameSample, resizeStats)
}

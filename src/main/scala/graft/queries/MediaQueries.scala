package graft.queries

import graft.{NamedQuery, Tables}
import graft.multimodal.Media

/** Oracle coverage for the multimodal plumbing. The Spark side runs the
  * REAL codec pipeline ([[graft.multimodal.Media]]): synthesized PNG /
  * BMP payloads decoded with `javax.imageio`, dimensions parsed from the
  * actual file headers, channel sums computed from the decoded raster.
  * The oracle predicts those outputs ARITHMETICALLY from the synthesis
  * formulas (`Media.imgWidth/imgHeight/imgPixel/framePixel`) — it never
  * sees the bytes, so the row hashes match only if the encode→decode
  * round trip through the real codecs is lossless and correct. A broken
  * header parse, a channel-order swap, or a wrong raster sum is a hash
  * mismatch.
  */
object MediaQueries {

  /** Aggregate decoded-media statistics per source — the downstream
    * query a training pipeline runs over extracted metadata. Lives HERE,
    * beside its oracle twin, so the two stay column-for-column in sight
    * of each other (single scan: source travels through the typed
    * pipeline, no join back to the corpus). Gated columns are integer
    * dimension and channel-sum totals — exact in both engines. */
  def decodeStatsAgg(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    Media.decodeFeatures(Media.imagesFromDocuments(docs)).toDF()
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("height").cast("long")).as("sum_height"),
        sum(col("sum_r")).as("sum_r"),
        sum(col("sum_g")).as("sum_g"),
        sum(col("sum_b")).as("sum_b"))
      .orderBy("source")
  }

  val decodeStats: NamedQuery = NamedQuery(
    "media_decode_stats",
    """WITH d AS (
      |  SELECT doc_id, source,
      |         4 + doc_id % 13 AS w,
      |         4 + (doc_id // 13) % 11 AS h,
      |         doc_id % 251 AS base
      |  FROM documents
      |),
      |px AS (
      |  SELECT doc_id, source, w, h,
      |         (base + x) % 256 AS r,
      |         (base + y) % 256 AS g,
      |         (base + x + y) % 256 AS b
      |  FROM d, unnest(range(0, w)) ux(x), unnest(range(0, h)) uy(y)
      |),
      |img AS (
      |  SELECT doc_id, source, any_value(w) AS w, any_value(h) AS h,
      |         sum(r) AS sr, sum(g) AS sg, sum(b) AS sb
      |  FROM px GROUP BY 1, 2
      |)
      |SELECT source,
      |       count(*) AS n_media,
      |       CAST(sum(w) AS BIGINT) AS sum_width,
      |       CAST(sum(h) AS BIGINT) AS sum_height,
      |       CAST(sum(sr) AS BIGINT) AS sum_r,
      |       CAST(sum(sg) AS BIGINT) AS sum_g,
      |       CAST(sum(sb) AS BIGINT) AS sum_b
      |FROM img
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    decodeStatsAgg(Tables.documents(s, d))
  }

  /** Keyframe sampling over video payloads: every 4th fixed-length BMP
    * frame is sliced out and decoded for real; per-source stats include
    * cross-document frame dedup (`n_unique_frames` — frames with equal
    * bytes collapse, the dedup-before-training shape). The oracle counts
    * distinct (doc_id % 64, frame_idx) synthesis keys — equal to the
    * Spark side's distinct-checksum count precisely because BMP encoding
    * is lossless and deterministic, so frame bytes are injective in the
    * synthesis key. Luma is the decoded integer mean over all channels,
    * predicted from the pixel formula. */
  val frameSample: NamedQuery = NamedQuery(
    "media_frame_sample",
    """WITH v AS (
      |  SELECT doc_id, source,
      |         doc_id % 64 AS dk,
      |         (len(text) + 63) // 64 AS nf
      |  FROM documents
      |),
      |f AS (
      |  SELECT doc_id, source, dk, i AS fi
      |  FROM v, unnest(range(0, nf)) u(i)
      |  WHERE i % 4 = 0
      |),
      |px AS (
      |  SELECT doc_id, source, dk, fi,
      |         CASE WHEN x = 0 AND y = 0 THEN dk
      |              ELSE (dk + x + fi) % 256 END AS r,
      |         CASE WHEN x = 0 AND y = 0 THEN fi
      |              ELSE (dk + y) % 256 END AS g,
      |         CASE WHEN x = 0 AND y = 0 THEN 0
      |              ELSE (x + y) % 256 END AS b
      |  FROM f, unnest(range(0, 4)) ux(x), unnest(range(0, 4)) uy(y)
      |),
      |fr AS (
      |  SELECT doc_id, source, dk, fi,
      |         (sum(r) + sum(g) + sum(b)) // 48 AS luma
      |  FROM px GROUP BY 1, 2, 3, 4
      |)
      |SELECT source,
      |       count(*) AS n_frames,
      |       count(DISTINCT dk * 1024 + fi) AS n_unique_frames,
      |       CAST(sum(luma) AS BIGINT) AS luma_total
      |FROM fr
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.functions._
    Media.sampleFrames(
        Media.videosFromDocuments(Tables.documents(s, d)),
        frameLen = Media.bmpFrameLen, stride = 4)
      .toDF()
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_frames"),
        countDistinct(col("checksum")).as("n_unique_frames"),
        sum(col("luma").cast("long")).as("luma_total"))
      .orderBy("source")
  }

  /** Aspect-preserving resize over REAL decoded dims (parsed from the
    * PNG headers) then pure integer column arithmetic; per-source sums
    * of the resized dimensions stay exact in both engines. maxDim = 8
    * sits inside the synthesized 4..16 dimension range so both the
    * downscale and pass-through branches stay live. */
  val resizeStats: NamedQuery = NamedQuery(
    "media_resize_stats",
    """WITH d AS (
      |  SELECT source,
      |         4 + doc_id % 13 AS w,
      |         4 + (doc_id // 13) % 11 AS h
      |  FROM documents
      |),
      |r AS (
      |  SELECT source, w, h,
      |         CASE WHEN greatest(w, h) <= 8 THEN w
      |              ELSE greatest(1, w * 8 // greatest(w, h)) END AS rw,
      |         CASE WHEN greatest(w, h) <= 8 THEN h
      |              ELSE greatest(1, h * 8 // greatest(w, h)) END AS rh,
      |         CASE WHEN greatest(w, h) > 8 THEN 1 ELSE 0 END AS ds
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
      Media.imagesFromDocuments(Tables.documents(s, d))).toDF()
    Media.resize(decoded, maxDim = 8)
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

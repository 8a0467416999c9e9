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
    Media.decodeStats(Tables.documents(s, d))
  }

  val all: Seq[NamedQuery] = Seq(decodeStats)
}

package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** S10 + F8: result serialization — the reference API's row-dict JSON
  * shaping with ISO-8601 timestamps
  * (reference: api/server.py:31-37,81-83,129-131,197-199).
  *
  * `collect()` here is the API edge, not a query operator: every
  * serialized result is the bounded output of an ORDER BY'd/LIMIT'd
  * query (≤ a few hundred rows by construction), so driver-side
  * materialization is O(result), never O(data).
  */
object Results {

  /** Render every timestamp column as an ISO-8601 string, preserving all
    * other columns and the column order. Python-`isoformat` fraction
    * rules: no fractional part when the value is second-aligned (the
    * only case the reference's second-granular `DateTime`,
    * sql/V1__create_trades_table.sql:9, ever produces — those render
    * byte-identically), a 6-digit fraction otherwise (this engine's
    * timestamps carry micros; truncating them would serialize DISTINCT
    * event times identically, breaking any consumer that keys, dedupes,
    * or re-sorts on the rendered value). Requires the engine's UTC
    * session (`spark.sql.session.timeZone=UTC`, set by all session
    * builders) for the rendered wall time to be the UTC event time. */
  def isoTimestamps(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType =>
          when(unix_micros(col(f.name)) % 1000000L === 0,
            date_format(col(f.name), "yyyy-MM-dd'T'HH:mm:ss"))
            .otherwise(
              date_format(col(f.name), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
            .as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)

  /** Rows → JSON object strings in the query's row order (the reference
    * preserves ORDER BY order through `rows_to_dicts`). Null columns are
    * emitted EXPLICITLY (`"sell_vwap": null`) like the reference's row
    * dicts — `Dataset.toJSON` would drop null fields entirely and change
    * the row shape per row. */
  def toJsonRows(df: DataFrame): Seq[String] = {
    val src = isoTimestamps(df)
    src
      .select(to_json(struct(src.columns.map(col).toIndexedSeq: _*),
        java.util.Map.of("ignoreNullFields", "false")).as("j"))
      .collect().map(_.getString(0)).toIndexedSeq
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a DataFrame builder over a scale-factor directory and
  * (when SQL-expressible) the ANSI-SQL twin the driver runs in DuckDB over
  * the same parquet tables. Spark output column names and the oracle's
  * aliases must match exactly — the driver sorts columns by name before
  * hashing values.
  */
final case class NamedQuery(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object NamedQuery {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): NamedQuery =
    NamedQuery(name, Some(oracle), run)

  /** Non-SQL-expressible operator: the driver records a weaker rows-only
    * check. */
  def rowsOnly(name: String)(
      run: (SparkSession, String) => DataFrame): NamedQuery =
    NamedQuery(name, None, run)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator-query: the Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL the driver replays
  * over the same parquet tables. Column names are aligned on both sides —
  * the driver's compare sorts columns by name before hashing. */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Common cents scaling used to keep float aggregates integer-exact and
    * therefore bitwise-reproducible across engines (see GroupedOps doc). */
  val CentsSql = "CAST(round(%s*100) AS BIGINT)"
}

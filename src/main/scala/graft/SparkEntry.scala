package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2
  * (plus the LLM-pipeline extensions); `oracleSql` carries the equivalent
  * DuckDB SQL for the driver's differential gate. Column names are aligned
  * on both sides.
  */
object SparkEntry {

  private def packs: Seq[QueryDef] =
    QueriesAgg.defs ++ QueriesWindow.defs ++ QueriesRel.defs ++
      QueriesTime.defs ++ QueriesText.defs ++ QueriesSim.defs ++
      QueriesMm.defs ++ QueriesCdc.defs ++ QueriesBehav.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueriesAgg.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}

package graft.ops

import org.apache.spark.sql.SparkSession

/** Build-parameter metadata for persisted index tables (ADVICE r14): an
  * LSH index is only probeable with the exact (bands, rows) family it was
  * built with, and appends must respect the build's hot-bucket cap — but
  * Spark's bucketed append validates only the bucket spec, so a caller
  * passing different parameters would write inconsistent postings into the
  * index SILENTLY (probes lose recall with no error). The fix is to
  * persist the parameters as table properties at build time and require a
  * match on every append/probe.
  *
  * Legacy tolerance: an index table written before this existed has no
  * properties — the first parameterized operation ADOPTS its own values
  * (warn + set) rather than failing, after which any mismatch throws. */
object IndexMeta {

  private lazy val graftLog =
    org.slf4j.LoggerFactory.getLogger(IndexMeta.getClass)

  private def propsOf(spark: SparkSession, table: String): Map[String, String] =
    spark.sessionState.catalog
      .getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      .properties

  /** Record build parameters on a freshly built index table. */
  def set(spark: SparkSession, table: String,
          params: Map[String, String]): Unit = {
    val kv = params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"'graft.$k'='$v'" }.mkString(", ")
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES ($kv)")
  }

  /** Require `params` to match the table's recorded build parameters;
    * adopt them (warn + set) if the table predates parameter recording. */
  def check(spark: SparkSession, table: String, opName: String,
            params: Map[String, String]): Unit = {
    val stored = propsOf(spark, table)
    val mismatches = params.flatMap { case (k, v) =>
      stored.get(s"graft.$k") match {
        case Some(s) if s != v => Some(s"$k: built with $s, called with $v")
        case _                 => None
      }
    }
    require(mismatches.isEmpty,
      s"$opName: parameter mismatch against $table's recorded build " +
        s"parameters — ${mismatches.mkString("; ")}. Probing or appending " +
        "with different parameters than the build silently corrupts " +
        "recall; rebuild the index or pass the recorded values.")
    val missing = params.filter { case (k, _) =>
      !stored.contains(s"graft.$k") }
    if (missing.nonEmpty) {
      graftLog.warn(s"$opName: $table has no recorded build parameters " +
        s"for ${missing.keys.mkString(", ")} (pre-metadata index) — " +
        "adopting this call's values")
      set(spark, table, missing)
    }
  }
}

package graft.queries

import graft.Tables
import graft.ops.Money
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pack H — CDC / warehouse-maintenance / pandas-parity ordinals.
  *
  * Operators a user migrating a pandas + warehouse pipeline needs that the
  * reference delegates to pandas (`SURVEY.md §2.5`): `groupby.cumcount()`
  * ordinals, change-data-capture compression into SCD-2 validity
  * intervals, time-weighted averages over irregular event timelines,
  * `value_counts(normalize=True)`, class-impurity profiling, and
  * per-column dataset profiling (the `df.info()` / data-quality pass).
  *
  * Scale notes: every query here is one partitioned window pass and/or
  * one-two hash-aggs — no self-joins, no single-partition windows over
  * fact-sized inputs (the only unpartitioned windows run over
  * aggregate outputs whose cardinality is the distinct count of a
  * low-cardinality column). All comparisons are integer-exact (cents,
  * epoch micros, ppm) until a final double division.
  */
object QueriesCdc {

  private val byUser  = Window.partitionBy("user_id").orderBy("event_id")

  /** pandas `groupby.cumcount(ascending=True/False)` — the 0-based ordinal
    * of each row within its group. One partitioned window sort carries both
    * directions (reverse = per-group count − forward − 1; the count comes
    * from an unbounded frame on the same window, so no second sort). */
  def qCumcount(spark: SparkSession, dir: String): DataFrame = {
    val n  = count(lit(1)).over(Window.partitionBy("user_id"))
    val rn = row_number().over(byUser)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        (rn - lit(1)).as("cc_fwd"), (n - rn).cast("int").as("cc_rev"))
      .orderBy("event_id")
  }

  val qCumcountOracle: String = """
    SELECT event_id, user_id,
           CAST(row_number() OVER w - 1 AS INT) AS cc_fwd,
           CAST(count(*) OVER (PARTITION BY user_id)
                - row_number() OVER w AS INT) AS cc_rev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ORDER BY event_id"""

  /** CDC change-compression → SCD-2 dimension build: collapse each user's
    * event-type timeline to state-CHANGE rows only (drop consecutive
    * duplicates, pandas `s[s != s.shift()]`), then stitch validity
    * intervals `[valid_from, valid_to)` with `lead` and flag the open
    * (current) row. Two logical windows on the SAME (user, event order)
    * sort — Spark plans one exchange + one sort; the filter between them
    * keeps the second window's input to change rows only. */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type").as("state"),
        unix_micros(col("ts")).as("us"))
    val changes = ev
      .withColumn("prev", lag("state", 1).over(byUser))
      .where(col("prev").isNull || col("prev") =!= col("state"))
    changes
      .withColumn("valid_to", lead("us", 1).over(byUser))
      .select(col("user_id"), col("state"), col("us").as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.cast("int").as("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("state"))
  }

  val qScd2Oracle: String = """
    WITH e AS (SELECT user_id, event_id, event_type AS state,
                      epoch_us(ts) AS us FROM events),
    c AS (SELECT *, lag(state) OVER (PARTITION BY user_id ORDER BY event_id) prev
          FROM e),
    ch AS (SELECT user_id, event_id, state, us FROM c
           WHERE prev IS NULL OR prev <> state),
    iv AS (SELECT user_id, state, us AS valid_from,
                  lead(us) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to
           FROM ch)
    SELECT user_id, state, valid_from, valid_to,
           CAST(valid_to IS NULL AS INT) AS is_current
    FROM iv ORDER BY user_id, valid_from, state"""

  /** Time-weighted average of `value` per user over the irregular event
    * timeline: Σ valueᵢ·Δtᵢ / Σ Δtᵢ with Δt the gap to the next event
    * (last observation carries no weight). Weights in whole seconds and
    * values in cents keep both sums exact longs (no overflow at any SF:
    * cents ≤ 2e4, Δt ≤ span in seconds); the only float op is the final
    * division. One window pass + one hash-agg. */
  def qTwa(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        Money.cents(col("value")).as("c"),
        unix_micros(col("ts")).as("us"))
      .withColumn("dt_us", lead("us", 1).over(byUser) - col("us"))
      // gaps are non-negative, so truncating `div` == floor == DuckDB `//`
      .withColumn("dt_s", expr("dt_us div 1000000L"))
    ev.where(col("dt_s").isNotNull)
      .groupBy("user_id")
      .agg(sum(col("c") * col("dt_s")).as("wsum"),
        sum("dt_s").as("tsum"),
        count(lit(1)).as("n_gaps"))
      .withColumn("twa",
        col("wsum").cast("double") / col("tsum").cast("double") / 100.0)
      .orderBy("user_id")
  }

  val qTwaOracle: String = """
    WITH e AS (SELECT user_id, event_id,
                      CAST(round(value*100) AS BIGINT) c,
                      epoch_us(ts) AS us FROM events),
    g AS (SELECT user_id, c,
                 (lead(us) OVER (PARTITION BY user_id ORDER BY event_id) - us)
                   // 1000000 AS dt_s
          FROM e)
    SELECT user_id, CAST(sum(c*dt_s) AS BIGINT) wsum,
           CAST(sum(dt_s) AS BIGINT) tsum, count(*) n_gaps,
           CAST(sum(c*dt_s) AS DOUBLE)/CAST(sum(dt_s) AS DOUBLE)/100.0 AS twa
    FROM g WHERE dt_s IS NOT NULL
    GROUP BY user_id ORDER BY user_id"""

  /** pandas `value_counts(normalize=True)`: global event-type frequency
    * table with an exact integer-ppm share (cnt·10⁶ div total — floor
    * division on both engines) and a deterministic rank. The unpartitioned
    * window runs over the AGGREGATE output (one row per distinct
    * event_type — bounded cardinality), never over the fact table. */
  def qValueCounts(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
    val rankW = Window.partitionBy()
      .orderBy(col("cnt").desc, col("event_type"))
    counts
      .withColumn("share_ppm",
        expr("cnt * 1000000L div sum(cnt) over ()"))
      .withColumn("rk", row_number().over(rankW))
      .select("rk", "event_type", "cnt", "share_ppm")
      .orderBy("rk")
  }

  val qValueCountsOracle: String = """
    WITH c AS (SELECT event_type, count(*) cnt FROM events GROUP BY 1)
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, event_type) AS INT) rk,
           event_type, cnt,
           CAST(cnt * 1000000 // (sum(cnt) OVER ()) AS BIGINT) share_ppm
    FROM c ORDER BY rk"""

  /** Class-distribution impurity per document source: Gini impurity
    * 1 − Σpᵢ² over the language mix, computed as exact integer power sums
    * ((total² − Σcntᵢ²) / total²) so both engines perform the identical
    * single IEEE division; plus the majority class and its exact-ppm
    * share. Two stacked hash-aggs (source,lang → source), map-side
    * partials all the way. */
  def qGini(spark: SparkSession, dir: String): DataFrame = {
    // rank the classes within each source on the (tiny) class-count agg;
    // rn=1 marks the majority with a deterministic lang tiebreak
    val bySrc = Window.partitionBy("source")
      .orderBy(col("cnt").desc, col("lang"))
    val byClass = Tables.documents(spark, dir)
      .groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(bySrc))
    byClass.groupBy("source")
      .agg(sum("cnt").as("n_docs"),
        count(lit(1)).as("n_classes"),
        sum(col("cnt") * col("cnt")).as("sum_sq"),
        max(when(col("rn") === 1, col("lang"))).as("majority_lang"),
        max(when(col("rn") === 1, col("cnt"))).as("top_cnt"))
      .select(col("source"), col("n_docs"), col("n_classes"),
        ((col("n_docs") * col("n_docs") - col("sum_sq")).cast("double") /
          (col("n_docs") * col("n_docs")).cast("double")).as("gini"),
        col("majority_lang"),
        expr("top_cnt * 1000000L div n_docs").as("majority_ppm"))
      .orderBy("source")
  }

  val qGiniOracle: String = """
    WITH c AS (SELECT source, lang, count(*) cnt FROM documents GROUP BY 1,2),
    r AS (SELECT *, row_number() OVER (PARTITION BY source
                      ORDER BY cnt DESC, lang) rn FROM c),
    s AS (SELECT source, sum(cnt) n_docs, count(*) n_classes,
                 sum(cnt*cnt) sum_sq,
                 max(CASE WHEN rn=1 THEN lang END) majority_lang,
                 max(CASE WHEN rn=1 THEN cnt END) top_cnt
          FROM r GROUP BY 1)
    SELECT source, CAST(n_docs AS BIGINT) n_docs, n_classes,
           CAST(n_docs*n_docs - sum_sq AS DOUBLE)
             / CAST(n_docs*n_docs AS DOUBLE) AS gini,
           majority_lang,
           CAST(top_cnt * 1000000 // n_docs AS BIGINT) AS majority_ppm
    FROM s ORDER BY source"""

  /** Per-column dataset profiling (`df.info()` + data-quality pass): one
    * scan of `documents` computes null count, distinct count, and a
    * content fingerprint (min/max of the value rendered as text) for every
    * column, then unpivots to one row per column. Spark plans the
    * multi-distinct agg as a single Expand-fed pass — still one scan, one
    * shuffle; the stack() unpivot is a projection of the 1-row aggregate. */
  def qProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_nn"),
        countDistinct(col(c)).as(s"${c}_nd"),
        min(col(c).cast("string")).as(s"${c}_min"),
        max(col(c).cast("string")).as(s"${c}_max"))
    }
    val one = docs.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols
      .map(c => s"'$c', ${c}_nn, ${c}_nd, ${c}_min, ${c}_max")
      .mkString(", ")
    one.select(col("n_rows"),
        expr(s"stack(${cols.size}, $stackArgs) as " +
          "(col_name, n_nonnull, n_distinct, min_str, max_str)"))
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_null"),
        col("n_distinct"), col("min_str"), col("max_str"))
      .orderBy("col_name")
  }

  val qProfileOracle: String = """
    WITH a AS (SELECT count(*) n_rows,
      count(doc_id) a_nn, count(DISTINCT doc_id) a_nd,
        min(CAST(doc_id AS VARCHAR)) a_min, max(CAST(doc_id AS VARCHAR)) a_max,
      count(text) b_nn, count(DISTINCT text) b_nd,
        min(text) b_min, max(text) b_max,
      count(lang) c_nn, count(DISTINCT lang) c_nd,
        min(lang) c_min, max(lang) c_max,
      count(source) d_nn, count(DISTINCT source) d_nd,
        min(source) d_min, max(source) d_max,
      count(n_chars) e_nn, count(DISTINCT n_chars) e_nd,
        min(CAST(n_chars AS VARCHAR)) e_min, max(CAST(n_chars AS VARCHAR)) e_max
      FROM documents)
    SELECT col_name, n_rows, n_rows - n_nonnull AS n_null,
           n_distinct, min_str, max_str
    FROM (
      SELECT 'doc_id' col_name, n_rows, a_nn n_nonnull, a_nd n_distinct, a_min min_str, a_max max_str FROM a
      UNION ALL
      SELECT 'text', n_rows, b_nn, b_nd, b_min, b_max FROM a
      UNION ALL
      SELECT 'lang', n_rows, c_nn, c_nd, c_min, c_max FROM a
      UNION ALL
      SELECT 'source', n_rows, d_nn, d_nd, d_min, d_max FROM a
      UNION ALL
      SELECT 'n_chars', n_rows, e_nn, e_nd, e_min, e_max FROM a)
    ORDER BY col_name"""

  /** k-anonymity audit (data-governance pass before sharing a dataset):
    * group customers by the quasi-identifier tuple (nation, market
    * segment, account-balance band), measure every equivalence class,
    * and report per class size-band how many classes/rows fall below
    * k = 5 — rows in sub-k classes are re-identifiable. Two stacked
    * aggs (QI-grain → band-grain); the share windows run over the tiny
    * band table. */
  def qKanon(spark: SparkSession, dir: String): DataFrame = {
    val k = 5L
    val classes = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        expr(s"${QueryDef.CentsSql.format("c_acctbal")} div 100000")
          .as("bal_band"))
      .agg(count(lit(1)).as("cls_size"))
    classes
      .groupBy(when(col("cls_size") < k, "sub_k")
        .when(col("cls_size") < k * 4, "small").otherwise("large")
        .as("size_band"))
      .agg(count(lit(1)).as("n_classes"),
        sum("cls_size").as("n_rows"),
        min("cls_size").as("min_size"),
        max("cls_size").as("max_size"))
      .withColumn("tot_rows", sum("n_rows").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("row_share_ppm", expr("n_rows * 1000000L div tot_rows"))
      .drop("tot_rows")
      .orderBy("size_band")
  }

  val qKanonOracle: String = """
    WITH cls AS (SELECT c_nationkey, c_mktsegment,
                        CAST(round(c_acctbal*100) AS BIGINT) // 100000 bal_band,
                        count(*) cls_size
                 FROM customer GROUP BY 1, 2, 3),
    b AS (SELECT CASE WHEN cls_size < 5 THEN 'sub_k'
                      WHEN cls_size < 20 THEN 'small'
                      ELSE 'large' END size_band,
                 count(*) n_classes,
                 CAST(sum(cls_size) AS BIGINT) n_rows,
                 min(cls_size) min_size, max(cls_size) max_size
          FROM cls GROUP BY 1)
    SELECT size_band, n_classes, n_rows, min_size, max_size,
           CAST(n_rows * 1000000 // (sum(n_rows) OVER ()) AS BIGINT) row_share_ppm
    FROM b ORDER BY size_band"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_kanon", qKanon, Some(qKanonOracle)),
    QueryDef("q_cumcount", qCumcount, Some(qCumcountOracle)),
    QueryDef("q_scd2", qScd2, Some(qScd2Oracle)),
    QueryDef("q_twa", qTwa, Some(qTwaOracle)),
    QueryDef("q_value_counts", qValueCounts, Some(qValueCountsOracle)),
    QueryDef("q_gini", qGini, Some(qGiniOracle)),
    QueryDef("q_profile", qProfile, Some(qProfileOracle)))
}

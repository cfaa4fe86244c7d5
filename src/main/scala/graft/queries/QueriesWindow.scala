package graft.queries

import graft.Tables
import graft.ops.Money
import graft.ops.WindowOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pack B — grouped length-preserving transforms (SURVEY.md §2.3):
  * cumsum/cumprod/cummin/cummax (skipna both ways), shift, ffill/bfill
  * (with limit), rank (all pandas tie methods). Running sums use integer
  * cents so the cumulative state is exact under any accumulation
  * associativity (window segment trees vs linear scans differ between
  * engines).
  */
object QueriesWindow {

  private val userKey = Seq(col("user_id"))
  private val byEvent = Seq(col("event_id"))

  /** group_cumsum, skipna true/false (`src/groupby.rs:424-536`). */
  def qCumsum(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("c", Money.cents(col("value")))
      .withColumn("c2", when(col("event_id") % 7 =!= 0, Money.cents(col("value"))))
    // No final global orderBy: the output is per-row (|output| = |input|),
    // every row is keyed by event_id, and the differential harness
    // compares order-independently. At 100M rows the presentational sort
    // measured 2.3× the query (range exchange re-executes the window
    // subtree for partitioner sampling, then sorts the full output —
    // SortTaxProbe, SCALE.md "r17: the presentational-sort tax"); a
    // 100 TB engine never globally sorts a full output for presentation.
    ev.select(col("event_id"), col("user_id"),
        (WindowOps.cumsum(col("c"), userKey, byEvent).cast("double") / 100.0).as("cs_all"),
        (WindowOps.cumsum(col("c2"), userKey, byEvent, skipna = true).cast("double") / 100.0).as("cs_skipna"),
        (WindowOps.cumsum(col("c2"), userKey, byEvent, skipna = false).cast("double") / 100.0).as("cs_noskip"))
  }

  val qCumsumOracle: String = """
    WITH e AS (SELECT event_id, user_id,
                      CAST(round(value*100) AS BIGINT) c,
                      CASE WHEN event_id % 7 <> 0 THEN CAST(round(value*100) AS BIGINT) END c2
               FROM events),
    w AS (SELECT event_id, user_id, c, c2,
                 sum(c)  OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) rs,
                 sum(c2) OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) rs2,
                 max(CASE WHEN c2 IS NULL THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) poisoned
          FROM e)
    SELECT event_id, user_id,
           CAST(rs AS DOUBLE)/100.0 AS cs_all,
           CASE WHEN c2 IS NULL THEN NULL ELSE CAST(rs2 AS DOUBLE)/100.0 END AS cs_skipna,
           CASE WHEN poisoned = 1 THEN NULL ELSE CAST(rs2 AS DOUBLE)/100.0 END AS cs_noskip
    FROM w ORDER BY event_id"""

  /** group_cumprod, skipna true/false (`src/groupby.rs:211-300`);
    * small-int multiplicands keep running products exact (≤ 5^13). */
  def qCumprod(spark: SparkSession, dir: String): DataFrame = {
    val keys = Seq(col("l_orderkey"))
    val ord  = Seq(col("l_linenumber"), col("l_quantity")) // l_linenumber alone is non-unique in the fixture; ties must share the multiplicand
    Tables.lineitem(spark, dir)
      .withColumn("m", (col("l_quantity").cast("long") % 5 + 1).cast("double"))
      .withColumn("m2", when(col("l_linenumber") =!= 3, (col("l_quantity").cast("long") % 5 + 1).cast("double")))
      .select(col("l_orderkey"), col("l_linenumber"),
        WindowOps.cumprod(col("m"), keys, ord).as("cp_all"),
        WindowOps.cumprod(col("m2"), keys, ord, skipna = true).as("cp_skipna"),
        WindowOps.cumprod(col("m2"), keys, ord, skipna = false).as("cp_noskip"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val qCumprodOracle: String = """
    WITH e AS (SELECT l_orderkey, l_linenumber, l_quantity,
                      CAST(CAST(l_quantity AS BIGINT) % 5 + 1 AS DOUBLE) m,
                      CASE WHEN l_linenumber <> 3
                           THEN CAST(CAST(l_quantity AS BIGINT) % 5 + 1 AS DOUBLE) END m2
               FROM lineitem),
    w AS (SELECT l_orderkey, l_linenumber, m, m2,
                 product(m)  OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity ROWS UNBOUNDED PRECEDING) rp,
                 product(m2) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity ROWS UNBOUNDED PRECEDING) rp2,
                 max(CASE WHEN m2 IS NULL THEN 1 ELSE 0 END)
                   OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity ROWS UNBOUNDED PRECEDING) poisoned
          FROM e)
    SELECT l_orderkey, l_linenumber, rp AS cp_all,
           CASE WHEN m2 IS NULL THEN NULL ELSE rp2 END AS cp_skipna,
           CASE WHEN poisoned = 1 THEN NULL ELSE rp2 END AS cp_noskip
    FROM w ORDER BY l_orderkey, l_linenumber"""

  /** group_cummin / group_cummax — documented intent
    * (`src/groupby.rs:2185-2294`; the reference cummax binding bug is not
    * replicated, SURVEY.md §7.4). */
  def qCumMinMax(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("v2", when(col("event_id") % 7 =!= 0, col("value")))
    ev.select(col("event_id"), col("user_id"),
        WindowOps.cummin(col("value"), userKey, byEvent).as("cmin"),
        WindowOps.cummax(col("value"), userKey, byEvent).as("cmax"),
        WindowOps.cummin(col("v2"), userKey, byEvent, skipna = false).as("cmin_noskip"),
        WindowOps.cummax(col("v2"), userKey, byEvent, skipna = true).as("cmax_skipna"))
      .orderBy("event_id")
  }

  val qCumMinMaxOracle: String = """
    WITH e AS (SELECT event_id, user_id, value,
                      CASE WHEN event_id % 7 <> 0 THEN value END v2 FROM events),
    w AS (SELECT event_id, user_id, value, v2,
                 min(value) OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) rmin,
                 max(value) OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) rmax,
                 min(v2) OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) rmin2,
                 max(v2) OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) rmax2,
                 max(CASE WHEN v2 IS NULL THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) poisoned
          FROM e)
    SELECT event_id, user_id,
           CASE WHEN value IS NULL THEN NULL ELSE rmin END AS cmin,
           CASE WHEN value IS NULL THEN NULL ELSE rmax END AS cmax,
           CASE WHEN poisoned = 1 THEN NULL ELSE rmin2 END AS cmin_noskip,
           CASE WHEN v2 IS NULL THEN NULL ELSE rmax2 END AS cmax_skipna
    FROM w ORDER BY event_id"""

  /** group_shift_indexer semantics (`src/groupby.rs:538-595`): ±periods. */
  def qShift(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"),
        WindowOps.shift(col("value"), 2, userKey, byEvent).as("lag2"),
        WindowOps.shift(col("value"), -1, userKey, byEvent).as("lead1"),
        WindowOps.shift(col("value"), 0, userKey, byEvent).as("shift0"))
      .orderBy("event_id")

  val qShiftOracle: String = """
    SELECT event_id, user_id, value,
           lag(value, 2)  OVER (PARTITION BY user_id ORDER BY event_id) AS lag2,
           lead(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS lead1,
           value AS shift0
    FROM events ORDER BY event_id"""

  /** group_fillna_indexer: ffill/bfill, with and without `limit`
    * (`src/groupby.rs:621-669`). */
  def qFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("v2", when(col("event_id") % 5 =!= 0, col("value")))
    val withF  = WindowOps.ffill(ev, "ff", col("v2"), userKey, byEvent)
    val withFl = WindowOps.ffill(withF, "ff_limit1", col("v2"), userKey, byEvent, Some(1))
    val withB  = WindowOps.bfill(withFl, "bf", col("v2"), userKey, byEvent)
    withB.select("event_id", "user_id", "v2", "ff", "ff_limit1", "bf")
      .orderBy("event_id")
  }

  val qFillOracle: String = """
    WITH e AS (SELECT event_id, user_id,
                      CASE WHEN event_id % 5 <> 0 THEN value END v2 FROM events),
    f AS (SELECT event_id, user_id, v2,
                 row_number() OVER (PARTITION BY user_id ORDER BY event_id) rn,
                 count(v2) OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) run
          FROM e),
    f2 AS (SELECT *, max(v2) OVER (PARTITION BY user_id, run) fill,
                  rn - min(rn) OVER (PARTITION BY user_id, run) dist FROM f),
    b AS (SELECT event_id, user_id, v2,
                 count(v2) OVER (PARTITION BY user_id ORDER BY event_id DESC ROWS UNBOUNDED PRECEDING) brun
          FROM e),
    b2 AS (SELECT event_id, v2, brun,
                  max(v2) OVER (PARTITION BY user_id, brun) bfillv
           FROM b),
    bf AS (SELECT event_id,
                  CASE WHEN v2 IS NOT NULL THEN v2 WHEN brun > 0 THEN bfillv END bfv
           FROM b2)
    SELECT f2.event_id, f2.user_id, f2.v2,
           CASE WHEN f2.v2 IS NOT NULL THEN f2.v2 WHEN run > 0 THEN fill END AS ff,
           CASE WHEN f2.v2 IS NOT NULL THEN f2.v2
                WHEN run > 0 AND dist <= 1 THEN fill END AS ff_limit1,
           bfv AS bf
    FROM f2 JOIN bf ON f2.event_id = bf.event_id ORDER BY f2.event_id"""

  /** group_rank — all pandas tie methods + pct + na_option (completes the
    * reference stub `src/lib.rs:1259-1274`).
    *
    * COUNTING-SORT DOMAIN PLAN (round 8 — the q_quantile device
    * generalized to ranks): every tie-based rank of a row is a function of
    * its (group, value) pair alone, so the ranks are computed ONCE on the
    * distinct (group, value) DOMAIN — one parallel hash-agg (20:1
    * contraction at sf1, 200:1 at sf10, where value domains are fixed
    * while rows replicate) plus a window over that tiny domain — and the
    * fact rows pick the ranks up through equi-joins whose strategy AQE
    * chooses from the measured domain size (broadcast in the common
    * contracted case; sort-merge when the measure is near-unique and the
    * domain approaches the fact — a hardcoded broadcast there would OOM
    * the driver at 100×). The
    * fact table is sorted exactly ONCE, for the one variant whose rank is
    * genuinely per-row ("first" = row_number): its tie-break window
    * partitions by (group, VALUE), whose cardinality is the whole domain,
    * so that sort runs at full cluster parallelism — unlike the classic
    * per-group window, whose parallelism is capped by the GROUP count
    * (~5 event types here; the sf10 plan audit measured that cap at
    * 37 s vs DuckDB's 26 s for exactly this reason). Rank identities used
    * (all integer-count arithmetic, bit-equal to the window forms):
    * min-rank = cum − cnt + 1 over the ordered domain, dense = domain
    * row_number, max = min + cnt − 1, average = min + (cnt−1)/2,
    * first = min-rank + per-tie row_number − 1, desc = n − max + 1;
    * na_option ranks come from a second domain over the nullable column
    * (nulls-last → the null bucket ranks after n_nonnull). */
  def qRank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .withColumn("v2", when(col("event_id") % 9 =!= 0, col("value")))

    // domain A: distinct (type, value), value non-null — cum counts give
    // every tie-based rank; `nv`/`na` per-type totals ride the same agg
    def domainRanks(src: DataFrame, vcol: String, nullsLast: Boolean) = {
      val ord = if (nullsLast) col(vcol).asc_nulls_last else col(vcol).asc
      val w = Window.partitionBy(col("event_type")).orderBy(ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      src.groupBy(col("event_type"), col(vcol))
        .agg(count(lit(1)).as("__cnt"))
        .withColumn("__cum", sum(col("__cnt")).over(w))
        .withColumn("__dr",
          row_number().over(Window.partitionBy(col("event_type")).orderBy(ord)))
        .withColumn("__rk", col("__cum") - col("__cnt") + 1)
    }
    val wType = Window.partitionBy(col("event_type"))
    val domA = domainRanks(ev, "value", nullsLast = false)
      // nv = non-null count (the pandas pct denominator under keep);
      // n_all = all rows — equal here (value is non-null, oracle-checked)
      // but kept distinct so the identity survives nullable inputs
      .withColumn("__nv",
        sum(when(col("value").isNotNull, col("__cnt"))).over(wType))
      .withColumn("__na", sum(col("__cnt")).over(wType))
      .select(col("event_type").as("ta"), col("value").as("va"),
        col("__rk").as("rk"), col("__cnt").as("tcnt"), col("__dr").as("dr"),
        col("__nv").as("nv"), col("__na").as("n_all"))
    val domB = domainRanks(ev, "v2", nullsLast = true)
      .select(col("event_type").as("tb"), col("v2").as("vb"),
        col("__rk").as("rk2"))

    // No broadcast() hint on the domains: for near-unique measures the
    // distinct (group, value) domain approaches |fact|, and a hardcoded
    // broadcast would OOM the driver at scale. AQE sizes the built domain
    // at runtime — BHJ when it is genuinely small (the common case, and
    // what the fixture-scale final plan shows), SMJ when it degenerates.
    val joined = ev
      .join(domA,
        col("event_type") === col("ta") && col("value") <=> col("va"))
      .join(domB,
        col("event_type") === col("tb") && col("v2") <=> col("vb"))
    // the ONE per-row rank: row_number within the (type, value) tie group,
    // ordered by event_id — partition cardinality = |domain|, so the only
    // fact-table sort in the plan is embarrassingly parallel
    val wTieBreak = Window.partitionBy(col("event_type"), col("value"))
      .orderBy(col("event_id"))
    val staged = joined.withColumn("__tb", row_number().over(wTieBreak))

    val rk = col("rk").cast("double"); val tcnt = col("tcnt").cast("double")
    staged.select(col("event_id"), col("event_type"), col("value"),
        (rk + (tcnt - 1) / 2).as("r_avg"),
        rk.as("r_min"),
        (rk + tcnt - 1).as("r_max"),
        col("dr").cast("double").as("r_dense"),
        (rk + col("__tb") - 1).cast("double").as("r_first"),
        ((rk + (tcnt - 1) / 2) / col("nv").cast("double")).as("r_pct"),
        when(col("v2").isNull, lit(null))
          .otherwise(col("rk2").cast("double")).as("r_na_keep"),
        col("rk2").cast("double").as("r_na_bottom"),
        (col("n_all").cast("double") - (rk + tcnt - 1) + 1).as("r_desc"))
    // no final global orderBy — per-row output keyed by event_id; see
    // qCumsum's note (the sort tax measured at sf100 in SortTaxProbe)
  }

  val qRankOracle: String = """
    WITH e AS (SELECT event_id, event_type, value,
                      CASE WHEN event_id % 9 <> 0 THEN value END v2 FROM events),
    w AS (SELECT event_id, event_type, value, v2,
      CAST(rank() OVER (PARTITION BY event_type ORDER BY value) AS DOUBLE) rk,
      CAST(count(*) OVER (PARTITION BY event_type, value) AS DOUBLE) tcnt,
      CAST(dense_rank() OVER (PARTITION BY event_type ORDER BY value) AS DOUBLE) dr,
      CAST(row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS DOUBLE) rfirst,
      CAST(count(value) OVER (PARTITION BY event_type) AS DOUBLE) nv,
      CAST(rank() OVER (PARTITION BY event_type ORDER BY v2 ASC NULLS LAST) AS DOUBLE) rk2,
      CAST(count(*) OVER (PARTITION BY event_type, v2) AS DOUBLE) tcnt2,
      CAST(rank() OVER (PARTITION BY event_type ORDER BY value DESC NULLS LAST) AS DOUBLE) rkd
      FROM e)
    SELECT event_id, event_type, value,
           rk + (tcnt - 1)/2 AS r_avg,
           rk AS r_min,
           rk + tcnt - 1 AS r_max,
           dr AS r_dense,
           rfirst AS r_first,
           (rk + (tcnt - 1)/2) / nv AS r_pct,
           CASE WHEN v2 IS NULL THEN NULL ELSE rk2 END AS r_na_keep,
           rk2 AS r_na_bottom,
           rkd AS r_desc
    FROM w ORDER BY event_id"""

  /** diff / pct_change — shift-derived transforms pandas users expect
    * (composition of `group_shift_indexer` + arithmetic). pct_change is a
    * ratio of integer-cents values → deterministic double. */
  def qDiffPct(spark: SparkSession, dir: String): DataFrame = {
    val c   = Money.cents(col("value"))
    val ev  = Tables.events(spark, dir).withColumn("c", c)
    val lag1 = WindowOps.shift(col("c"), 1, userKey, byEvent)
    ev.select(col("event_id"), col("user_id"),
        ((col("c") - lag1).cast("double") / 100.0).as("diff1"),
        when(lag1 =!= 0,
          (col("c") - lag1).cast("double") / lag1.cast("double")).as("pct_change"))
      .orderBy("event_id")
  }

  val qDiffPctOracle: String = """
    WITH e AS (SELECT event_id, user_id, CAST(round(value*100) AS BIGINT) c FROM events),
    w AS (SELECT event_id, user_id, c,
                 lag(c) OVER (PARTITION BY user_id ORDER BY event_id) l FROM e)
    SELECT event_id, user_id,
           CAST(c - l AS DOUBLE)/100.0 AS diff1,
           CASE WHEN l <> 0 THEN CAST(c - l AS DOUBLE)/CAST(l AS DOUBLE) END AS pct_change
    FROM w ORDER BY event_id"""

  /** Fixed-width binning (pandas `cut` with integer-edge bins) + per-bin
    * aggregation: a pure projection (codegen arithmetic, no shuffle until
    * the final tiny bin agg) — the 100 TB histogram shape. */
  def qCut(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("bin", floor((col("l_quantity") - 1) / 10).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        (sum(Money.cents(col("l_extendedprice"))).cast("double") / 100.0)
          .as("sum_price"))
      .orderBy("bin")

  val qCutOracle: String = """
    WITH c AS (SELECT CAST(floor((l_quantity - 1)/10) AS BIGINT) bin,
                      l_quantity,
                      CAST(round(l_extendedprice*100) AS BIGINT) pc
               FROM lineitem)
    SELECT bin, count(*) AS n, min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           CAST(sum(pc) AS DOUBLE)/100.0 AS sum_price
    FROM c GROUP BY bin ORDER BY bin"""

  /** Quantile binning with pandas `qcut(4)` semantics: per-group quartile
    * EDGES (exact linear-interpolation percentile), then bin by value —
    * bin i = (edge_{i−1}, edge_i], lowest bin closed on the left — so tied
    * values always land in ONE bin (ntile would split them across tiles).
    *
    * Determinism: edges are interpolated over integer cents; quartile
    * fractions of (n−1) are dyadic, so `lower + frac·(upper−lower)` is
    * FP-exact and identical in Spark and DuckDB. Scale shape (round 9):
    * the edges come from QuantileOps' counting-sort domain plan — the
    * same exact linear interpolation, but never materializing a group in
    * memory — because the exact `percentile()` aggregate buffers EVERY
    * group value per executor (the class of OOM the sf10 sweep caught in
    * q_approx_sketch; with ~5 event types over a 100 TB fact each bucket
    * would hold a fact-scale value list). The pivoted edge relation is
    * one row per group; AQE picks the join strategy. */
  def qQcut(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("c", Money.cents(col("value")))
    val edges = graft.ops.QuantileOps
      .groupedQuantiles(ev, Seq("event_type"), "c", Seq(0.25, 0.5, 0.75))
      .groupBy("event_type")
      .agg(max(when(col("q") === 0.25, col("linear"))).as("e1"),
        max(when(col("q") === 0.5, col("linear"))).as("e2"),
        max(when(col("q") === 0.75, col("linear"))).as("e3"))
    ev.join(edges, Seq("event_type"))
      .withColumn("tile",
        (lit(1L) + when(col("c") > col("e1"), 1L).otherwise(0L)
          + when(col("c") > col("e2"), 1L).otherwise(0L)
          + when(col("c") > col("e3"), 1L).otherwise(0L)))
      .groupBy("event_type", "tile")
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
      .orderBy("event_type", "tile")
  }

  val qQcutOracle: String = """
    WITH c AS (SELECT event_type, value,
                      CAST(round(value*100) AS BIGINT) c FROM events),
    e AS (SELECT event_type,
                 quantile_cont(c, 0.25) e1,
                 quantile_cont(c, 0.5)  e2,
                 quantile_cont(c, 0.75) e3
          FROM c GROUP BY event_type),
    t AS (SELECT c.event_type, value,
                 1 + CASE WHEN c > e1 THEN 1 ELSE 0 END
                   + CASE WHEN c > e2 THEN 1 ELSE 0 END
                   + CASE WHEN c > e3 THEN 1 ELSE 0 END AS tile
          FROM c JOIN e ON c.event_type = e.event_type)
    SELECT event_type, tile, count(*) AS n, min(value) AS min_v, max(value) AS max_v
    FROM t GROUP BY event_type, tile ORDER BY event_type, tile"""

  /** Rolling window aggregates (pandas `rolling(5)` with the default
    * min_periods = window): per-user 5-row sum/mean/min/max over the
    * event-id order — one shuffle + one sort, running frames streamed. */
  def qRolling(spark: SparkSession, dir: String): DataFrame = {
    val w5 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(-4, org.apache.spark.sql.expressions.Window.currentRow)
    val c    = Money.cents(col("value"))
    val cnt  = count(lit(1)).over(w5)
    val full = cnt === 5
    Tables.events(spark, dir)
      .withColumn("c", c)
      .select(col("event_id"), col("user_id"), col("value"),
        when(full, sum(col("c")).over(w5).cast("double") / 100.0).as("roll_sum"),
        when(full, (sum(col("c")).over(w5).cast("double") / 100.0) / 5.0).as("roll_mean"),
        when(full, min(col("value")).over(w5)).as("roll_min"),
        when(full, max(col("value")).over(w5)).as("roll_max"))
      .orderBy("event_id")
  }

  val qRollingOracle: String = """
    WITH e AS (SELECT event_id, user_id, value,
                      CAST(round(value*100) AS BIGINT) c FROM events),
    w AS (SELECT event_id, user_id, value,
                 sum(c)   OVER win rs,
                 min(value) OVER win rmin,
                 max(value) OVER win rmax,
                 count(*) OVER win cnt
          FROM e
          WINDOW win AS (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, value,
           CASE WHEN cnt = 5 THEN CAST(rs AS DOUBLE)/100.0 END AS roll_sum,
           CASE WHEN cnt = 5 THEN CAST(rs AS DOUBLE)/100.0/5.0 END AS roll_mean,
           CASE WHEN cnt = 5 THEN rmin END AS roll_min,
           CASE WHEN cnt = 5 THEN rmax END AS roll_max
    FROM w ORDER BY event_id"""

  /** Linear interpolation of interior missing values (pandas
    * `interpolate(method='linear')`), completing the fill family
    * (ffill/bfill in q_fill). Every 7th event's value is masked out
    * deterministically, then reconstructed per user from the nearest
    * non-null neighbors over the event-id order; leading/trailing gaps
    * stay null (no extrapolation). Exact-parity arithmetic: neighbors are
    * integer cents and both engines evaluate the identical
    * `py + (ny−py)·((x−px)/(nx−px))` double expression, then one final
    * /100 — bit-equal results. */
  def qInterp(spark: SparkSession, dir: String): DataFrame = {
    val masked = Tables.events(spark, dir)
      .withColumn("c", when(col("event_id") % 7 =!= 0,
        Money.cents(col("value"))))
    graft.ops.WindowOps
      .interpolateLinear(masked, "ci", col("c"), Seq(col("user_id")), Seq(col("event_id")))
      .select(col("event_id"), col("user_id"),
        (col("c").cast("double") / 100.0).as("value_masked"),
        (col("ci") / 100.0).as("value_interp"))
      .orderBy("event_id")
  }

  val qInterpOracle: String = """
    WITH e AS (SELECT event_id, user_id,
                      CASE WHEN event_id % 7 <> 0
                           THEN CAST(round(value*100) AS BIGINT) END c
               FROM events),
    x AS (SELECT event_id, user_id, c,
                 row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS x,
                 CASE WHEN c IS NOT NULL THEN
                   row_number() OVER (PARTITION BY user_id ORDER BY event_id)
                 END AS xm
          FROM e),
    r AS (SELECT event_id, user_id, c, x,
                 last_value(xm IGNORE NULLS) OVER wp AS px,
                 last_value(c  IGNORE NULLS) OVER wp AS py,
                 first_value(xm IGNORE NULLS) OVER wn AS nx,
                 first_value(c  IGNORE NULLS) OVER wn AS ny
          FROM x
          WINDOW wp AS (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 wn AS (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
    SELECT event_id, user_id,
           CAST(c AS DOUBLE)/100.0 AS value_masked,
           CASE WHEN c IS NOT NULL THEN CAST(c AS DOUBLE)/100.0
                WHEN px IS NOT NULL AND nx IS NOT NULL
                THEN (py + (ny - py) * ((x - px) / (nx - px)))/100.0
           END AS value_interp
    FROM r ORDER BY event_id"""

  /** Rolling median (pandas `rolling(5).median()` / `rolling(4).median()`)
    * per user over the event-id order — the order-statistic companion to
    * q_rolling's sum/mean/min/max, which no built-in frame aggregate
    * covers. The frame is materialized as a sorted constant-width array
    * (`array_sort(collect_list)` over the running frame): O(w log w) per
    * row with w fixed at 5, so state stays constant-size at any data
    * scale — this is NOT the unbounded-group collect anti-pattern. The
    * 5-row median is the middle element (exact int cents); the 4-row
    * median averages the two middle values ((a+b)/2 on ints ≤ 2^52 is
    * exact in binary, matching DuckDB's windowed `median`). Partial
    * frames are nulled out (min_periods = window), mirroring q_rolling. */
  def qRollMedian(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w5 = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(-4, Window.currentRow)
    val w4 = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    val s5 = array_sort(collect_list(col("c")).over(w5))
    val s4 = array_sort(collect_list(col("c")).over(w4))
    Tables.events(spark, dir)
      .withColumn("c", Money.cents(col("value")))
      .select(col("event_id"), col("user_id"),
        when(count(lit(1)).over(w5) === 5,
          element_at(s5, 3).cast("double") / 100.0).as("med5"),
        when(count(lit(1)).over(w4) === 4,
          (element_at(s4, 2) + element_at(s4, 3)).cast("double") / 2.0 / 100.0)
          .as("med4"))
      .orderBy("event_id")
  }

  val qRollMedianOracle: String = """
    WITH e AS (SELECT event_id, user_id,
                      CAST(round(value*100) AS BIGINT) c FROM events),
    w AS (SELECT event_id, user_id,
                 median(c) OVER w5 m5, count(*) OVER w5 n5,
                 median(c) OVER w4 m4, count(*) OVER w4 n4
          FROM e
          WINDOW w5 AS (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
                 w4 AS (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id,
           CASE WHEN n5 = 5 THEN CAST(m5 AS DOUBLE)/100.0 END AS med5,
           CASE WHEN n4 = 4 THEN CAST(m4 AS DOUBLE)/100.0 END AS med4
    FROM w ORDER BY event_id"""

  /** Rolling lag-1 autocorrelation (pandas
    * `rolling(5).corr(series.shift(1))`) per user: the sample correlation
    * of (value, previous value) over the trailing 5-row frame — the
    * change-point / trend-shift signal of monitoring pipelines. All five
    * power sums (Σx, Σy, Σx², Σy², Σxy) accumulate as exact integer
    * cents, so the only float work is the final textual formula
    * `(nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²))` — identical in both
    * engines, bit-exact. Windows with any missing lag (first row of a
    * user) or zero variance yield null. One shuffle + one sort; the power
    * sums stream over running frames. */
  def qRollCorr(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wu = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val w5 = wu.rowsBetween(-4, Window.currentRow)
    val x = Money.cents(col("value"))
    val e = Tables.events(spark, dir)
      .withColumn("x", x).withColumn("y", lag(col("x"), 1).over(wu))
    val cy  = count(col("y")).over(w5)
    val sx  = sum(col("x")).over(w5); val sy = sum(col("y")).over(w5)
    val sxx = sum(col("x") * col("x")).over(w5)
    val syy = sum(col("y") * col("y")).over(w5)
    val sxy = sum(col("x") * col("y")).over(w5)
    val vx = lit(5) * sxx - sx * sx
    val vy = lit(5) * syy - sy * sy
    e.select(col("event_id"), col("user_id"),
        when(cy === 5 && vx > 0 && vy > 0,
          (lit(5) * sxy - sx * sy).cast("double") /
            (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
          .as("roll_corr"))
      .orderBy("event_id")
  }

  val qRollCorrOracle: String = """
    WITH e AS (SELECT event_id, user_id,
                      CAST(round(value*100) AS BIGINT) x FROM events),
    l AS (SELECT event_id, user_id, x,
                 lag(x) OVER (PARTITION BY user_id ORDER BY event_id) y FROM e),
    w AS (SELECT event_id, user_id, count(y) OVER win cy,
                 sum(x) OVER win sx, sum(y) OVER win sy,
                 sum(x*x) OVER win sxx, sum(y*y) OVER win syy,
                 sum(x*y) OVER win sxy
          FROM l
          WINDOW win AS (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id,
           CASE WHEN cy = 5 AND (5*sxx - sx*sx) > 0 AND (5*syy - sy*sy) > 0
                THEN CAST(5*sxy - sx*sy AS DOUBLE) /
                     (sqrt(CAST(5*sxx - sx*sx AS DOUBLE)) *
                      sqrt(CAST(5*syy - sy*sy AS DOUBLE)))
           END AS roll_corr
    FROM w ORDER BY event_id"""

  /** Windowed EWMA (pandas `ewm(adjust=True)` numerator/denominator shape,
    * bounded to the trailing 10 observations) per user over event time.
    * α = 1/2 is chosen deliberately: every weight (1−α)^k = 2^−k is an
    * exact power of two, so each weighted term is an exact multiple of
    * 2^−9·cent (16-bit cents + 9 shifted bits ≪ 53-bit mantissa) and the
    * numerator/denominator sums are bit-identical in any engine under any
    * accumulation order — the same determinism trick as the integer-cents
    * running sums, extended to fractional weights. */
  def qEwma(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("c", Money.cents(col("value")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
    def weight(k: Int): Double = math.pow(0.5, k) // exact 2^-k
    val terms = (1 until 10).map { k =>
      val lv = lag(col("c"), k).over(w)
      (when(lv.isNotNull, lv.cast("double") * lit(weight(k))).otherwise(lit(0.0)),
        when(lv.isNotNull, lit(weight(k))).otherwise(lit(0.0)))
    }
    val num = (col("c").cast("double") +: terms.map(_._1)).reduce(_ + _)
    val den = (lit(1.0) +: terms.map(_._2)).reduce(_ + _)
    ev.select(col("event_id"), col("user_id"),
        ((num / den) / lit(100.0)).as("ewma"))
      .orderBy("event_id")
  }

  val qEwmaOracle: String = {
    def weight(k: Int): String =
      java.math.BigDecimal.valueOf(math.pow(0.5, k)).toPlainString
    val lags = (1 until 10).map(k => s"lag(c, $k) OVER w l$k").mkString(",\n                 ")
    val num = ("CAST(c AS DOUBLE)" +: (1 until 10).map(k =>
      s"CASE WHEN l$k IS NOT NULL THEN CAST(l$k AS DOUBLE) * ${weight(k)} ELSE 0.0 END"))
      .mkString(" + ")
    val den = ("1.0" +: (1 until 10).map(k =>
      s"CASE WHEN l$k IS NOT NULL THEN ${weight(k)} ELSE 0.0 END"))
      .mkString(" + ")
    s"""
    WITH e AS (SELECT event_id, user_id, CAST(round(value*100) AS BIGINT) c
               FROM events),
    l AS (SELECT event_id, user_id, c,
                 $lags
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
    SELECT event_id, user_id, (($num) / ($den)) / 100.0 AS ewma
    FROM l ORDER BY event_id"""
  }

  /** Percentile-rank normalization per group (sklearn QuantileTransformer
    * shape / pandas rank(pct=True) on the ECDF side): percent_rank
    * ((rank−1)/(n−1)) and cume_dist per event_type over exact cents. Both
    * are single-pass window functions over one sort; ties share a value
    * so the output is deterministic without a tiebreaker, and the closed-
    * form rational division on identical integer operands is bit-equal
    * across engines. */
  def qPctRank(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("c"))
    Tables.events(spark, dir)
      .withColumn("c", Money.cents(col("value")))
      .select(col("event_id"), col("event_type"), col("c"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("event_id")
  }

  val qPctRankOracle: String = """
    WITH e AS (SELECT event_id, event_type,
                      CAST(round(value*100) AS BIGINT) AS c FROM events)
    SELECT event_id, event_type, c,
           percent_rank() OVER (PARTITION BY event_type ORDER BY c) AS pr,
           cume_dist()    OVER (PARTITION BY event_type ORDER BY c) AS cd
    FROM e ORDER BY event_id"""

  /** Expanding (cumulative) statistics per user — pandas `.expanding()
    * .mean()/.std()` etc: ONE partitioned window sort feeds all five
    * outputs (prefix count / sum / sum-of-squares / min / max share the
    * frame). The sample variance comes from the exact integer identity
    * `n*S2 - S1^2` — cents and cents² prefix sums stay in bigint range
    * (≤1e18 at sf0.1-per-user cardinality), so both engines divide the
    * same exact integers and the doubles are bit-equal. */
  def qExpanding(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .withColumn("c", Money.cents(col("value")))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", sum(col("c")).over(w))
      .withColumn("s2", sum(col("c") * col("c")).over(w))
      .select(col("event_id"), col("user_id"), col("n").as("exp_n"),
        (col("s1").cast("double") / col("n").cast("double") / 100.0).as("exp_mean"),
        (min(col("c")).over(w).cast("double") / 100.0).as("exp_min"),
        (max(col("c")).over(w).cast("double") / 100.0).as("exp_max"),
        when(col("n") < 2, lit(null).cast("double")).otherwise(
          sqrt((col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
            (col("n") * (col("n") - 1)).cast("double")) / 100.0).as("exp_std"))
      .orderBy("event_id")
  }

  val qExpandingOracle: String = """
    WITH e AS (SELECT event_id, user_id,
                      CAST(round(value*100) AS BIGINT) AS c FROM events),
    p AS (SELECT event_id, user_id, c,
                 CAST(count(*) OVER w AS BIGINT) AS n,
                 CAST(sum(c)   OVER w AS BIGINT) AS s1,
                 CAST(sum(c*c) OVER w AS BIGINT) AS s2,
                 CAST(min(c)   OVER w AS BIGINT) AS mn,
                 CAST(max(c)   OVER w AS BIGINT) AS mx
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                              ROWS UNBOUNDED PRECEDING))
    SELECT event_id, user_id, n AS exp_n,
           CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE)/100.0 AS exp_mean,
           CAST(mn AS DOUBLE)/100.0 AS exp_min,
           CAST(mx AS DOUBLE)/100.0 AS exp_max,
           CASE WHEN n < 2 THEN NULL ELSE
             sqrt(CAST(n*s2 - s1*s1 AS DOUBLE)/CAST(n*(n-1) AS DOUBLE))/100.0
           END AS exp_std
    FROM p ORDER BY event_id"""

  /** Per-brand Pareto skyline: parts not dominated on (retailprice ↓,
    * size ↑) by any same-brand part. Dominance is resolved with two RANGE
    * frames over ONE price-ordered window pass — `m1` = best size among
    * strictly-cheaper parts (RANGE … 1 PRECEDING), `m2` = best size among
    * price-peers-or-cheaper (RANGE … CURRENT ROW, peers included) — so the
    * skyline needs no self-join and no all-pairs compare. Partitioned by
    * brand; the unpartitioned variant at scale is the classic
    * skyline-of-skylines merge (per-partition skyline, then skyline of the
    * union), which this per-group form is the building block of. */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_brand")).orderBy(col("price_c"))
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wPeer = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_brand")).orderBy(col("price_c"))
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.part(spark, dir)
      .withColumn("price_c", Money.cents(col("p_retailprice")))
      .withColumn("m1", max(col("p_size")).over(wPrev))
      .withColumn("m2", max(col("p_size")).over(wPeer))
      .where(!(coalesce(col("m1") >= col("p_size"), lit(false)) ||
        col("m2") > col("p_size")))
      .select(col("p_brand"), col("p_partkey"), col("p_size").cast("long").as("p_size"),
        (col("price_c").cast("double") / 100.0).as("price"))
      .orderBy("p_brand", "p_partkey")
  }

  val qSkylineOracle: String = """
    WITH c AS (SELECT p_brand, p_partkey, p_size,
                      CAST(round(p_retailprice*100) AS BIGINT) AS price_c
               FROM part),
    m AS (SELECT p_brand, p_partkey, p_size, price_c,
                 max(p_size) OVER (PARTITION BY p_brand ORDER BY price_c
                                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1,
                 max(p_size) OVER (PARTITION BY p_brand ORDER BY price_c
                                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m2
          FROM c)
    SELECT p_brand, p_partkey, CAST(p_size AS BIGINT) AS p_size,
           CAST(price_c AS DOUBLE)/100.0 AS price
    FROM m
    WHERE NOT (COALESCE(m1 >= p_size, false) OR m2 > p_size)
    ORDER BY p_brand, p_partkey"""

  /** Rolling p25/p75/IQR over a 5-row frame (pandas
    * rolling(5, min_periods=5).quantile(.25/.75)): at n=5 the quantile
    * positions q·(n−1) are the integers 1 and 3, so both engines read
    * EXACT sorted-frame elements — no interpolation arithmetic to
    * ulp-diverge. Same sorted-constant-frame-array device as
    * q_roll_median; one partitioned window sort carries all three
    * outputs. */
  def qRollQuantile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w5 = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(-4, Window.currentRow)
    val s5 = array_sort(collect_list(col("c")).over(w5))
    val full = count(lit(1)).over(w5) === 5
    Tables.events(spark, dir)
      .withColumn("c", Money.cents(col("value")))
      .select(col("event_id"), col("user_id"),
        when(full, element_at(s5, 2).cast("double") / 100.0).as("p25"),
        when(full, element_at(s5, 4).cast("double") / 100.0).as("p75"),
        when(full, (element_at(s5, 4) - element_at(s5, 2)).cast("double") / 100.0)
          .as("iqr"))
      .orderBy("event_id")
  }

  val qRollQuantileOracle: String = """
    WITH e AS (SELECT event_id, user_id,
                      CAST(round(value*100) AS BIGINT) c FROM events),
    w AS (SELECT event_id, user_id,
                 list_sort(list(c) OVER w5) s5, count(*) OVER w5 n5
          FROM e
          WINDOW w5 AS (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id,
           CASE WHEN n5 = 5 THEN CAST(s5[2] AS DOUBLE)/100.0 END AS p25,
           CASE WHEN n5 = 5 THEN CAST(s5[4] AS DOUBLE)/100.0 END AS p75,
           CASE WHEN n5 = 5 THEN CAST(s5[4] - s5[2] AS DOUBLE)/100.0 END AS iqr
    FROM w ORDER BY event_id"""

  /** Rolling skewness + excess kurtosis (pandas `rolling(5).skew()/.kurt()`
    * bias-corrected formulas) from EXACT integer power sums over the
    * 5-row frame. Values quantize to tenths (|x| ≤ 6e3 here) so even the
    * 4th raw power sum stays far inside a long: the central-moment
    * numerators A2 = n·S2 − S1², A3 = n²·S3 − 3n·S2·S1 + 2·S1³,
    * A4 = n³·S4 − 4n²·S3·S1 + 6n·S2·S1² − 3·S1⁴ are integer-exact, and
    * for n = 5 the pandas formulas collapse to
    *   skew = √20/3 · A3 / (A2·√A2),   kurt = 4·A4/A2² − 8,
    * leaving one identically-shaped float expression per engine (√ not
    * pow — pow differs by 1 ulp between JVM and libm). One partitioned
    * window sort carries all four sums. */
  def qRollMoments(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wu = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val w5 = wu.rowsBetween(-4, Window.currentRow)
    val e = Tables.events(spark, dir)
      .withColumn("x", Money.scaled(col("value"), 10))
    val cnt = count(col("x")).over(w5)
    val s1 = sum(col("x")).over(w5)
    val s2 = sum(col("x") * col("x")).over(w5)
    val s3 = sum(col("x") * col("x") * col("x")).over(w5)
    val s4 = sum(col("x") * col("x") * col("x") * col("x")).over(w5)
    val a2 = lit(5L) * s2 - s1 * s1
    val a3 = lit(25L) * s3 - lit(15L) * s2 * s1 + lit(2L) * s1 * s1 * s1
    val a4 = lit(125L) * s4 - lit(100L) * s3 * s1 +
      lit(30L) * s2 * s1 * s1 - lit(3L) * s1 * s1 * s1 * s1
    val a2d = a2.cast("double")
    e.select(col("event_id"), col("user_id"),
        when(cnt === 5 && a2 > 0,
          a3.cast("double") * sqrt(lit(20.0)) /
            (lit(3.0) * a2d * sqrt(a2d))).as("roll_skew"),
        when(cnt === 5 && a2 > 0,
          lit(4.0) * a4.cast("double") / (a2d * a2d) - lit(8.0))
          .as("roll_kurt"))
      .orderBy("event_id")
  }

  val qRollMomentsOracle: String = """
    WITH e AS (SELECT event_id, user_id,
                      CAST(round(value*10) AS BIGINT) x FROM events),
    w AS (SELECT event_id, user_id, count(x) OVER win cnt,
                 CAST(sum(x) OVER win AS BIGINT) s1,
                 CAST(sum(x*x) OVER win AS BIGINT) s2,
                 CAST(sum(x*x*x) OVER win AS BIGINT) s3,
                 CAST(sum(x*x*x*x) OVER win AS BIGINT) s4
          FROM e
          WINDOW win AS (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
    m AS (SELECT event_id, user_id, cnt,
                 5*s2 - s1*s1 AS a2,
                 25*s3 - 15*s2*s1 + 2*s1*s1*s1 AS a3,
                 125*s4 - 100*s3*s1 + 30*s2*s1*s1 - 3*s1*s1*s1*s1 AS a4
          FROM w)
    SELECT event_id, user_id,
           CASE WHEN cnt = 5 AND a2 > 0 THEN
             CAST(a3 AS DOUBLE) * sqrt(20.0) /
               (3.0 * CAST(a2 AS DOUBLE) * sqrt(CAST(a2 AS DOUBLE)))
           END AS roll_skew,
           CASE WHEN cnt = 5 AND a2 > 0 THEN
             4.0 * CAST(a4 AS DOUBLE) /
               (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)) - 8.0
           END AS roll_kurt
    FROM m ORDER BY event_id"""

  /** Autocorrelation function at lags 1–3 per user (pandas
    * `Series.autocorr(lag=k)` / statsmodels acf over each user's value
    * series): Pearson correlation between the series and its k-shifted
    * self over the pairwise-complete overlap. ONE window sort yields all
    * three lag columns; one hash-agg accumulates the exact integer power
    * sums (n, Σx, Σy, Σx², Σy², Σxy per lag); the only doubles are the
    * three final correlation expressions (√ via sqrt, never pow). */
  def qAcf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wu = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val e = Tables.events(spark, dir)
      .withColumn("x", Money.cents(col("value")))
    val withLags = e.select(Seq(col("user_id"), col("x")) ++
      (1 to 3).map(k => lag(col("x"), k).over(wu).as(s"y$k")): _*)
    def corrAgg(k: Int): Seq[Column] = {
      val y = col(s"y$k"); val x = col("x")
      Seq(count(y).as(s"n$k"),
        sum(when(y.isNotNull, x)).as(s"sx$k"), sum(y).as(s"sy$k"),
        sum(when(y.isNotNull, x * x)).as(s"sxx$k"),
        sum(y * y).as(s"syy$k"), sum(x * y).as(s"sxy$k"))
    }
    def corrOf(k: Int): Column = {
      val (n, sx, sy, sxx, syy, sxy) =
        (col(s"n$k"), col(s"sx$k"), col(s"sy$k"),
          col(s"sxx$k"), col(s"syy$k"), col(s"sxy$k"))
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      when(n >= 2 && vx > 0 && vy > 0,
        (n * sxy - sx * sy).cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
    }
    withLags.groupBy("user_id")
      .agg(corrAgg(1).head, (corrAgg(1).tail ++ corrAgg(2) ++ corrAgg(3)): _*)
      .select(col("user_id"), col("n1"),
        corrOf(1).as("acf1"), corrOf(2).as("acf2"), corrOf(3).as("acf3"))
      .orderBy("user_id")
  }

  val qAcfOracle: String = """
    WITH e AS (SELECT user_id, event_id,
                      CAST(round(value*100) AS BIGINT) x FROM events),
    l AS (SELECT user_id, x,
                 lag(x, 1) OVER w y1, lag(x, 2) OVER w y2, lag(x, 3) OVER w y3
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
    a AS (SELECT user_id,
        count(y1) n1, CAST(sum(CASE WHEN y1 IS NOT NULL THEN x END) AS BIGINT) sx1,
        CAST(sum(y1) AS BIGINT) sy1,
        CAST(sum(CASE WHEN y1 IS NOT NULL THEN x*x END) AS BIGINT) sxx1,
        CAST(sum(y1*y1) AS BIGINT) syy1, CAST(sum(x*y1) AS BIGINT) sxy1,
        count(y2) n2, CAST(sum(CASE WHEN y2 IS NOT NULL THEN x END) AS BIGINT) sx2,
        CAST(sum(y2) AS BIGINT) sy2,
        CAST(sum(CASE WHEN y2 IS NOT NULL THEN x*x END) AS BIGINT) sxx2,
        CAST(sum(y2*y2) AS BIGINT) syy2, CAST(sum(x*y2) AS BIGINT) sxy2,
        count(y3) n3, CAST(sum(CASE WHEN y3 IS NOT NULL THEN x END) AS BIGINT) sx3,
        CAST(sum(y3) AS BIGINT) sy3,
        CAST(sum(CASE WHEN y3 IS NOT NULL THEN x*x END) AS BIGINT) sxx3,
        CAST(sum(y3*y3) AS BIGINT) syy3, CAST(sum(x*y3) AS BIGINT) sxy3
      FROM l GROUP BY user_id)
    SELECT user_id, n1,
      CASE WHEN n1 >= 2 AND (n1*sxx1 - sx1*sx1) > 0 AND (n1*syy1 - sy1*sy1) > 0
           THEN CAST(n1*sxy1 - sx1*sy1 AS DOUBLE) /
                (sqrt(CAST(n1*sxx1 - sx1*sx1 AS DOUBLE)) *
                 sqrt(CAST(n1*syy1 - sy1*sy1 AS DOUBLE))) END acf1,
      CASE WHEN n2 >= 2 AND (n2*sxx2 - sx2*sx2) > 0 AND (n2*syy2 - sy2*sy2) > 0
           THEN CAST(n2*sxy2 - sx2*sy2 AS DOUBLE) /
                (sqrt(CAST(n2*sxx2 - sx2*sx2 AS DOUBLE)) *
                 sqrt(CAST(n2*syy2 - sy2*sy2 AS DOUBLE))) END acf2,
      CASE WHEN n3 >= 2 AND (n3*sxx3 - sx3*sx3) > 0 AND (n3*syy3 - sy3*sy3) > 0
           THEN CAST(n3*sxy3 - sx3*sy3 AS DOUBLE) /
                (sqrt(CAST(n3*sxx3 - sx3*sx3 AS DOUBLE)) *
                 sqrt(CAST(n3*syy3 - sy3*sy3 AS DOUBLE))) END acf3
    FROM a ORDER BY user_id"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_cumsum", qCumsum, Some(qCumsumOracle)),
    QueryDef("q_roll_moments", qRollMoments, Some(qRollMomentsOracle)),
    QueryDef("q_acf", qAcf, Some(qAcfOracle)),
    QueryDef("q_diff_pct", qDiffPct, Some(qDiffPctOracle)),
    QueryDef("q_cumprod", qCumprod, Some(qCumprodOracle)),
    QueryDef("q_cum_minmax", qCumMinMax, Some(qCumMinMaxOracle)),
    QueryDef("q_shift", qShift, Some(qShiftOracle)),
    QueryDef("q_fill", qFill, Some(qFillOracle)),
    QueryDef("q_rank", qRank, Some(qRankOracle)),
    QueryDef("q_cut", qCut, Some(qCutOracle)),
    QueryDef("q_qcut", qQcut, Some(qQcutOracle)),
    QueryDef("q_rolling", qRolling, Some(qRollingOracle)),
    QueryDef("q_roll_median", qRollMedian, Some(qRollMedianOracle)),
    QueryDef("q_interp", qInterp, Some(qInterpOracle)),
    QueryDef("q_roll_corr", qRollCorr, Some(qRollCorrOracle)),
    QueryDef("q_ewma", qEwma, Some(qEwmaOracle)),
    QueryDef("q_pct_rank", qPctRank, Some(qPctRankOracle)),
    QueryDef("q_expanding", qExpanding, Some(qExpandingOracle)),
    QueryDef("q_skyline", qSkyline, Some(qSkylineOracle)),
    QueryDef("q_roll_quantile", qRollQuantile, Some(qRollQuantileOracle)))
}

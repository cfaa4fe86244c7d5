package graft.queries

import graft.Tables
import graft.ops.Money
import graft.ops.Phase._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pack I — behavioral / product-analytics operators over the events and
  * orders tables: RFM segmentation, activity-streak mining
  * (gaps-and-islands), event-transition matrices (first-order Markov),
  * group-mean imputation, and 2-D histograms. All are one-or-two
  * partitioned passes; shares and probabilities are exact integer ppm so
  * the DuckDB oracles hash-match bit-for-bit.
  */
object QueriesBehav {

  /** Multi-touch attribution: every purchase credits the view/click
    * touches of the same user in the 24 h before it — last-touch (full
    * credit to the latest touch, event_id tiebreak) and linear (each of a
    * purchase's n touches gets ⌊1e6/n⌋ ppm, exact integer arithmetic so
    * both engines hash-match) — rolled up per touch channel.
    *
    * Scale shape: the touch↔purchase match is a USER-keyed equi-join with
    * the 24 h predicate as a residual filter — co-partitioned by user, the
    * natural key both sides already cluster on; per-user event counts are
    * bounded (sessions, not the corpus), so the join never goes
    * quadratic in the fact. The per-purchase window (count + latest-touch
    * row_number) is partitioned by purchase id — millions of independent
    * partitions. */
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        unix_micros(col("ts")).as("pus"))
    val t = ev.where(col("event_type").isin("view", "click"))
      .select(col("event_id").as("tid"), col("user_id"),
        col("event_type").as("channel"), unix_micros(col("ts")).as("tus"))
    val j = p.join(t, Seq("user_id"))
      .where(col("tus") >= col("pus") - lit(86400000000L) &&
        col("tus") < col("pus"))
    val w = Window.partitionBy(col("pid"))
    val wOrd = w.orderBy(col("tus").desc, col("tid").desc)
    j.withColumn("n", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(wOrd))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("last_touch_credits"),
        sum(expr("1000000L div n")).as("linear_credit_ppm"))
      .orderBy("channel")
  }

  val qAttributionOracle: String = """
    WITH p AS (SELECT event_id pid, user_id, epoch_us(ts) pus
               FROM events WHERE event_type = 'purchase'),
    t AS (SELECT event_id tid, user_id, event_type channel, epoch_us(ts) tus
          FROM events WHERE event_type IN ('view', 'click')),
    j AS (SELECT pid, tid, channel, tus FROM p JOIN t USING (user_id)
          WHERE tus >= pus - 86400000000 AND tus < pus),
    w AS (SELECT channel,
                 count(*) OVER (PARTITION BY pid) n,
                 row_number() OVER (PARTITION BY pid
                                    ORDER BY tus DESC, tid DESC) rn
          FROM j)
    SELECT channel, count(*) AS n_touches,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS last_touch_credits,
           CAST(sum(1000000 // n) AS BIGINT) AS linear_credit_ppm
    FROM w GROUP BY channel ORDER BY channel"""

  /** RFM segmentation (recency / frequency / monetary quintiles): one
    * order-grain agg per customer, then three quintile assignments
    * composed into the classic 3-digit RFM score and rolled up to
    * score-level counts.
    *
    * Quintile semantics (round 10): the counting-sort rank-edge cut
    * ([[graft.ops.QuantileOps.rankEdges]]) per measure, NOT `ntile(5)` —
    * three unpartitioned ntile windows each funnel the whole customer
    * relation through one task's sort, the scale-killer plan class the
    * r9 verdict flags. Each measure's value DOMAIN is bounded by its
    * resolution, not the customer count: rec_days (days since anchor,
    * thousands), freq (orders per customer, tens), and monetary rounded
    * to whole dollars (`mon_c div 100`, bounded by the price range) — so
    * the only serial step is O(domain), constant in data size. Tied
    * customers share a quintile (no doc_id tiebreak splitting equal
    * values across tiles); directions preserved: recency smaller =
    * better = quintile 5, freq/monetary bigger = better = quintile 5. */
  def qRfm(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.QuantileOps.{ascBin, rankEdges}
    val anchor = to_date(lit("2002-01-01"))
    val perCust = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(datediff(anchor, max(to_date(col("o_orderdate")))).as("rec_days"),
        count(lit(1)).as("freq"),
        sum(Money.cents(col("o_totalprice"))).as("mon_c"))
      .withColumn("mon_d", expr("mon_c div 100"))
      // four consumers (three edge computations + binning) → phase-cut:
      // one orders scan + agg, not four
      .phaseCut
    val re = rankEdges(perCust, "rec_days", 5, "re")
    val fe = rankEdges(perCust, "freq", 5, "fe")
    val me = rankEdges(perCust, "mon_d", 5, "me")
    val r = lit(6) - ascBin(col("rec_days"), 5, "re")
    val f = ascBin(col("freq"), 5, "fe")
    val m = ascBin(col("mon_d"), 5, "me")
    perCust
      .crossJoin(broadcast(re)).crossJoin(broadcast(fe))
      .crossJoin(broadcast(me))
      .select(col("o_custkey"), (r * 100 + f * 10 + m).as("rfm_score"))
      .groupBy("rfm_score")
      .agg(count(lit(1)).as("n_cust"), min("o_custkey").as("min_cust"))
      .orderBy("rfm_score")
  }

  val qRfmOracle: String = {
    import graft.ops.QuantileOps.{ascBinSql, rankEdgesSql}
    s"""
    WITH pc AS (SELECT o_custkey,
                       datediff('day', max(CAST(o_orderdate AS DATE)),
                                DATE '2002-01-01') rec_days,
                       count(*) freq,
                       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) mon_c,
                       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) // 100 mon_d
                FROM orders GROUP BY 1),
    ${rankEdgesSql("pc", "rec_days", 5, "re")},
    ${rankEdgesSql("pc", "freq", 5, "fe")},
    ${rankEdgesSql("pc", "mon_d", 5, "me")},
    t AS (SELECT o_custkey,
                 6 - ${ascBinSql("rec_days", 5, "re")} r,
                 ${ascBinSql("freq", 5, "fe")} f,
                 ${ascBinSql("mon_d", 5, "me")} m
          FROM pc, ree, fee, mee)
    SELECT CAST(r*100 + f*10 + m AS INT) AS rfm_score, count(*) n_cust,
           min(o_custkey) min_cust
    FROM t GROUP BY 1 ORDER BY 1"""
  }

  /** Gaps-and-islands: consecutive-active-day streaks per user. Distinct
    * (user, day) pairs once; the island id is the classic
    * `day − row_number()` constant-per-streak trick (one partitioned
    * window sort), then two stacked aggs give per-streak lengths and
    * per-user streak stats. No self-joins, no spine table. */
  def qGapIslands(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
    val days = Tables.events(spark, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
          .cast("long").as("day"))
      .distinct()
    val streaks = days
      .withColumn("isl", col("day") - row_number().over(w))
      .groupBy("user_id", "isl")
      .agg(count(lit(1)).as("len"), min("day").as("start_day"))
    streaks.groupBy("user_id")
      .agg(count(lit(1)).as("n_streaks"),
        max("len").as("longest"),
        sum("len").as("active_days"),
        max(struct(col("len"), col("start_day"))).getField("start_day")
          .as("best_start"))
      .orderBy("user_id")
  }

  val qGapIslandsOracle: String = """
    WITH d AS (SELECT DISTINCT user_id,
                 datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) dd
               FROM events),
    i AS (SELECT user_id, dd,
                 dd - row_number() OVER (PARTITION BY user_id ORDER BY dd) isl
          FROM d),
    s AS (SELECT user_id, isl, count(*) len, min(dd) start_day
          FROM i GROUP BY 1, 2)
    SELECT user_id, count(*) n_streaks, CAST(max(len) AS BIGINT) longest,
           CAST(sum(len) AS BIGINT) active_days,
           CAST(max(struct_pack(len := len, start_day := start_day)).start_day
                AS BIGINT) best_start
    FROM s GROUP BY user_id ORDER BY user_id"""

  /** First-order Markov transition matrix over each user's event-type
    * sequence: (from → to) counts via one lag window, transition
    * probability as exact integer ppm of the from-state's outgoing total
    * (window over the tiny transition agg), and each from-state's top
    * successor. The fact-sized pass is one window sort + one hash-agg. */
  def qMarkov(spark: SparkSession, dir: String): DataFrame = {
    val wu = Window.partitionBy("user_id").orderBy("event_id")
    val trans = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type").as("to_s"))
      .withColumn("from_s", lag("to_s", 1).over(wu))
      .where(col("from_s").isNotNull)
      .groupBy("from_s", "to_s").agg(count(lit(1)).as("cnt"))
    val byFrom  = Window.partitionBy("from_s")
    val rankW   = Window.partitionBy("from_s")
      .orderBy(col("cnt").desc, col("to_s"))
    trans
      .withColumn("tot", sum("cnt").over(byFrom))
      .withColumn("p_ppm", expr("cnt * 1000000L div tot"))
      .withColumn("is_top", (row_number().over(rankW) === 1).cast("int"))
      .select("from_s", "to_s", "cnt", "p_ppm", "is_top")
      .orderBy("from_s", "to_s")
  }

  val qMarkovOracle: String = """
    WITH e AS (SELECT user_id, event_id, event_type to_s,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY event_id) from_s
               FROM events),
    t AS (SELECT from_s, to_s, count(*) cnt FROM e
          WHERE from_s IS NOT NULL GROUP BY 1, 2)
    SELECT from_s, to_s, cnt,
           CAST(cnt * 1000000 // (sum(cnt) OVER (PARTITION BY from_s))
                AS BIGINT) p_ppm,
           CAST(row_number() OVER (PARTITION BY from_s
                  ORDER BY cnt DESC, to_s) = 1 AS INT) is_top
    FROM t ORDER BY from_s, to_s"""

  /** Group-mean imputation (pandas
    * `fillna(groupby.transform('mean'))`): a deterministic mask nulls
    * every 7th value; imputation substitutes the user's mean over the
    * REMAINING values, computed by an unbounded window over the same
    * user partition — no join, no second scan. The mean is the identical
    * double expression on both engines (exact cents sum / exact count). */
  def qImpute(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        when(col("event_id") % 7 =!= 0,
          Money.cents(col("value"))).as("c"))
    e.withColumn("grp_mean",
        sum("c").over(w).cast("double") / count(col("c")).over(w).cast("double") / 100.0)
      .select(col("event_id"), col("user_id"),
        col("c").isNull.cast("int").as("was_null"),
        (coalesce(col("c").cast("double") / 100.0, col("grp_mean")))
          .as("v_imputed"))
      .orderBy("event_id")
  }

  val qImputeOracle: String = """
    WITH e AS (SELECT event_id, user_id,
                      CASE WHEN event_id % 7 <> 0
                           THEN CAST(round(value*100) AS BIGINT) END c
               FROM events),
    m AS (SELECT *, CAST(sum(c) OVER w AS DOUBLE)
                    / CAST(count(c) OVER w AS DOUBLE) / 100.0 grp_mean
          FROM e WINDOW w AS (PARTITION BY user_id))
    SELECT event_id, user_id, CAST(c IS NULL AS INT) was_null,
           COALESCE(CAST(c AS DOUBLE)/100.0, grp_mean) v_imputed
    FROM m ORDER BY event_id"""

  /** 2-D histogram (heatmap binning): hour-of-day × fixed-width value
    * bucket (50 currency units) counts with exact ppm shares — the
    * density-grid pass behind any viz/profiling layer. Pure projection +
    * one hash-agg; the share window runs over the bounded grid. */
  def qHist2d(spark: SparkSession, dir: String): DataFrame = {
    val grid = Tables.events(spark, dir)
      .select(hour(col("ts")).as("hod"),
        expr("CAST(round(value*100) AS BIGINT) div 5000").as("vbin"))
      .groupBy("hod", "vbin").agg(count(lit(1)).as("cnt"))
    grid
      .withColumn("tot", sum("cnt").over(Window.partitionBy()))
      .withColumn("share_ppm", expr("cnt * 1000000L div tot"))
      .drop("tot")
      .orderBy("hod", "vbin")
  }

  val qHist2dOracle: String = """
    WITH g AS (SELECT EXTRACT(hour FROM ts) hod,
                      CAST(round(value*100) AS BIGINT) // 5000 vbin,
                      count(*) cnt
               FROM events GROUP BY 1, 2)
    SELECT CAST(hod AS INT) hod, vbin, cnt,
           CAST(cnt * 1000000 // (sum(cnt) OVER ()) AS BIGINT) share_ppm
    FROM g ORDER BY hod, vbin"""

  /** Volume anomaly detection: hourly event counts, each hour z-scored
    * against the TRAILING 24 observed hours (exact integer power sums
    * over the rolling frame; one window sort at hour grain — bounded by
    * the time span, not the event count), flagging |z| ≥ 2. The hourly
    * rollup is the only fact-sized pass. */
  def qAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      // integral div, not `/` (double division truncation — the ADVICE.md
      // fdiv class of bug); micros are non-negative so div == floor
      .groupBy(expr("unix_micros(ts) div 3600000000L").as("h"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy("h").rowsBetween(-24, -1)
    val cnt = count(col("n")).over(w)
    val s1  = sum("n").over(w)
    val s2  = sum(col("n") * col("n")).over(w)
    // sample variance numerator over the frame: cnt·Σn² − (Σn)²
    val varNum = cnt * s2 - s1 * s1
    hourly
      .withColumn("base_n", cnt).withColumn("bs1", s1)
      .withColumn("vnum", varNum)
      .where(col("base_n") === 24 && col("vnum") > 0)
      .withColumn("z",
        (col("n") * 24 - col("bs1")).cast("double") /
          sqrt((col("vnum").cast("double")) * lit(24.0) / lit(23.0)))
      .withColumn("is_anomaly", (abs(col("z")) >= 2.0).cast("int"))
      .select("h", "n", "z", "is_anomaly")
      .orderBy("h")
  }

  val qAnomalyOracle: String = """
    WITH hourly AS (SELECT epoch_us(ts) // 3600000000 h, count(*) n
                    FROM events GROUP BY 1),
    w AS (SELECT h, n,
                 count(n) OVER fr base_n,
                 CAST(sum(n) OVER fr AS BIGINT) bs1,
                 CAST(count(n) OVER fr * sum(n*n) OVER fr
                      - sum(n) OVER fr * sum(n) OVER fr AS BIGINT) vnum
          FROM hourly
          WINDOW fr AS (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
    SELECT h, n,
           CAST(n*24 - bs1 AS DOUBLE)
             / sqrt(CAST(vnum AS DOUBLE) * 24.0 / 23.0) AS z,
           CAST(abs(CAST(n*24 - bs1 AS DOUBLE)
             / sqrt(CAST(vnum AS DOUBLE) * 24.0 / 23.0)) >= 2.0 AS INT) is_anomaly
    FROM w WHERE base_n = 24 AND vnum > 0 ORDER BY h"""

  /** Growth accounting (the canonical product-analytics state machine):
    * each user-week is classified NEW (first ever week), RETAINED (active
    * previous week), or RESURRECTED (gap ≥ 2 weeks); CHURNED counts users
    * whose previous active week was exactly last week but who are absent
    * this week — computed by shifting each active week forward one week
    * and subtracting the retained set (pure aggregation arithmetic, no
    * anti-join against a generated spine). One (user) window pass over
    * distinct user-weeks, then one week-grain rollup. */
  def qGrowthAcct(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("wk")
    val uw = Tables.events(spark, dir)
      .select(col("user_id"),
        graft.ops.RelOps.fdiv(
          datediff(to_date(col("ts")), to_date(lit("1970-01-05"))).cast("long"),
          7L).as("wk"))
      .distinct()
      .withColumn("prev_wk", lag("wk", 1).over(w))
    val states = uw.groupBy("wk").agg(
      sum(when(col("prev_wk").isNull, 1L).otherwise(0L)).as("n_new"),
      sum(when(col("prev_wk") === col("wk") - 1, 1L).otherwise(0L)).as("n_retained"),
      sum(when(col("prev_wk").isNotNull && col("prev_wk") < col("wk") - 1, 1L)
        .otherwise(0L)).as("n_resurrected"))
    // users active in week wk−1 who did NOT carry into wk churn AT wk:
    // churned(wk) = active(wk−1) − retained(wk)
    val active = uw.groupBy("wk").agg(count(lit(1)).as("n_active"))
    val prevActive = active.select((col("wk") + 1).as("wk"),
      col("n_active").as("n_prev_active"))
    states.join(active, Seq("wk"))
      .join(prevActive, Seq("wk"), "left")
      .withColumn("n_churned",
        coalesce(col("n_prev_active"), lit(0L)) - col("n_retained"))
      .select("wk", "n_active", "n_new", "n_retained", "n_resurrected",
        "n_churned")
      .orderBy("wk")
  }

  val qGrowthAcctOracle: String = """
    WITH uw AS (SELECT DISTINCT user_id,
                  datediff('day', DATE '1970-01-05', CAST(ts AS DATE)) // 7 wk
                FROM events),
    lagged AS (SELECT user_id, wk,
                      lag(wk) OVER (PARTITION BY user_id ORDER BY wk) prev_wk
               FROM uw),
    st AS (SELECT wk,
             CAST(sum(CASE WHEN prev_wk IS NULL THEN 1 ELSE 0 END) AS BIGINT) n_new,
             CAST(sum(CASE WHEN prev_wk = wk - 1 THEN 1 ELSE 0 END) AS BIGINT) n_retained,
             CAST(sum(CASE WHEN prev_wk IS NOT NULL AND prev_wk < wk - 1
                      THEN 1 ELSE 0 END) AS BIGINT) n_resurrected
           FROM lagged GROUP BY 1),
    act AS (SELECT wk, count(*) n_active FROM uw GROUP BY 1)
    SELECT st.wk, act.n_active, n_new, n_retained, n_resurrected,
           COALESCE(pa.n_active, 0) - n_retained AS n_churned
    FROM st JOIN act ON st.wk = act.wk
    LEFT JOIN act pa ON pa.wk = st.wk - 1
    ORDER BY st.wk"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_attribution", qAttribution, Some(qAttributionOracle)),
    QueryDef("q_anomaly", qAnomaly, Some(qAnomalyOracle)),
    QueryDef("q_growth_acct", qGrowthAcct, Some(qGrowthAcctOracle)),
    QueryDef("q_rfm", qRfm, Some(qRfmOracle)),
    QueryDef("q_gap_islands", qGapIslands, Some(qGapIslandsOracle)),
    QueryDef("q_markov", qMarkov, Some(qMarkovOracle)),
    QueryDef("q_impute", qImpute, Some(qImputeOracle)),
    QueryDef("q_hist2d", qHist2d, Some(qHist2dOracle)))
}

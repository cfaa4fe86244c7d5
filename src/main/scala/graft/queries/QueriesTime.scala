package graft.queries

import graft.Tables
import graft.ops.Money
import graft.streaming.StreamOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pack E — event-time windowing over `events` (SURVEY.md §2.5 streaming
  * extension). The same builders run under Structured Streaming (see
  * StreamingSpec); here they execute as batch queries with DuckDB oracles.
  * Window starts are emitted as epoch seconds for engine-agnostic compare;
  * monetary sums use integer cents.
  */
object QueriesTime {

  /** Tumbling 1-hour windows per event_type. */
  def qTumbling(spark: SparkSession, dir: String): DataFrame =
    StreamOps.tumblingAgg(
        Tables.events(spark, dir)
          .withColumn("c", Money.cents(col("value"))),
        "ts", "1 hour", Seq(col("event_type")),
        Seq(count(lit(1)).as("n"),
          (sum(col("c")).cast("double") / 100.0).as("sum_value")))
      .select("window_start", "event_type", "n", "sum_value")
      .orderBy("window_start", "event_type")

  val qTumblingOracle: String = """
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) window_start,
           event_type, count(*) n,
           CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 sum_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** The SAME tumbling aggregation executed through the real streaming
    * engine (readStream → AvailableNow → memory sink, complete mode) —
    * puts the micro-batch planner, state store, and sink commit under the
    * DuckDB oracle gate instead of only stream==batch specs. Shares
    * q_window_tumbling's oracle semantics. */
  def qStreamTumbling(spark: SparkSession, dir: String): DataFrame =
    StreamOps.tumblingViaStream(spark,
        Tables.events(spark, dir)
          .withColumn("c", Money.cents(col("value"))),
        "ts", "1 hour", Seq(col("event_type")),
        Seq(count(lit(1)).as("n"),
          (sum(col("c")).cast("double") / 100.0).as("sum_value")))
      .select("window_start", "event_type", "n", "sum_value")
      .orderBy("window_start", "event_type")

  /** Sliding windows through the real streaming engine (same gate as
    * [[qStreamTumbling]]) — sliding aggregation state is a distinct
    * streaming code path (one row feeds duration/slide windows). */
  def qStreamSliding(spark: SparkSession, dir: String): DataFrame =
    StreamOps.tumblingViaStream(spark,
        Tables.events(spark, dir)
          .withColumn("c", Money.cents(col("value"))),
        "ts", "1 hour", Seq(col("event_type")),
        Seq(count(lit(1)).as("n"),
          (sum(col("c")).cast("double") / 100.0).as("sum_value")),
        slide = Some("30 minutes"))
      .select("window_start", "event_type", "n", "sum_value")
      .orderBy("window_start", "event_type")

  /** Session windows through the real streaming engine (same gate as
    * [[qStreamTumbling]]) — the merging-session state store is the
    * hardest streaming state shape, and one-file-per-micro-batch staging
    * forces sessions to merge ACROSS batches. Shares q_session_window's
    * oracle semantics. */
  def qStreamSession(spark: SparkSession, dir: String): DataFrame =
    StreamOps.sessionViaStream(spark,
        Tables.events(spark, dir)
          .withColumn("c", Money.cents(col("value"))),
        "ts", "30 minutes", Seq(col("user_id")),
        Seq(count(lit(1)).as("n"),
          (sum(col("c")).cast("double") / 100.0).as("sum_value")))
      .select("user_id", "session_start", "n", "sum_value")
      .orderBy("user_id", "session_start")

  /** Watermark delay for the append-mode streaming session gate. */
  val StreamWatermark = "2 hours"

  /** Session windows in PRODUCTION streaming mode: `withWatermark` +
    * append output through the real engine ([[StreamOps
    * .sessionViaStreamAppend]]) — the r9 verdict's remaining streaming
    * gap. The emitted rows are exactly the sessions the watermark closed:
    * end-of-input watermark = max(ts) floored to ms (Spark tracks event
    * time in milliseconds) minus the 2-hour delay, and a session is
    * final when `last event + gap < watermark`. Sessions still open at
    * that horizon stay in state (withheld), so the oracle filters the
    * batch sessionization to the same closed set — every emitted row is
    * checked, and the withheld tail is exactly the final-2h+gap window. */
  def qStreamSessionAppend(spark: SparkSession, dir: String): DataFrame =
    StreamOps.sessionViaStreamAppend(spark,
        Tables.events(spark, dir)
          .withColumn("c", Money.cents(col("value"))),
        "ts", "30 minutes", StreamWatermark, Seq(col("user_id")),
        Seq(count(lit(1)).as("n"),
          (sum(col("c")).cast("double") / 100.0).as("sum_value")))
      .select("user_id", "session_start", "n", "sum_value")
      .orderBy("user_id", "session_start")

  val qStreamSessionAppendOracle: String = """
    WITH o AS (
      SELECT user_id, ts, CAST(round(value*100) AS BIGINT) c,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END newsess
      FROM events),
    s AS (SELECT *, sum(newsess) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) sid
          FROM o),
    g AS (SELECT user_id, min(ts) st, max(ts) et, count(*) n,
                 CAST(sum(c) AS BIGINT) sc
          FROM s GROUP BY user_id, sid),
    wm AS (SELECT date_trunc('milliseconds', max(ts)) - INTERVAL '2 hours' w
           FROM events)
    SELECT user_id, CAST(floor(epoch(st)) AS BIGINT) session_start,
           n, CAST(sc AS DOUBLE)/100.0 sum_value
    FROM g, wm WHERE et + INTERVAL '30 minutes' < w
    ORDER BY user_id, session_start"""

  /** Streaming exact dedup through the real engine — the first stage of
    * every at-least-once ingestion pipeline: events compact to their
    * distinct (user_id, day) pairs (the input grain of DAU) via
    * `dropDuplicatesWithinWatermark` state, with one file per micro-batch
    * so the drops are CROSS-batch (state-store hits, not intra-batch
    * hashing — ~60% of fixture rows are duplicates at this grain). The
    * 90-day delay exceeds the fixture's 30-day span, so the emitted key
    * set equals the exact global distinct the oracle computes; eviction +
    * re-admission past a tight horizon is pinned in StreamingSpec. */
  def qStreamDedup(spark: SparkSession, dir: String): DataFrame =
    StreamOps.dedupViaStream(spark,
        Tables.events(spark, dir)
          .withColumn("day", datediff(to_date(col("ts")),
            to_date(lit("1970-01-01"))).cast("long")),
        "ts", "90 days", Seq("user_id", "day"))
      .orderBy("user_id", "day")

  val qStreamDedupOracle: String = """
    SELECT DISTINCT user_id,
           CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
             AS day
    FROM events ORDER BY user_id, day"""

  /** Stream-stream interval join through the real engine — purchase ←
    * prior-views attribution at PAIR grain (q_range_join's aggregated
    * cousin): each purchase matches the same user's views in the
    * trailing 7 days, both sides arriving as independent streams in
    * per-file micro-batches, so matches cross batch boundaries and are
    * produced by the symmetric join state store, while the watermark
    * ADVANCES and evicts passed state — the production bounded-state
    * shape (see [[graft.streaming.StreamOps.intervalJoinViaStream]] for
    * why the emitted pair set is still exactly the batch range join the
    * oracle computes).
    * `gap_s` is an exact integer (µs difference floor-divided; v_ts ≤ ts
    * so floor == truncate in both engines). */
  def qStreamIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val views = e.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    StreamOps.intervalJoinViaStream(spark, purchases, "user_id", "ts",
        views, "v_user", "v_ts", "7 days")
      .select(col("purchase_id"), col("view_id"),
        expr("(unix_micros(ts) - unix_micros(v_ts)) div 1000000L")
          .cast("long").as("gap_s"))
      .orderBy("purchase_id", "view_id")
  }

  val qStreamIntervalJoinOracle: String = """
    SELECT p.event_id AS purchase_id, v.event_id AS view_id,
           CAST((epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS BIGINT)
             AS gap_s
    FROM events p JOIN events v
      ON p.user_id = v.user_id
     AND p.event_type = 'purchase' AND v.event_type = 'view'
     AND epoch_us(v.ts) >= epoch_us(p.ts) - 604800000000
     AND epoch_us(v.ts) <= epoch_us(p.ts)
    ORDER BY purchase_id, view_id"""

  /** Sliding 1-hour windows every 30 minutes (each event in 2 windows). */
  def qSliding(spark: SparkSession, dir: String): DataFrame =
    StreamOps.slidingAgg(
        Tables.events(spark, dir)
          .withColumn("c", Money.cents(col("value"))),
        "ts", "1 hour", "30 minutes", Seq(col("event_type")),
        Seq(count(lit(1)).as("n"),
          (sum(col("c")).cast("double") / 100.0).as("sum_value")))
      .select("window_start", "event_type", "n", "sum_value")
      .orderBy("window_start", "event_type")

  val qSlidingOracle: String = """
    WITH e AS (
      SELECT event_type, CAST(round(value*100) AS BIGINT) c,
             time_bucket(INTERVAL '30 minutes', ts)
               - k * INTERVAL '30 minutes' ws
      FROM events CROSS JOIN (VALUES (0), (1)) t(k))
    SELECT CAST(epoch(ws) AS BIGINT) window_start, event_type,
           count(*) n, CAST(sum(c) AS DOUBLE)/100.0 sum_value
    FROM e GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Session windows per user, 30-minute gap: session = maximal run of
    * events with consecutive gaps < 30 min (gap ≥ 30 min starts a new
    * session — Spark `session_window` contract). */
  def qSession(spark: SparkSession, dir: String): DataFrame =
    StreamOps.sessionAgg(
        Tables.events(spark, dir)
          .withColumn("c", Money.cents(col("value"))),
        "ts", "30 minutes", Seq(col("user_id")),
        Seq(count(lit(1)).as("n"),
          (sum(col("c")).cast("double") / 100.0).as("sum_value")))
      .select("user_id", "session_start", "n", "sum_value")
      // no final global orderBy — the session table is keyed by
      // (user_id, session_start) and grows with the input (~40M sessions
      // at 100M events); the presentational sort measured 2.2× the query
      // at that scale, 7.6× in the noisier r16 reading (range sampling
      // re-executes sessionize+agg, then sorts the full output —
      // SortTaxProbe, SCALE.md "r17: the presentational-sort tax"). The
      // streaming gates above keep their sorts: fixture-scale outputs.

  val qSessionOracle: String = """
    WITH o AS (
      SELECT user_id, ts, CAST(round(value*100) AS BIGINT) c,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END newsess
      FROM events),
    s AS (SELECT *, sum(newsess) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) sid
          FROM o)
    SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) session_start,
           count(*) n, CAST(sum(c) AS DOUBLE)/100.0 sum_value
    FROM s GROUP BY user_id, sid ORDER BY user_id, session_start"""

  /** Datetime component extraction (pandas `dt.*` accessors): year /
    * month / day / day-of-week / hour + month truncation, aggregated per
    * (year, month) — pure projections, one tiny agg. Day-of-week is
    * normalized to pandas' Monday=0 convention on both engines (Spark
    * `dayofweek` is 1=Sunday; DuckDB `dayofweek` is 0=Sunday). */
  def qDatetime(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        year(col("ts")).cast("long").as("y"),
        month(col("ts")).cast("long").as("m"),
        dayofmonth(col("ts")).cast("long").as("d"),
        ((dayofweek(col("ts")) + 5) % 7).cast("long").as("dow_mon0"),
        hour(col("ts")).cast("long").as("h"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day_start"))
      .groupBy("y", "m", "d", "dow_mon0", "day_start")
      .agg(count(lit(1)).as("n"),
        min(col("h")).as("min_h"), max(col("h")).as("max_h"),
        countDistinct(col("h")).as("nd_hour"))
      .orderBy("y", "m", "d")

  val qDatetimeOracle: String = """
    WITH e AS (SELECT CAST(year(ts) AS BIGINT) y, CAST(month(ts) AS BIGINT) m,
                      CAST(day(ts) AS BIGINT) d,
                      CAST((dayofweek(ts) + 6) % 7 AS BIGINT) dow_mon0,
                      CAST(hour(ts) AS BIGINT) h,
                      CAST(epoch(date_trunc('day', ts)) AS BIGINT) day_start
               FROM events)
    SELECT y, m, d, dow_mon0, day_start, count(*) AS n,
           min(h) AS min_h, max(h) AS max_h,
           count(DISTINCT h) AS nd_hour
    FROM e GROUP BY y, m, d, dow_mon0, day_start ORDER BY y, m, d"""

  /** Ordered conversion funnel signup → view → purchase per user: stage N
    * counts users whose first stage-N event occurs at-or-after their
    * first stage-(N−1) completion, plus the summed conversion lag in
    * microseconds (integer-exact across engines). Each stage is one
    * filtered scan + a per-user min — the funnel never materializes event
    * sequences, so it scales as three hash-aggs keyed by user. */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val s1 = e.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = e.where(col("event_type") === "view").join(s1, Seq("user_id"))
      .where(col("ts") >= col("t1"))
      .groupBy(col("user_id"), col("t1")).agg(min(col("ts")).as("t2"))
    val s3 = e.where(col("event_type") === "purchase").join(s2, Seq("user_id"))
      .where(col("ts") >= col("t2"))
      .groupBy(col("user_id"), col("t2")).agg(min(col("ts")).as("t3"))
    def row(stage: Long, name: String, df: DataFrame, lag: Column) =
      df.agg(count(lit(1)).as("users"), coalesce(lag, lit(0L)).as("lag_us_sum"))
        .select(lit(stage).as("stage"), lit(name).as("event_type"),
          col("users"), col("lag_us_sum"))
    row(1L, "signup", s1, sum(lit(0L)))
      .unionByName(row(2L, "view", s2,
        sum(unix_micros(col("t2")) - unix_micros(col("t1")))))
      .unionByName(row(3L, "purchase", s3,
        sum(unix_micros(col("t3")) - unix_micros(col("t2")))))
      .orderBy("stage")
  }

  val qFunnelOracle: String = """
    WITH s1 AS (SELECT user_id, min(ts) t1 FROM events
                WHERE event_type = 'signup' GROUP BY 1),
    s2 AS (SELECT e.user_id, t1, min(ts) t2 FROM events e JOIN s1 USING (user_id)
           WHERE event_type = 'view' AND ts >= t1 GROUP BY 1, 2),
    s3 AS (SELECT e.user_id, t2, min(ts) t3 FROM events e JOIN s2 USING (user_id)
           WHERE event_type = 'purchase' AND ts >= t2 GROUP BY 1, 2)
    SELECT CAST(1 AS BIGINT) AS stage, 'signup' AS event_type,
           count(*) AS users, CAST(0 AS BIGINT) AS lag_us_sum FROM s1
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'view', count(*),
           CAST(COALESCE(sum(epoch_us(t2) - epoch_us(t1)), 0) AS BIGINT) FROM s2
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'purchase', count(*),
           CAST(COALESCE(sum(epoch_us(t3) - epoch_us(t2)), 0) AS BIGINT) FROM s3
    ORDER BY stage"""

  /** The conversion funnel through the real streaming engine,
    * MULTI-BATCH: the per-user machine runs watermark-buffered
    * ([[graft.streaming.StreamOps.BufferedFunnelProcessor]] — arrivals
    * pend in ListState until the watermark passes them, then advance
    * the stage machine in event-time order; event-time timers flush at
    * end-of-input) under the DuckDB oracle. First-eligible-in-time-order
    * advancement equals the batch min-ts formulation because the
    * watermark, not single-batch sorting, establishes per-user time
    * order across micro-batches; the drained advancement rows (one per
    * stage reached) roll up in batch to q_funnel's exact
    * (stage, users, lag_us_sum) shape and share its oracle. */
  def qStreamFunnel(spark: SparkSession, dir: String): DataFrame = {
    val adv = StreamOps.funnelViaStream(spark, Tables.events(spark, dir))
    adv.groupBy(col("stage").cast("long").as("stage"))
      .agg(count(lit(1)).as("users"), sum(col("lag_us")).as("lag_us_sum"))
      .withColumn("event_type",
        when(col("stage") === 1, "signup")
          .when(col("stage") === 2, "view").otherwise("purchase"))
      .select("stage", "event_type", "users", "lag_us_sum")
      .orderBy("stage")
  }

  /** Per-user running spend through the real streaming engine — the
    * flatMapGroupsWithState analog of group_cumsum, under the DuckDB
    * oracle, MULTI-BATCH: event-time-sliced staging + watermark-buffered
    * state establish the per-user prefix order
    * ([[graft.streaming.StreamOps.cumsumViaStream]] — arrivals pend
    * until the watermark passes them and fold in (ts, event_id) order,
    * so the oracle windows on the same event-time order; double-carried
    * cents stay exact to 2^53). Output is one row per event with its
    * running total — the unbounded-stream shape a spend-cap or quota
    * monitor consumes. */
  def qStreamCumsum(spark: SparkSession, dir: String): DataFrame =
    StreamOps.cumsumViaStream(spark, Tables.events(spark, dir))
      .select(col("event_id"), col("user_id"),
        (col("run_c") / 100.0).as("run_value"))
      .orderBy("event_id")

  val qStreamCumsumOracle: String = """
    SELECT event_id, user_id,
           CAST(sum(CAST(round(value*100) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS DOUBLE)/100.0 AS run_value
    FROM events ORDER BY event_id"""

  /** Stream-static enrichment under the oracle gate: the events stream
    * joins the (broadcast) customer dim — re-planned every micro-batch,
    * Spark's dim-refresh contract — then rolls up revenue per market
    * segment per hour window through the real engine
    * ([[graft.streaming.StreamOps.enrichViaStream]]). The surrogate key
    * maps users onto the dim's key space (`user_id % 25 + 1`) the same
    * way on both sides, so the inner join drops nothing
    * nondeterministically and the gate is exact. */
  def qStreamEnrich(spark: SparkSession, dir: String): DataFrame =
    StreamOps.enrichViaStream(spark,
        Tables.events(spark, dir)
          .select(col("ts"), (col("user_id") % 25 + 1).as("c_custkey"),
            Money.cents(col("value")).as("c")),
        Tables.customer(spark, dir).select("c_custkey", "c_mktsegment"),
        Seq("c_custkey"), "ts", "1 hour", Seq(col("c_mktsegment")),
        Seq(count(lit(1)).as("n"),
          (sum(col("c")).cast("double") / 100.0).as("sum_value")))
      .select("window_start", "c_mktsegment", "n", "sum_value")
      .orderBy("window_start", "c_mktsegment")

  val qStreamEnrichOracle: String = """
    WITH e AS (SELECT ts, user_id % 25 + 1 AS ck,
                      CAST(round(value*100) AS BIGINT) c FROM events)
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', e.ts)) AS BIGINT)
             AS window_start,
           c_mktsegment, count(*) AS n,
           CAST(sum(c) AS DOUBLE)/100.0 AS sum_value
    FROM e JOIN customer ON ck = c_custkey
    GROUP BY 1, 2 ORDER BY 1, 2"""

  /** [[qStreamEnrich]] in PRODUCTION append mode (r11 verdict item 4):
    * the enriched hourly rollup runs `withWatermark` + append output
    * through the real engine
    * ([[graft.streaming.StreamOps.enrichViaStreamAppend]]) — a window
    * row is emitted exactly once, when the watermark passes its end.
    * End-of-input watermark = max(ts) floored to ms minus the 2-hour
    * delay; a tumbling window is final when `window_end <= watermark`
    * (Spark evicts on end ≤ watermark for windowed aggregations), so
    * the oracle filters the batch rollup to the same closed set and the
    * withheld tail is exactly the final 2h+1h of windows. Late-row drop
    * behind the watermark is pinned in StreamingSpec. */
  def qStreamEnrichAppend(spark: SparkSession, dir: String): DataFrame =
    StreamOps.enrichViaStreamAppend(spark,
        Tables.events(spark, dir)
          .select(col("ts"), (col("user_id") % 25 + 1).as("c_custkey"),
            Money.cents(col("value")).as("c")),
        Tables.customer(spark, dir).select("c_custkey", "c_mktsegment"),
        Seq("c_custkey"), "ts", "1 hour", StreamWatermark,
        Seq(col("c_mktsegment")),
        Seq(count(lit(1)).as("n"),
          (sum(col("c")).cast("double") / 100.0).as("sum_value")))
      .select("window_start", "c_mktsegment", "n", "sum_value")
      .orderBy("window_start", "c_mktsegment")

  val qStreamEnrichAppendOracle: String = """
    WITH e AS (SELECT ts, user_id % 25 + 1 AS ck,
                      CAST(round(value*100) AS BIGINT) c FROM events),
    wm AS (SELECT date_trunc('milliseconds', max(ts)) - INTERVAL '2 hours' w
           FROM events)
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', e.ts)) AS BIGINT)
             AS window_start,
           c_mktsegment, count(*) AS n,
           CAST(sum(c) AS DOUBLE)/100.0 AS sum_value
    FROM e JOIN customer ON ck = c_custkey, wm
    WHERE time_bucket(INTERVAL '1 hour', e.ts) + INTERVAL '1 hour' <= wm.w
    GROUP BY 1, 2 ORDER BY 1, 2"""

  /** The exactly-once foreachBatch snapshot sink under the oracle gate:
    * events replay one file per micro-batch through
    * [[graft.streaming.StreamOps.upsertSnapshot]] (compact-and-swap with
    * an atomic `_CURRENT` pointer), each batch upserting against the
    * previous snapshot; the final snapshot — the latest event per user
    * by the UNIQUE event_id version, so per-key argmax is
    * order-independent and the gate exact — is read back and everything
    * staged is cleaned (the q_embed_lsh_index pattern). Value rides as
    * exact cents. */
  def qStreamUpsert(spark: SparkSession, dir: String): DataFrame =
    StreamOps.upsertViaStream(spark,
        Tables.events(spark, dir)
          .select(col("user_id"), col("event_id"), col("event_type"),
            Money.cents(col("value")).as("last_c")),
        Seq("user_id"), "event_id")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("last_c"))
      .orderBy("user_id")

  val qStreamUpsertOracle: String = """
    SELECT user_id, event_id AS last_event_id, event_type AS last_type,
           CAST(round(value*100) AS BIGINT) AS last_c
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                      ORDER BY event_id DESC) rn FROM events)
    WHERE rn = 1 ORDER BY user_id"""

  /** Fixed-width value histogram (bucket = 25.00 currency units): the
    * distribution pass of feature analysis / outlier triage. Bucketing is
    * integer FLOOR division on exact cents (`fdiv(c, 2500)` — matches
    * DuckDB `//` for negative cents too), so bucket edges have no
    * float-boundary ambiguity between engines; one hash-agg. */
  def qHist(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("c", Money.cents(col("value")))
      .withColumn("bucket", graft.ops.RelOps.fdiv(col("c"), 2500L))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        (sum(col("c")).cast("double") / 100.0).as("sum_value"),
        (min(col("c")).cast("double") / 100.0).as("min_value"),
        (max(col("c")).cast("double") / 100.0).as("max_value"))
      .orderBy("bucket")

  val qHistOracle: String = """
    WITH e AS (SELECT CAST(round(value*100) AS BIGINT) c FROM events)
    SELECT c // 2500 AS bucket, count(*) AS n,
           CAST(sum(c) AS DOUBLE)/100.0 AS sum_value,
           CAST(min(c) AS DOUBLE)/100.0 AS min_value,
           CAST(max(c) AS DOUBLE)/100.0 AS max_value
    FROM e GROUP BY 1 ORDER BY bucket"""

  /** Attribution range join (batch analog of the streaming interval join,
    * and the batch "range join" operator itself): each purchase event is
    * credited with the view events of the same user inside the trailing
    * 30-minute attribution window [purchase − 30 min, purchase]. Executes
    * via [[graft.ops.RelOps.rangeJoin]] — the ordinate is binned into the
    * join key so the plan is a plain shuffled equi-join on
    * (user_id, bin), never a per-key cross product. Microsecond integer
    * arithmetic end-to-end; view cents summed exactly. */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val winUs = 30L * 60 * 1000000
    val e = Tables.events(spark, dir)
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"))
      .withColumn("lo_us", col("purchase_us") - lit(winUs))
      .withColumn("hi_us", col("purchase_us"))
    val views = e.where(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("v_us"),
        Money.cents(col("value")).as("c"))
    val per = graft.ops.RelOps
      .rangeJoin(views, "v_us", purchases, "lo_us", "hi_us", Seq("user_id"), winUs)
      .groupBy("purchase_id")
      .agg(count(lit(1)).as("n_views"), sum(col("c")).as("sc"))
    purchases.join(per, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"), col("purchase_us"),
        coalesce(col("n_views"), lit(0L)).as("n_views"),
        (coalesce(col("sc"), lit(0L)).cast("double") / 100.0).as("view_value"))
      .orderBy("purchase_id")
  }

  val qRangeJoinOracle: String = """
    WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS purchase_us
               FROM events WHERE event_type = 'purchase'),
    v AS (SELECT user_id, epoch_us(ts) AS v_us, CAST(round(value*100) AS BIGINT) c
          FROM events WHERE event_type = 'view'),
    j AS (SELECT purchase_id, count(*) AS n, sum(c) AS sc
          FROM p JOIN v ON p.user_id = v.user_id
           AND v.v_us >= p.purchase_us - 1800000000 AND v.v_us <= p.purchase_us
          GROUP BY 1)
    SELECT purchase_id, user_id, purchase_us,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_views,
           CAST(COALESCE(sc, 0) AS DOUBLE)/100.0 AS view_value
    FROM p LEFT JOIN j USING (purchase_id) ORDER BY purchase_id"""

  /** Resample to a fixed hourly grid with gap-filling (pandas
    * `resample('1H')` + `asfreq` + ffill): the hourly spine spans
    * [min, max] event hour per event_type, empty buckets appear with
    * n = 0 / null sum, and `sum_ffill` carries the last seen bucket sum
    * forward across gaps. The spine is GENERATED (sequence over the
    * global [lo, hi] hour range cross-joined with the tiny distinct-type
    * relation), never shuffled at corpus width: spine rows =
    * span/width · |types| regardless of event count, and the left join
    * back to the hourly agg is an equi-join AQE handles. */
  def qResample(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("c", Money.cents(col("value")))
      .withColumn("h",
        graft.ops.RelOps.fdiv(unix_timestamp(col("ts")), 3600L) * 3600)
    val agg = e.groupBy("event_type", "h")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
    val bounds = e.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
    val spine = e.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), lit(3600L))).as("h"))
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine.join(agg, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h").as("bucket_start"),
        coalesce(col("n"), lit(0L)).as("n"),
        (col("sc").cast("double") / 100.0).as("sum_value"),
        (last(col("sc"), ignoreNulls = true).over(wf).cast("double") / 100.0)
          .as("sum_ffill"))
      .orderBy("event_type", "bucket_start")
  }

  val qResampleOracle: String = """
    WITH e AS (SELECT event_type,
                      CAST(floor(epoch(ts)) AS BIGINT) // 3600 * 3600 AS h,
                      CAST(round(value*100) AS BIGINT) c FROM events),
    a AS (SELECT event_type, h, count(*) AS n, sum(c) AS sc FROM e GROUP BY 1, 2),
    b AS (SELECT min(h) AS lo, max(h) AS hi FROM e),
    s AS (SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS h
          FROM (SELECT DISTINCT event_type FROM e), b),
    j AS (SELECT s.event_type, s.h, a.n, a.sc
          FROM s LEFT JOIN a ON s.event_type = a.event_type AND s.h = a.h)
    SELECT event_type, h AS bucket_start,
           CAST(COALESCE(n, 0) AS BIGINT) AS n,
           CAST(sc AS DOUBLE)/100.0 AS sum_value,
           CAST(last_value(sc IGNORE NULLS) OVER (
                  PARTITION BY event_type ORDER BY h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE)/100.0 AS sum_ffill
    FROM j ORDER BY event_type, bucket_start"""

  /** Interval-overlap join (the interval-interval generalization of
    * q_range_join): each view's 10-minute engagement interval
    * [v, v+10 min] is paired with every same-user purchase consideration
    * interval [p−5 min, p+5 min] it overlaps, with the exact overlap
    * length in microseconds. Executes via [[graft.ops.RelOps.overlapJoin]]
    * — both interval sets are exploded over the bins they touch and the
    * join is a plain shuffled equi-join on (user_id, bin) with the
    * first-shared-bin rule making every pair appear exactly once; no
    * per-key cross product, no BNLJ, no post-join distinct. */
  def qOverlapJoin(spark: SparkSession, dir: String): DataFrame = {
    val tenMinUs  = 10L * 60 * 1000000
    val fiveMinUs = 5L * 60 * 1000000
    val e = Tables.events(spark, dir)
    val views = e.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        unix_micros(col("ts")).as("v_lo"))
      .withColumn("v_hi", col("v_lo") + lit(tenMinUs))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        (unix_micros(col("ts")) - fiveMinUs).as("p_lo"),
        (unix_micros(col("ts")) + fiveMinUs).as("p_hi"))
    graft.ops.RelOps
      .overlapJoin(views, "v_lo", "v_hi", purchases, "p_lo", "p_hi",
        Seq("user_id"), tenMinUs)
      .select(col("view_id"), col("purchase_id"), col("user_id"),
        (least(col("v_hi"), col("p_hi")) -
          greatest(col("v_lo"), col("p_lo"))).as("overlap_us"))
      .orderBy("view_id", "purchase_id")
  }

  val qOverlapJoinOracle: String = """
    WITH v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS v_lo,
                      epoch_us(ts) + 600000000 AS v_hi
               FROM events WHERE event_type = 'view'),
    p AS (SELECT event_id AS purchase_id, user_id,
                 epoch_us(ts) - 300000000 AS p_lo,
                 epoch_us(ts) + 300000000 AS p_hi
          FROM events WHERE event_type = 'purchase')
    SELECT view_id, purchase_id, v.user_id AS user_id,
           least(v_hi, p_hi) - greatest(v_lo, p_lo) AS overlap_us
    FROM v JOIN p ON v.user_id = p.user_id
     AND v_lo <= p_hi AND p_lo <= v_hi
    ORDER BY view_id, purchase_id"""

  /** Weekly cohort retention: each user's cohort is their first active
    * epoch-week; the matrix counts distinct active users per
    * (cohort week, week offset). The per-user first-week aggregation and
    * the events stream shuffle on the same key (user_id), so the join
    * back is co-partitioned — no broadcast of a corpus-width relation,
    * and week arithmetic is pure integer floor division (fdiv ≡ DuckDB
    * `//`). The classic growth-analytics query every training-data /
    * product pipeline runs over its event log. */
  def qCohort(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("wk", graft.ops.RelOps.fdiv(unix_timestamp(col("ts")), 604800L))
    val firstWk = e.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    e.join(firstWk, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("cohort_wk", "week_offset")
  }

  val qCohortOracle: String = """
    WITH e AS (SELECT user_id,
                      CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
               FROM events),
    f AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1)
    SELECT cohort_wk, wk - cohort_wk AS week_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
           count(*) AS n_events
    FROM e JOIN f USING (user_id)
    GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Robust per-group outlier detection: median + MAD (median absolute
    * deviation) per event_type, flagging |x − med| > 3·MAD. Both medians
    * run on the distributed two-phase quantile kernel; deviations are
    * kept in exact half-cent integers (|2c − 2·med| is integral because
    * 2·median of integers is integral), so the flag comparison has no
    * float-boundary ambiguity. Group stats are broadcast back — two sort
    * phases and one hash-agg, no group buffering. */
  def qMadOutlier(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("c", Money.cents(col("value")))
    val med = graft.ops.QuantileOps.groupedMedian(e, Seq("event_type"), "c", "med_c")
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("d2", abs(lit(2L) * col("c") - (col("med_c") * 2).cast("long")))
    val mad = graft.ops.QuantileOps.groupedMedian(dev, Seq("event_type"), "d2", "mad2")
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        (max(col("med_c")) / 100.0).as("med_value"),
        (max(col("mad2")) / 200.0).as("mad_value"),
        sum(when(col("d2") > lit(3.0) * col("mad2"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy("event_type")
  }

  val qMadOutlierOracle: String = """
    WITH e AS (SELECT event_type, CAST(round(value*100) AS BIGINT) c FROM events),
    m AS (SELECT event_type, CAST(median(c) AS DOUBLE) med_c FROM e GROUP BY 1),
    d AS (SELECT e.event_type AS event_type, c,
                 abs(2*c - CAST(2*med_c AS BIGINT)) AS d2, med_c
          FROM e JOIN m USING (event_type)),
    md AS (SELECT event_type, CAST(median(d2) AS DOUBLE) mad2 FROM d GROUP BY 1)
    SELECT d.event_type AS event_type, count(*) AS n,
           max(med_c)/100.0 AS med_value,
           max(mad2)/200.0 AS mad_value,
           CAST(sum(CASE WHEN d2 > 3.0*mad2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM d JOIN md USING (event_type)
    GROUP BY 1 ORDER BY 1"""

  /** Gap-based sessionization (the lag/running-sum formulation): a new
    * session starts when a user's inter-event gap exceeds 30 minutes;
    * the running sum of new-session flags is the session id, then one
    * hash-agg rolls sessions up to (n_events, start, end, duration).
    * This is the scale-path alternative to native session_window
    * (q_session_window): one window sort per user partition and one agg,
    * no merging buffer, deterministic under ties via the (us, event_id)
    * tiebreak. */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val run = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_sess",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .orderBy("user_id", "session_id")
  }

  val qSessionizeOracle: String = """
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
    f AS (SELECT user_id, event_id, us,
            CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS new_sess
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    s AS (SELECT user_id, us,
            sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
          FROM f)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events, min(us) AS start_us, max(us) AS end_us,
           max(us) - min(us) AS duration_us
    FROM s GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Business-day arithmetic (pandas BDay / np.busday_count): per
    * priority, order→ship latency in BUSINESS days plus weekend-placement
    * stats. The weekday-count prefix function is closed-form integer math
    * anchored at the 1970-01-05 Monday epoch —
    * `b(d) = 5*(days div 7) + least(days mod 7, 5)` — so `b(ship)-b(order)`
    * needs no calendar table, no UDF, and no join against a date spine;
    * `next business day` is a 3-arm CASE on the day-of-week. One
    * broadcast-able equi-join (orders→lineitem) and one hash-agg. */
  def qBusday(spark: SparkSession, dir: String): DataFrame = {
    val mondayEpoch = to_date(lit("1970-01-05"))
    def days(d: Column)   = datediff(d, mondayEpoch).cast("long")
    def b(d: Column)      = graft.ops.RelOps.fdiv(days(d), 7L) * 5 +
      least(pmod(days(d), lit(7L)), lit(5L))
    def dow(d: Column)    = pmod(days(d), lit(7L)) // 0=Mon .. 6=Sun
    def nextBus(d: Column)= date_add(d,
      when(dow(d) === 5, 2).when(dow(d) === 6, 1).otherwise(0))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        to_date(col("o_orderdate")).as("od"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        (b(col("sd")) - b(col("od"))).as("bus_lat"),
        (dow(col("od")) >= 5).cast("long").as("weekend_order"),
        nextBus(col("od")).as("nb"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum("bus_lat").as("sum_bus_lat"),
        (sum("bus_lat").cast("double") / count(lit(1)).cast("double")).as("avg_bus_lat"),
        sum("weekend_order").as("n_weekend"),
        date_format(min(col("nb")), "yyyy-MM-dd").as("min_next_busday"))
      .orderBy("o_orderpriority")
  }

  val qBusdayOracle: String = """
    WITH o AS (SELECT o_orderkey, o_orderpriority,
                      CAST(o_orderdate AS DATE) AS od FROM orders),
    l AS (SELECT l_orderkey, CAST(l_shipdate AS DATE) AS sd FROM lineitem),
    j AS (SELECT o_orderpriority,
                 datediff('day', DATE '1970-01-05', sd) AS dsd,
                 datediff('day', DATE '1970-01-05', od) AS dod, od
          FROM l JOIN o ON l_orderkey = o_orderkey),
    x AS (SELECT o_orderpriority,
                 (5*(dsd // 7) + least(dsd % 7, 5))
                   - (5*(dod // 7) + least(dod % 7, 5)) AS bus_lat,
                 CASE WHEN dod % 7 >= 5 THEN 1 ELSE 0 END AS weekend_order,
                 od + CASE WHEN dod % 7 = 5 THEN 2
                           WHEN dod % 7 = 6 THEN 1 ELSE 0 END AS nb
          FROM j)
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(bus_lat) AS BIGINT) AS sum_bus_lat,
           CAST(sum(bus_lat) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avg_bus_lat,
           CAST(sum(weekend_order) AS BIGINT) AS n_weekend,
           CAST(min(nb) AS VARCHAR) AS min_next_busday
    FROM x GROUP BY 1 ORDER BY 1"""

  /** Rolling distinct-user cardinality — DAU, trailing-7-day WAU, and the
    * DAU/WAU stickiness ratio per observed day. A windowed
    * `count(DISTINCT)` doesn't distribute (the frame's user set must be
    * held per row); the scale-safe form used here dedups to (day, user)
    * pairs once, then each pair CONTRIBUTES to the ≤7 target days it is
    * visible from (bounded explode — the same device as the binned range
    * join), and WAU is a plain hash-agg distinct per target day. Work is
    * O(pairs·7), independent of window-frame width tricks. */
  def qDauWau(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.events(spark, dir)
      .select(datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
        .cast("long").as("day"), col("user_id")).distinct()
    val days = pairs.select(col("day")).distinct()
    val dau = pairs.groupBy("day").agg(countDistinct("user_id").as("dau"))
    val wau = pairs
      .select(explode(expr("sequence(day, day + 6L)")).as("day"), col("user_id"))
      .join(days, Seq("day"), "left_semi")
      .groupBy("day").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, Seq("day"))
      .withColumn("stickiness",
        col("dau").cast("double") / col("wau").cast("double"))
      .orderBy("day")
  }

  val qDauWauOracle: String = """
    WITH p AS (SELECT DISTINCT
                 datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
                 user_id FROM events),
    d AS (SELECT DISTINCT day FROM p),
    dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM p GROUP BY 1),
    c AS (SELECT unnest(generate_series(day, day + 6)) AS day, user_id FROM p),
    wau AS (SELECT c.day, count(DISTINCT c.user_id) AS wau
            FROM c SEMI JOIN d ON c.day = d.day GROUP BY 1)
    SELECT CAST(day AS BIGINT) AS day, dau, wau,
           CAST(dau AS DOUBLE)/CAST(wau AS DOUBLE) AS stickiness
    FROM dau JOIN wau USING (day) ORDER BY day"""

  /** Time-based rolling window (pandas `rolling('1h', on='ts')`): per-user
    * trailing-hour event count / exact-cents sum / mean at every event —
    * a RANGE frame over epoch seconds, not a row-count frame, so gaps and
    * bursts weight correctly. One partitioned window sort; constant state
    * per row (Spark evaluates the running RANGE frame incrementally). */
  def qRollTime(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("s"))
      .rangeBetween(-3600L, 0L)
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        Money.cents(col("value")).as("c"))
      // µs→s floor keeps the frame boundary identical in both engines
      .withColumn("s", expr("us div 1000000L"))
    e.select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_1h"),
        sum("c").over(w).as("sum_c_1h"),
        (sum("c").over(w).cast("double") /
          count(lit(1)).over(w).cast("double") / 100.0).as("mean_1h"))
      .orderBy("event_id")
  }

  val qRollTimeOracle: String = """
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) // 1000000 AS s,
                      CAST(round(value*100) AS BIGINT) c FROM events)
    SELECT event_id, user_id,
           count(*) OVER w AS n_1h,
           CAST(sum(c) OVER w AS BIGINT) AS sum_c_1h,
           CAST(sum(c) OVER w AS DOUBLE) / CAST(count(*) OVER w AS DOUBLE)
             / 100.0 AS mean_1h
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY s
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    ORDER BY event_id"""

  /** Month-over-month revenue growth: monthly order-revenue rollup (one
    * hash-agg at month grain), then lag + exact-ppm delta over the
    * BOUNDED month spine (the single-partition lag window sees one row
    * per month — constant size at any fact scale). Negative deltas rely
    * on both engines truncating integer division toward zero. */
  def qMom(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      // month count is FIXED (~tens) while orders scale with the corpus:
      // Σ(o_totalprice cents ≤ 5e7) per month has only ~3.5× long
      // headroom at the 100 TB design point → exact 128-bit sum
      // (r15 overflow sweep, PLANS.md)
      .agg(graft.functions.ExactAgg.sumI128(Money.cents(col("o_totalprice")))
          .as("rev_c"),
        count(lit(1)).as("n_orders"))
    val w = Window.partitionBy().orderBy("month")
    monthly
      .withColumn("prev_c", lag("rev_c", 1).over(w))
      .withColumn("mom_ppm",
        expr("(rev_c - prev_c) * 1000000L div prev_c"))
      .select(col("month"), (col("rev_c").cast("double") / 100.0).as("revenue"),
        col("n_orders"), col("mom_ppm"))
      .orderBy("month")
  }

  val qMomOracle: String = """
    WITH m AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') mon,
                      CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) rev_c,
                      count(*) n_orders
               FROM orders GROUP BY 1),
    l AS (SELECT *, lag(rev_c) OVER (ORDER BY mon) prev_c FROM m)
    SELECT mon AS "month", CAST(rev_c AS DOUBLE)/100.0 revenue, n_orders,
           CAST((rev_c - prev_c) * 1000000 // prev_c AS BIGINT) mom_ppm
    FROM l ORDER BY mon"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_mom", qMom, Some(qMomOracle)),
    QueryDef("q_roll_time", qRollTime, Some(qRollTimeOracle)),
    QueryDef("q_window_tumbling", qTumbling, Some(qTumblingOracle)),
    QueryDef("q_stream_tumbling", qStreamTumbling, Some(qTumblingOracle)),
    QueryDef("q_window_sliding", qSliding, Some(qSlidingOracle)),
    QueryDef("q_stream_sliding", qStreamSliding, Some(qSlidingOracle)),
    QueryDef("q_session_window", qSession, Some(qSessionOracle)),
    QueryDef("q_stream_session", qStreamSession, Some(qSessionOracle)),
    QueryDef("q_stream_session_append", qStreamSessionAppend,
      Some(qStreamSessionAppendOracle)),
    QueryDef("q_stream_dedup", qStreamDedup, Some(qStreamDedupOracle)),
    QueryDef("q_stream_interval_join", qStreamIntervalJoin,
      Some(qStreamIntervalJoinOracle)),
    QueryDef("q_datetime", qDatetime, Some(qDatetimeOracle)),
    QueryDef("q_funnel", qFunnel, Some(qFunnelOracle)),
    QueryDef("q_stream_funnel", qStreamFunnel, Some(qFunnelOracle)),
    QueryDef("q_stream_cumsum", qStreamCumsum, Some(qStreamCumsumOracle)),
    QueryDef("q_stream_enrich", qStreamEnrich, Some(qStreamEnrichOracle)),
    QueryDef("q_stream_enrich_append", qStreamEnrichAppend,
      Some(qStreamEnrichAppendOracle)),
    QueryDef("q_stream_upsert", qStreamUpsert, Some(qStreamUpsertOracle)),
    QueryDef("q_hist", qHist, Some(qHistOracle)),
    QueryDef("q_range_join", qRangeJoin, Some(qRangeJoinOracle)),
    QueryDef("q_resample", qResample, Some(qResampleOracle)),
    QueryDef("q_overlap_join", qOverlapJoin, Some(qOverlapJoinOracle)),
    QueryDef("q_cohort", qCohort, Some(qCohortOracle)),
    QueryDef("q_mad_outlier", qMadOutlier, Some(qMadOutlierOracle)),
    QueryDef("q_sessionize", qSessionize, Some(qSessionizeOracle)),
    QueryDef("q_busday", qBusday, Some(qBusdayOracle)),
    QueryDef("q_dau_wau", qDauWau, Some(qDauWauOracle)))
}

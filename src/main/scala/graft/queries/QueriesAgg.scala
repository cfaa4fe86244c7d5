package graft.queries

import graft.Tables
import graft.functions.ExactAgg
import graft.ops.{GroupedOps, Money, QuantileOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pack A — grouped aggregations (SURVEY.md §2.2): sum/prod/mean/var/std/
  * sem/skew/min/max/first/last/nth/ohlc/median/quantile/any/all/count, with
  * the reference's min_count and Kleene NA semantics.
  *
  * Float determinism strategy (shared with the DuckDB oracle): monetary
  * columns are scaled to integer cents (`round(x*100)` — both engines
  * compute the identical double product first), all accumulation happens in
  * exact integer or integer-valued-double space, and any final float math
  * is a single identical formula on both sides. That makes results
  * hash-comparable with zero tolerance while keeping plans pure built-in
  * Catalyst aggregates (partial agg + whole-stage codegen intact).
  */
object QueriesAgg {

  // exact fast cents — see graft.ops.Money for the equivalence argument
  private def cents(c: String) = graft.ops.Money.cents(col(c))

  /** TPC-H Q1-shaped flagship: scan → filter (parquet pushdown) → hash agg.
    * Exercises group_sum / group_mean / count (`src/groupby.rs:846,1271`). */
  def q1(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        cents("l_extendedprice").as("pc"), cents("l_discount").as("dc"),
        cents("l_tax").as("tc"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        // Σpc and the per-row products (≤ ~1e9 disc / ~2e11 charge
        // cents-units) all outgrow a long accumulator inside the 100 TB
        // design point (the r15 overflow sweep in PLANS.md has the
        // per-accumulator bounds: Σpc wraps at ~8.8e11 rows/group, the
        // products at ~9e9 / ~5e8) — they accumulate in sum_i128, the
        // two-long exact 128-bit sum (graft.functions.SumI128): exact
        // like the oracle's HUGEINT at ~long-sum speed, vs the measured
        // ~5.7 s/600M rows the former decimal(38,0) buffers cost at sf100
        (ExactAgg.sumI128(col("pc")).cast("double") / 100.0)
          .as("sum_base_price"),
        (ExactAgg.sumI128(col("pc") * (lit(100L) - col("dc")))
          .cast("double") / 10000.0).as("sum_disc_price"),
        (ExactAgg.sumI128(col("pc") * (lit(100L) - col("dc"))
            * (lit(100L) + col("tc")))
          .cast("double") / 1000000.0).as("sum_charge"),
        avg("l_quantity").as("avg_qty"),
        (ExactAgg.sumI128(col("pc")).cast("double") / 100.0 /
          count(lit(1)).cast("double")).as("avg_price"),
        (sum(col("dc")).cast("double") / 100.0 / count(lit(1)).cast("double")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Oracle: String = """
    WITH c AS (
      SELECT l_returnflag, l_linestatus, l_quantity,
             CAST(round(l_extendedprice*100) AS BIGINT) pc,
             CAST(round(l_discount*100) AS BIGINT) dc,
             CAST(round(l_tax*100) AS BIGINT) tc
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           CAST(sum(pc) AS DOUBLE)/100.0 AS sum_base_price,
           CAST(sum(pc*(100-dc)) AS DOUBLE)/10000.0 AS sum_disc_price,
           CAST(sum(pc*(100-dc)*(100+tc)) AS DOUBLE)/1000000.0 AS sum_charge,
           avg(l_quantity) AS avg_qty,
           CAST(sum(pc) AS DOUBLE)/100.0/CAST(count(*) AS DOUBLE) AS avg_price,
           CAST(sum(dc) AS DOUBLE)/100.0/CAST(count(*) AS DOUBLE) AS avg_disc,
           count(*) AS count_order
    FROM c GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""

  /** group_sum + min_count (`src/groupby.rs:846-907`, `:788-843`) over
    * injected nulls (fixtures are null-free — FIXTURES.md §B null-injection). */
  def qSumMinCount(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .withColumn("v", when(col("c_custkey") % 3 === 0, cents("c_acctbal")))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(
        count(col("v")).as("n_obs"),
        (GroupedOps.sumMinCount(col("v"), 5).cast("double") / 100.0).as("sum_mc5"),
        (sum(col("v")).cast("double") / 100.0).as("sum_all"),
        (GroupedOps.noSkipna(sum(col("v")), col("v")).cast("double") / 100.0).as("sum_noskip"),
        when(count(col("v")) >= 5,
          sum(col("v")).cast("double") / 100.0 / count(col("v")).cast("double")).as("avg_mc5"))
      .orderBy("c_nationkey", "c_mktsegment")

  val qSumMinCountOracle: String = """
    WITH c AS (
      SELECT c_nationkey, c_mktsegment,
             CASE WHEN c_custkey % 3 = 0 THEN CAST(round(c_acctbal*100) AS BIGINT) END v
      FROM customer)
    SELECT c_nationkey, c_mktsegment, count(v) AS n_obs,
           CASE WHEN count(v) >= 5 THEN CAST(sum(v) AS DOUBLE)/100.0 END AS sum_mc5,
           CAST(sum(v) AS DOUBLE)/100.0 AS sum_all,
           CASE WHEN count(*) = count(v) THEN CAST(sum(v) AS DOUBLE)/100.0 END AS sum_noskip,
           CASE WHEN count(v) >= 5
                THEN CAST(sum(v) AS DOUBLE)/100.0/CAST(count(v) AS DOUBLE) END AS avg_mc5
    FROM c GROUP BY c_nationkey, c_mktsegment ORDER BY c_nationkey, c_mktsegment"""

  /** group_prod + min_count (`src/groupby.rs:909-985`). Multiplicands kept
    * in small-int space so products are associativity-proof exact. */
  def qProd(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("m", (col("l_quantity").cast("long") % 5 + 1).cast("double"))
      .groupBy("l_orderkey")
      .agg(
        count(lit(1)).as("n_lines"),
        product(col("m")).as("prod_m"),
        GroupedOps.prodMinCount(col("m"), 5).as("prod_mc5"))
      .orderBy("l_orderkey")

  val qProdOracle: String = """
    WITH c AS (SELECT l_orderkey, CAST(CAST(l_quantity AS BIGINT) % 5 + 1 AS DOUBLE) m FROM lineitem)
    SELECT l_orderkey, count(*) AS n_lines, product(m) AS prod_m,
           CASE WHEN count(m) >= 5 THEN product(m) END AS prod_mc5
    FROM c GROUP BY l_orderkey ORDER BY l_orderkey"""

  /** group_var/std/sem with ddof (`src/groupby.rs:987-1129`) and adjusted
    * skewness (`src/groupby.rs:1131-1268`) from exact power sums. */
  def qMoments(spark: SparkSession, dir: String): DataFrame = {
    val v = col("l_quantity")
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(v).as("n"),
        (sum(v).cast("double") / count(v).cast("double")).as("mean_qty"),
        GroupedOps.varExact(v, 1).as("var1"),
        GroupedOps.varExact(v, 0).as("var0"),
        GroupedOps.varExact(v, 2).as("var2"),
        GroupedOps.stdExact(v, 1).as("std1"),
        GroupedOps.semExact(v, 1).as("sem1"),
        GroupedOps.skewAdjusted(v).as("skew_adj"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val qMomentsOracle: String = {
    val n  = "CAST(count(l_quantity) AS DOUBLE)"
    val s1 = "CAST(sum(l_quantity) AS DOUBLE)"
    val s2 = "CAST(sum(l_quantity*l_quantity) AS DOUBLE)"
    val s3 = "CAST(sum(l_quantity*l_quantity*l_quantity) AS DOUBLE)"
    def varD(d: Int) =
      s"CASE WHEN $n - $d <= 0 THEN NULL ELSE ($s2 - $s1*$s1/$n)/($n - $d) END"
    val m  = s"($s1/$n)"
    val m2 = s"($s2/$n - $m*$m)"
    val m3 = s"($s3/$n - 3.0*$m*($s2/$n) + 2.0*$m*$m*$m)"
    s"""
    SELECT l_returnflag, l_linestatus, count(l_quantity) AS n,
           $s1/$n AS mean_qty,
           ${varD(1)} AS var1, ${varD(0)} AS var0, ${varD(2)} AS var2,
           sqrt(${varD(1)}) AS std1,
           sqrt(${varD(1)})/sqrt($n) AS sem1,
           CASE WHEN $n < 3 THEN NULL WHEN $m2 = 0 THEN 0.0
                ELSE ($m3/($m2*sqrt($m2)))*sqrt($n*($n-1))/($n-2) END AS skew_adj
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""
  }

  /** group_min/group_max + min_count (`src/groupby.rs:2039-2154`). */
  def qMinMax(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .withColumn("v", when(col("c_custkey") % 4 === 0, col("c_acctbal")))
      .groupBy("c_nationkey")
      .agg(
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        GroupedOps.withMinCount(min(col("v")), col("v"), 10).as("min_mc10"),
        GroupedOps.withMinCount(max(col("v")), col("v"), 10).as("max_mc10"),
        count(col("v")).as("n_obs"))
      .orderBy("c_nationkey")

  val qMinMaxOracle: String = """
    WITH c AS (SELECT c_nationkey, c_acctbal,
                      CASE WHEN c_custkey % 4 = 0 THEN c_acctbal END v FROM customer)
    SELECT c_nationkey, min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
           CASE WHEN count(v) >= 10 THEN min(v) END AS min_mc10,
           CASE WHEN count(v) >= 10 THEN max(v) END AS max_mc10,
           count(v) AS n_obs
    FROM c GROUP BY c_nationkey ORDER BY c_nationkey"""

  /** group_last / group_nth over an explicit order (`src/groupby.rs:1662,
    * 1831`): first/last/3rd non-NA value per group. */
  def qFirstLastNth(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("v2", when(col("event_id") % 7 =!= 0, col("value")))
    val fl = ev.groupBy("user_id").agg(
      expr("min_by(v2, event_id) FILTER (WHERE v2 IS NOT NULL)").as("first_v"),
      expr("max_by(v2, event_id) FILTER (WHERE v2 IS NOT NULL)").as("last_v"),
      count(col("v2")).as("n_obs"))
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val nth = ev.where(col("v2").isNotNull)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 3)
      .select(col("user_id"), col("v2").as("nth3_v"))
    // negative n (pandas nth(-2)): 2nd non-NA from the end
    val wd = Window.partitionBy("user_id").orderBy(col("event_id").desc)
    val nthNeg = ev.where(col("v2").isNotNull)
      .withColumn("rn", row_number().over(wd))
      .where(col("rn") === 2)
      .select(col("user_id"), col("v2").as("nth_m2_v"))
    fl.join(nth, Seq("user_id"), "left")
      .join(nthNeg, Seq("user_id"), "left").orderBy("user_id")
  }

  val qFirstLastNthOracle: String = """
    WITH e AS (SELECT user_id, event_id,
                      CASE WHEN event_id % 7 <> 0 THEN value END v2 FROM events),
    fl AS (SELECT user_id,
                  min_by(v2, event_id) FILTER (WHERE v2 IS NOT NULL) first_v,
                  max_by(v2, event_id) FILTER (WHERE v2 IS NOT NULL) last_v,
                  count(v2) n_obs
           FROM e GROUP BY user_id),
    nth AS (SELECT user_id, v2 nth3_v FROM (
              SELECT user_id, v2,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id) rn
              FROM e WHERE v2 IS NOT NULL) WHERE rn = 3),
    nthm AS (SELECT user_id, v2 nth_m2_v FROM (
              SELECT user_id, v2,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM e WHERE v2 IS NOT NULL) WHERE rn = 2)
    SELECT fl.user_id, first_v, last_v, n_obs, nth3_v, nth_m2_v
    FROM fl LEFT JOIN nth ON fl.user_id = nth.user_id
            LEFT JOIN nthm ON fl.user_id = nthm.user_id ORDER BY fl.user_id"""

  /** group_first/last/nth over an OPAQUE BINARY payload — the reference's
    * PYOBJ arms (`src/lib.rs:1142-1153`, `src/lib.rs:1240-1252`) carry
    * arbitrary Python objects through the ordered first/last/nth kernels
    * without interpreting them; here the opaque value is a BinaryType
    * column flowing through the same ordered-window path as
    * [[qFirstLastNth]] (nulls skipped, ±n arms), with a hex digest only at
    * the very end so the oracle can compare bytes. */
  def qBinaryNth(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("pl",
        when(col("doc_id") % 7 =!= 0, encode(col("text"), "UTF-8")))
    val w  = Window.partitionBy("lang").orderBy("doc_id")
    val wd = Window.partitionBy("lang").orderBy(col("doc_id").desc)
    val nn = docs.where(col("pl").isNotNull)
    def pick(win: org.apache.spark.sql.expressions.WindowSpec, rn: Int,
             name: String) =
      nn.withColumn("rn", row_number().over(win)).where(col("rn") === rn)
        .select(col("lang"), hex(col("pl")).as(name))
    docs.groupBy("lang").agg(count(col("pl")).as("n_obs"))
      .join(pick(w, 1, "first_hex"), Seq("lang"), "left")
      .join(pick(wd, 1, "last_hex"), Seq("lang"), "left")
      .join(pick(w, 3, "nth3_hex"), Seq("lang"), "left")
      .join(pick(wd, 2, "nth_m2_hex"), Seq("lang"), "left")
      .orderBy("lang")
  }

  val qBinaryNthOracle: String = """
    WITH d AS (SELECT lang, doc_id,
                      CASE WHEN doc_id % 7 <> 0 THEN encode(text) END pl
               FROM documents),
    nn AS (SELECT lang, doc_id, pl,
                  row_number() OVER (PARTITION BY lang ORDER BY doc_id) rn,
                  row_number() OVER (PARTITION BY lang ORDER BY doc_id DESC) rd
           FROM d WHERE pl IS NOT NULL),
    base AS (SELECT lang, count(pl) n_obs FROM d GROUP BY lang)
    SELECT base.lang, n_obs,
           f.h AS first_hex, l.h AS last_hex,
           n3.h AS nth3_hex, nm.h AS nth_m2_hex
    FROM base
    LEFT JOIN (SELECT lang, hex(pl) h FROM nn WHERE rn = 1) f  ON base.lang = f.lang
    LEFT JOIN (SELECT lang, hex(pl) h FROM nn WHERE rd = 1) l  ON base.lang = l.lang
    LEFT JOIN (SELECT lang, hex(pl) h FROM nn WHERE rn = 3) n3 ON base.lang = n3.lang
    LEFT JOIN (SELECT lang, hex(pl) h FROM nn WHERE rd = 2) nm ON base.lang = nm.lang
    ORDER BY base.lang"""

  /** group_ohlc — documented intent (first, max, min, last) per group
    * (`src/groupby.rs:1405-1530`; reference binding bugs not replicated). */
  def qOhlc(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        expr("min_by(value, event_id)").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        expr("max_by(value, event_id)").as("close"),
        count(lit(1)).as("n"))
      .orderBy("user_id")

  val qOhlcOracle: String = """
    SELECT user_id, min_by(value, event_id) AS open, max(value) AS high,
           min(value) AS low, max_by(value, event_id) AS close, count(*) AS n
    FROM events GROUP BY user_id ORDER BY user_id"""

  /** Grouped `describe()` (the pandas summary staple): count, mean, std,
    * min, p25/p50/p75, max per group in one result. Mean/std come from
    * exact integer power sums (l_quantity is integer-valued), quartiles
    * from the engine's linear-interp quantile kernel; the two small agg
    * sides (6 groups each) join trivially. */
  def qDescribe(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val v  = col("l_quantity")
    val base = li.groupBy("l_returnflag", "l_linestatus").agg(
      count(v).as("n"),
      (sum(v).cast("double") / count(v).cast("double")).as("mean"),
      GroupedOps.stdExact(v, 1).as("std"),
      min(v).as("min_v"),
      max(v).as("max_v"))
    val qs = QuantileOps
      .groupedQuantiles(li, Seq("l_returnflag", "l_linestatus"), "l_quantity",
        Seq(0.25, 0.5, 0.75))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(max(when(col("q") === 0.25, col("linear"))).as("p25"),
        max(when(col("q") === 0.5, col("linear"))).as("p50"),
        max(when(col("q") === 0.75, col("linear"))).as("p75"))
    base.join(qs, Seq("l_returnflag", "l_linestatus"))
      .select(col("l_returnflag"), col("l_linestatus"), col("n"), col("mean"),
        col("std"), col("min_v"), col("p25"), col("p50"), col("p75"),
        col("max_v"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val qDescribeOracle: String = {
    val n  = "CAST(count(l_quantity) AS DOUBLE)"
    val s1 = "CAST(sum(l_quantity) AS DOUBLE)"
    val s2 = "CAST(sum(l_quantity*l_quantity) AS DOUBLE)"
    val varD = s"CASE WHEN $n - 1 <= 0 THEN NULL ELSE ($s2 - $s1*$s1/$n)/($n - 1) END"
    s"""
    WITH base AS (
      SELECT l_returnflag, l_linestatus, count(l_quantity) AS n,
             $s1/$n AS mean, sqrt($varD) AS std,
             min(l_quantity) AS min_v, max(l_quantity) AS max_v
      FROM lineitem GROUP BY 1, 2),
    nn AS (SELECT l_returnflag, l_linestatus, l_quantity v,
                  CAST(row_number() OVER (PARTITION BY l_returnflag, l_linestatus
                                          ORDER BY l_quantity) AS BIGINT) - 1 rn,
                  count(*) OVER (PARTITION BY l_returnflag, l_linestatus) n
           FROM lineitem WHERE l_quantity IS NOT NULL),
    e AS (SELECT nn.*, q FROM nn CROSS JOIN
            (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
                    (CAST(0.75 AS DOUBLE))) t(q)),
    g AS (SELECT l_returnflag, l_linestatus, q,
                 max(CASE WHEN rn = CAST(floor(q*(n-1)) AS BIGINT) THEN v END) lov,
                 max(CASE WHEN rn = CAST(floor(q*(n-1)) AS BIGINT) + 1 THEN v END) hiv,
                 max(q*(n-1) - floor(q*(n-1))) f
          FROM e
          WHERE rn = CAST(floor(q*(n-1)) AS BIGINT)
             OR rn = CAST(floor(q*(n-1)) AS BIGINT) + 1
          GROUP BY 1, 2, 3),
    lin AS (SELECT l_returnflag, l_linestatus, q,
                   CASE WHEN f = 0 THEN lov ELSE lov + (hiv - lov)*f END lin
            FROM g),
    p AS (SELECT l_returnflag, l_linestatus,
                 max(CASE WHEN q = 0.25 THEN lin END) p25,
                 max(CASE WHEN q = 0.5  THEN lin END) p50,
                 max(CASE WHEN q = 0.75 THEN lin END) p75
          FROM lin GROUP BY 1, 2)
    SELECT base.l_returnflag, base.l_linestatus, n, mean, std, min_v,
           p25, p50, p75, max_v
    FROM base JOIN p ON base.l_returnflag = p.l_returnflag
                    AND base.l_linestatus = p.l_linestatus
    ORDER BY base.l_returnflag, base.l_linestatus"""
  }

  /** Per-group feature scaling (sklearn StandardScaler / MinMaxScaler,
    * pandas `(x - mean)/std` transform): z-score and min-max of the
    * event value within its event_type. Group stats come from exact
    * integer-cents power sums (one hash-agg, broadcast back over the
    * fact); each row's scale is then a single identical double formula
    * in both engines. Degenerate groups (zero variance / constant) yield
    * null scales rather than ±inf. */
  def qScale(spark: SparkSession, dir: String): DataFrame = {
    val xc = Money.cents(col("value"))
    val e  = Tables.events(spark, dir).withColumn("xc", xc)
    val stats = e.groupBy("event_type").agg(
      count(col("xc")).as("n"),
      sum(col("xc")).as("s1"),
      // xc² ≈ 1e10/row wraps a long past ~1e9 rows per group: exact
      // 128-bit sum (r15, replacing the Decimal(38,0) cast); Σxc itself
      // keeps ~1600× long headroom at design scale and stays long
      ExactAgg.sumI128(col("xc") * col("xc")).as("s2"),
      min(col("xc")).as("mn"), max(col("xc")).as("mx"))
    val n  = col("n").cast("double")
    val s1 = col("s1").cast("double"); val s2 = col("s2").cast("double")
    val mean = s1 / n
    val varD = (s2 - s1 * s1 / n) / (n - 1.0)
    e.join(broadcast(stats), Seq("event_type"))
      .select(col("event_id"), col("event_type"),
        when(col("n") > 1 && varD > 0,
          (col("xc").cast("double") - mean) / sqrt(varD)).as("z"),
        when(col("mx") > col("mn"),
          (col("xc") - col("mn")).cast("double") /
            (col("mx") - col("mn")).cast("double")).as("mm"))
      .orderBy("event_id")
  }

  val qScaleOracle: String = """
    WITH e AS (SELECT event_id, event_type,
                      CAST(round(value*100) AS BIGINT) xc FROM events),
    s AS (SELECT event_type, count(xc) AS n,
                 CAST(sum(xc) AS DOUBLE) s1, CAST(sum(xc*xc) AS DOUBLE) s2,
                 min(xc) mn, max(xc) mx
          FROM e GROUP BY 1)
    SELECT event_id, e.event_type,
           CASE WHEN n > 1 AND (s2 - s1*s1/CAST(n AS DOUBLE))/(CAST(n AS DOUBLE) - 1.0) > 0
                THEN (CAST(xc AS DOUBLE) - s1/CAST(n AS DOUBLE)) /
                     sqrt((s2 - s1*s1/CAST(n AS DOUBLE))/(CAST(n AS DOUBLE) - 1.0))
           END AS z,
           CASE WHEN mx > mn
                THEN CAST(xc - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE)
           END AS mm
    FROM e JOIN s ON e.event_type = s.event_type
    ORDER BY event_id"""

  /** Full-outer merge with origin indicator (pandas
    * `merge(how='outer', indicator=True)`): a third of the customers
    * joined against the per-customer order rollup — matched rows tag
    * `both`, unmatched left `left_only`, unmatched right `right_only`,
    * and the unmatched sides keep their nulls (pandas NaN semantics). */
  def qMergeIndicator(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .where(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), col("c_acctbal"))
    val o = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Money.cents(col("o_totalprice"))).as("tc"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_acctbal"), col("n_orders"),
        (col("tc").cast("double") / 100.0).as("total_price"),
        when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "both")
          .when(col("c_custkey").isNotNull, "left_only")
          .otherwise("right_only").as("merge_origin"))
      .orderBy("custkey")
  }

  val qMergeIndicatorOracle: String = """
    WITH c AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 = 0),
    o AS (SELECT o_custkey, count(*) AS n_orders,
                 sum(CAST(round(o_totalprice*100) AS BIGINT)) AS tc
          FROM orders GROUP BY 1)
    SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_acctbal,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(tc AS DOUBLE)/100.0 AS total_price,
           CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 'both'
                WHEN c_custkey IS NOT NULL THEN 'left_only'
                ELSE 'right_only' END AS merge_origin
    FROM c FULL JOIN o ON c_custkey = o_custkey
    ORDER BY custkey"""

  /** Grouped weighted mean (pandas `np.average(values, weights=…)` per
    * group): Σ(wᵢ·vᵢ)/Σwᵢ with price in exact integer cents and integer
    * quantity weights — both sums accumulate exactly in any order, the
    * single final division is the only float op (same determinism recipe
    * as the plain cents sums). */
  def qWeightedMean(spark: SparkSession, dir: String): DataFrame = {
    val pc = Money.cents(col("l_extendedprice"))
    Tables.lineitem(spark, dir)
      .withColumn("pc", pc)
      .groupBy("l_returnflag", "l_linestatus")
      // pc·qty ≈ 5e8/row: a long weighted sum wraps silently past ~1.8e10
      // rows per group — exact 128-bit accumulator instead (sum_i128,
      // r15 — replacing the r8 Decimal(38,0) cast at ~long-sum speed)
      .agg(ExactAgg.sumI128(col("pc") * col("l_quantity").cast("long"))
          .as("wsum"),
        sum(col("l_quantity").cast("long")).as("w"))
      .select(col("l_returnflag"), col("l_linestatus"),
        (col("wsum").cast("double") / col("w").cast("double") / 100.0)
          .as("wavg_price"),
        col("w").as("total_qty"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val qWeightedMeanOracle: String = """
    WITH e AS (SELECT l_returnflag, l_linestatus,
                      CAST(round(l_extendedprice*100) AS BIGINT) pc,
                      CAST(l_quantity AS BIGINT) q FROM lineitem)
    SELECT l_returnflag, l_linestatus,
           CAST(sum(pc*q) AS DOUBLE) / CAST(sum(q) AS DOUBLE) / 100.0
             AS wavg_price,
           CAST(sum(q) AS BIGINT) AS total_qty
    FROM e GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Winsorization (pandas `clip(lower=q05, upper=q95)` per group — the
    * standard outlier treatment before model features): per-returnflag
    * p05/p95 of extended price via the engine's exact linear-interp
    * quantile kernel, broadcast back (3 rows), and each row clipped with
    * clip-direction flags. Quantile parity with DuckDB is the same
    * identical-formula argument q_quantile establishes; the clip itself
    * is pure comparisons on bit-identical doubles. */
  def qWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val bounds = QuantileOps
      .groupedQuantiles(li, Seq("l_returnflag"), "l_extendedprice", Seq(0.05, 0.95))
      .groupBy("l_returnflag")
      .agg(max(when(col("q") === 0.05, col("linear"))).as("lo"),
        max(when(col("q") === 0.95, col("linear"))).as("hi"))
    li.join(broadcast(bounds), Seq("l_returnflag"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_extendedprice"),
        least(greatest(col("l_extendedprice"), col("lo")), col("hi"))
          .as("price_wins"),
        (col("l_extendedprice") < col("lo")).as("clip_lo"),
        (col("l_extendedprice") > col("hi")).as("clip_hi"))
      .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
  }

  val qWinsorizeOracle: String = """
    WITH nn AS (SELECT l_returnflag, l_extendedprice v,
                       CAST(row_number() OVER (PARTITION BY l_returnflag
                                               ORDER BY l_extendedprice) AS BIGINT) - 1 rn,
                       count(*) OVER (PARTITION BY l_returnflag) n
                FROM lineitem WHERE l_extendedprice IS NOT NULL),
    e AS (SELECT nn.*, q FROM nn CROSS JOIN
            (VALUES (CAST(0.05 AS DOUBLE)), (CAST(0.95 AS DOUBLE))) t(q)),
    g AS (SELECT l_returnflag, q,
                 max(CASE WHEN rn = CAST(floor(q*(n-1)) AS BIGINT) THEN v END) lov,
                 max(CASE WHEN rn = CAST(floor(q*(n-1)) AS BIGINT) + 1 THEN v END) hiv,
                 max(q*(n-1) - floor(q*(n-1))) f
          FROM e
          WHERE rn = CAST(floor(q*(n-1)) AS BIGINT)
             OR rn = CAST(floor(q*(n-1)) AS BIGINT) + 1
          GROUP BY l_returnflag, q),
    lin AS (SELECT l_returnflag, q,
                   CASE WHEN f = 0 THEN lov ELSE lov + (hiv - lov)*f END lin
            FROM g),
    b AS (SELECT l_returnflag,
                 max(CASE WHEN q = 0.05 THEN lin END) lo,
                 max(CASE WHEN q = 0.95 THEN lin END) hi
          FROM lin GROUP BY 1)
    SELECT l_orderkey, l_linenumber, l.l_returnflag, l_extendedprice,
           least(greatest(l_extendedprice, lo), hi) AS price_wins,
           l_extendedprice < lo AS clip_lo,
           l_extendedprice > hi AS clip_hi
    FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
    ORDER BY l_orderkey, l_linenumber, l_extendedprice"""

  /** group_quantile, all five interpolation modes (`src/groupby.rs:1532-1660`). */
  val quantileQs = Seq(0.0, 0.25, 0.5, 0.513, 0.75, 1.0)

  def qQuantile(spark: SparkSession, dir: String): DataFrame =
    QuantileOps.groupedQuantiles(
      Tables.lineitem(spark, dir), Seq("l_returnflag", "l_linestatus"),
      "l_quantity", quantileQs)
      .orderBy(col("l_returnflag"), col("l_linestatus"), col("q"))

  val qQuantileOracle: String = {
    // CAST: DuckDB types bare VALUES decimals as DECIMAL, which keeps
    // q*(n-1) exact and diverges from Spark's double arithmetic by an ulp
    val qsVals = quantileQs.map(q => s"(CAST($q AS DOUBLE))").mkString(",")
    val idx    = "CAST(floor(q*(n-1)) AS BIGINT)"
    s"""
    WITH nn AS (
      SELECT l_returnflag, l_linestatus, l_quantity v,
             CAST(row_number() OVER (PARTITION BY l_returnflag, l_linestatus
                                     ORDER BY l_quantity) AS BIGINT) - 1 rn,
             count(*) OVER (PARTITION BY l_returnflag, l_linestatus) n
      FROM lineitem WHERE l_quantity IS NOT NULL),
    e AS (SELECT nn.*, q FROM nn CROSS JOIN (VALUES $qsVals) t(q)),
    g AS (SELECT l_returnflag, l_linestatus, q,
                 max(CASE WHEN rn = $idx THEN v END) lov,
                 max(CASE WHEN rn = $idx + 1 THEN v END) hiv,
                 max(q*(n-1) - floor(q*(n-1))) f
          FROM e WHERE rn = $idx OR rn = $idx + 1
          GROUP BY l_returnflag, l_linestatus, q)
    SELECT l_returnflag, l_linestatus, q,
           CASE WHEN f = 0 THEN lov ELSE lov + (hiv - lov)*f END AS linear,
           lov AS lower,
           CASE WHEN f = 0 THEN lov ELSE hiv END AS higher,
           CASE WHEN f = 0 THEN lov
                WHEN f > 0.5 OR (f = 0.5 AND q > 0.5) THEN hiv
                ELSE lov END AS nearest,
           CASE WHEN f = 0 THEN lov ELSE (lov + hiv)/2 END AS midpoint
    FROM g ORDER BY l_returnflag, l_linestatus, q"""
  }

  /** group_median_float64 (`src/groupby.rs:114-184`) — linear q=0.5. */
  def qMedian(spark: SparkSession, dir: String): DataFrame =
    QuantileOps.groupedMedian(
      Tables.lineitem(spark, dir), Seq("l_suppkey"), "l_quantity")
      .orderBy("l_suppkey")

  val qMedianOracle: String = """
    WITH nn AS (
      SELECT l_suppkey, l_quantity v,
             CAST(row_number() OVER (PARTITION BY l_suppkey ORDER BY l_quantity) AS BIGINT) - 1 rn,
             count(*) OVER (PARTITION BY l_suppkey) n
      FROM lineitem WHERE l_quantity IS NOT NULL),
    g AS (SELECT l_suppkey,
                 max(CASE WHEN rn = CAST(floor(0.5*(n-1)) AS BIGINT) THEN v END) lov,
                 max(CASE WHEN rn = CAST(floor(0.5*(n-1)) AS BIGINT) + 1 THEN v END) hiv,
                 max(0.5*(n-1) - floor(0.5*(n-1))) f
          FROM nn WHERE rn = CAST(floor(0.5*(n-1)) AS BIGINT)
                     OR rn = CAST(floor(0.5*(n-1)) AS BIGINT) + 1
          GROUP BY l_suppkey)
    SELECT l_suppkey, CASE WHEN f = 0 THEN lov ELSE lov + (hiv - lov)*f END AS median
    FROM g ORDER BY l_suppkey"""

  /** group_any_all with Kleene logic (`src/groupby.rs:698-784`). */
  def qAnyAll(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("p",
        when(col("l_quantity") > 45, lit(true))
          .when(col("l_orderkey") % 11 === 0, lit(null).cast("boolean"))
          .otherwise(lit(false)))
      .groupBy("l_suppkey", "l_linenumber")
      .agg(
        GroupedOps.any(col("p")).as("any_p"),
        GroupedOps.all(col("p")).as("all_p"),
        GroupedOps.any(col("p"), skipna = false).as("any_kleene"),
        GroupedOps.all(col("p"), skipna = false).as("all_kleene"),
        expr("count(*) FILTER (WHERE p IS NULL)").as("n_null"),
        count(lit(1)).as("n"))
      .orderBy("l_suppkey", "l_linenumber")

  val qAnyAllOracle: String = """
    WITH c AS (SELECT l_suppkey, l_linenumber,
                      CASE WHEN l_quantity > 45 THEN TRUE
                           WHEN l_orderkey % 11 = 0 THEN NULL
                           ELSE FALSE END p FROM lineitem)
    SELECT l_suppkey, l_linenumber, bool_or(p) AS any_p, bool_and(p) AS all_p,
           CASE WHEN bool_or(p) = TRUE THEN TRUE
                WHEN count(*) > count(p) THEN NULL
                ELSE FALSE END AS any_kleene,
           CASE WHEN bool_and(p) = FALSE THEN FALSE
                WHEN count(*) > count(p) THEN NULL
                ELSE TRUE END AS all_kleene,
           count(*) FILTER (WHERE p IS NULL) AS n_null, count(*) AS n
    FROM c GROUP BY l_suppkey, l_linenumber ORDER BY l_suppkey, l_linenumber"""

  /** count / count distinct (the `counts` output every kernel fills,
    * `src/groupby.rs:875`). */
  def qCountDistinct(spark: SparkSession, dir: String): DataFrame =
    // fanout tested and REJECTED here (r17): widening the single-split
    // scan before the 3x count-distinct Expand measured 1.7 -> 3.3 s at
    // sf0.1 — the round-robin exchange of the raw rows costs more than
    // the one-core expansion saves because the Expand's partial aggregate
    // contracts 1.8M expanded rows to ~distinct-keys BEFORE the shuffle
    // either way, and the extra exchange defeats that contraction's
    // locality. Left single-pass as planned.
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        countDistinct(col("l_orderkey")).as("nd_order"))
      .orderBy("l_returnflag")

  val qCountDistinctOracle: String = """
    SELECT l_returnflag, count(*) AS n, count(DISTINCT l_partkey) AS nd_part,
           count(DISTINCT l_suppkey) AS nd_supp, count(DISTINCT l_orderkey) AS nd_order
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** JSON payload extraction + aggregation over `events.props`. */
  def qJson(spark: SparkSession, dir: String): DataFrame =
    // fanout (r17): get_json_object is a full JSON parse per row and the
    // fixture events file is one input split — the parse stage ran on one
    // core (no-op on multi-split cluster inputs)
    graft.ops.Phase.fanout(Tables.events(spark, dir))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
        count(col("k")).as("n_k"))
      .orderBy("event_type")

  val qJsonOracle: String = """
    WITH c AS (SELECT event_type, CAST(props->>'$.k' AS BIGINT) k FROM events)
    SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k, count(k) AS n_k
    FROM c GROUP BY event_type ORDER BY event_type"""

  /** Kahan-compensated sum/mean via the custom `KahanSum`
    * DeclarativeAggregate (numeric fidelity with `group_mean`'s
    * compensated accumulator, `src/groupby.rs:1325-1337`).
    *
    * The summands are constructed so the oracle match is PROVABLE, not
    * just observed: v = cents + k·2⁻²⁰ with cents < 2²⁴ and k < 2³, so
    * every summand is exactly representable (44 bits), every per-add
    * rounding error is a small multiple of 2⁻²⁰ that the Neumaier
    * compensation term holds exactly (|comp| < 2⁸ ⇒ 28 bits), and the
    * final s + comp is therefore ONE correct rounding of the exact
    * rational total. The oracle computes the same total exactly as a
    * HUGEINT in 2⁻²⁰-cent units; CAST to DOUBLE rounds once and the
    * division by the power of two 2²⁰ is exact — the same single
    * rounding. A naive double sum drops the 2⁻²⁰ tails once the running
    * sum passes 2³³ (KahanSumSpec demonstrates the divergence). */
  def qKahan(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.lineitem(spark, dir)
      .withColumn("v", cents("l_extendedprice").cast("double")
        + (col("l_orderkey") % 8).cast("double") / 1048576.0)
      .groupBy("l_returnflag")
      .agg(
        expr("kahan_sum(v)").as("ksum_c"),
        (expr("kahan_sum(v)") / count(lit(1))).as("kmean_c"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  val qKahanOracle: String = """
    WITH c AS (SELECT l_returnflag,
                      CAST(round(l_extendedprice*100) AS HUGEINT) * 1048576
                        + (l_orderkey % 8) s
               FROM lineitem)
    SELECT l_returnflag,
           CAST(sum(s) AS DOUBLE)/1048576.0 AS ksum_c,
           CAST(sum(s) AS DOUBLE)/1048576.0/CAST(count(*) AS DOUBLE) AS kmean_c,
           count(*) AS n
    FROM c GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Grouped mode (most frequent value, ties → smallest value — pandas
    * `mode().iloc[0]`) and value_counts top-1: two-phase count + window
    * argmin, no per-group buffering. */
  def qMode(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("cnt").desc, col("l_quantity").asc)
    counts.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
        col("cnt").as("mode_n"))
      .orderBy("l_returnflag")
  }

  val qModeOracle: String = """
    WITH c AS (SELECT l_returnflag, l_quantity, count(*) cnt
               FROM lineitem GROUP BY 1, 2),
    r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                       ORDER BY cnt DESC, l_quantity) rn FROM c)
    SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_n
    FROM r WHERE rn = 1 ORDER BY l_returnflag"""

  /** Null group keys: pandas drops them (`lab < 0` skip, reference
    * `src/groupby.rs:937-939`); SQL keeps a null group. Both behaviors,
    * side by side, over injected null keys. */
  def qDropNaKeys(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumn("k", when(col("l_orderkey") % 13 =!= 0, col("l_returnflag")))
    val dropped = GroupedOps.groupByDropNa(li, Seq(col("k")))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .withColumn("mode", lit("dropna"))
    val kept = GroupedOps.groupByDropNa(li, Seq(col("k")), dropna = false)
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .withColumn("mode", lit("keepna"))
    dropped.unionByName(kept).select("mode", "k", "sum_qty", "n")
      .orderBy("mode", "k")
  }

  val qDropNaKeysOracle: String = """
    WITH c AS (SELECT CASE WHEN l_orderkey % 13 <> 0 THEN l_returnflag END k,
                      l_quantity
               FROM lineitem)
    SELECT 'dropna' AS mode, k, sum(l_quantity) AS sum_qty, count(*) AS n
    FROM c WHERE k IS NOT NULL GROUP BY k
    UNION ALL
    SELECT 'keepna' AS mode, k, sum(l_quantity) AS sum_qty, count(*) AS n
    FROM c GROUP BY k
    ORDER BY mode, k"""

  /** List aggregation (pandas `groupby.agg(list)` / SQL array_agg):
    * per-user event cents collected, explicitly sorted (collect_list's
    * arrival order is partition-dependent — sort_array makes the result
    * deterministic), and compared via scalar derivations (size, ends, an
    * md5 digest of the joined values) so the differential compare sees
    * engine-neutral scalars instead of engine-formatted arrays. */
  def qCollect(spark: SparkSession, dir: String): DataFrame = {
    val c      = Money.cents(col("value"))
    val sorted = sort_array(collect_list(c))
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        size(sorted).cast("long").as("n"),
        element_at(sorted, 1).as("smallest"),
        element_at(sorted, -1).as("largest"),
        md5(concat_ws(",", transform(sorted, x => x.cast("string")))).as("digest"))
      .orderBy("user_id")
  }

  val qCollectOracle: String = """
    WITH c AS (SELECT user_id, CAST(round(value*100) AS BIGINT) c FROM events)
    SELECT user_id, count(c) AS n, min(c) AS smallest, max(c) AS largest,
           md5(string_agg(CAST(c AS VARCHAR), ',' ORDER BY c)) AS digest
    FROM c GROUP BY user_id ORDER BY user_id"""

  /** Cube subtotals: every grouping-set combination — adds the
    * status-only margin rollup cannot produce; same single Expand-fed
    * aggregation pass. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  val qCubeOracle: String = """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           sum(l_quantity) AS sum_qty,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag, l_linestatus"""

  /** Grouped covariance/correlation (pandas `groupby.cov/corr`) from
    * exact power sums over integer-valued summands (quantity, discount
    * cents) — one hash-agg pass, no second scan, and the identical
    * explicit formula on the oracle side (built-in corr() algorithms
    * differ between engines and would not hash-match). Nulls injected on
    * one side exercise the pairwise-complete contract. */
  def qCorr(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity")
    val y = cents("l_discount")
    Tables.lineitem(spark, dir)
      .withColumn("x", x)
      .withColumn("y", when(col("l_orderkey") % 17 =!= 0, y))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(when(col("x").isNotNull && col("y").isNotNull, lit(1))).as("n_pair"),
        GroupedOps.covExact(col("x"), col("y"), 1).as("cov1"),
        GroupedOps.covExact(col("x"), col("y"), 0).as("cov0"),
        GroupedOps.corrExact(col("x"), col("y")).as("corr"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val qCorrOracle: String = """
    WITH c AS (SELECT l_returnflag, l_linestatus, l_quantity x,
                      CASE WHEN l_orderkey % 17 <> 0
                           THEN CAST(round(l_discount*100) AS BIGINT) END y
               FROM lineitem),
    p AS (SELECT l_returnflag, l_linestatus,
                 CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x END xa,
                 CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN y END ya
          FROM c),
    s AS (SELECT l_returnflag, l_linestatus,
                 CAST(count(xa) AS DOUBLE) n,
                 CAST(sum(xa) AS DOUBLE) sx, CAST(sum(ya) AS DOUBLE) sy,
                 CAST(sum(xa*xa) AS DOUBLE) sxx, CAST(sum(ya*ya) AS DOUBLE) syy,
                 CAST(sum(xa*ya) AS DOUBLE) sxy,
                 count(xa) np
          FROM p GROUP BY l_returnflag, l_linestatus)
    SELECT l_returnflag, l_linestatus, np AS n_pair,
           CASE WHEN n - 1 <= 0 THEN NULL
                ELSE (sxy - sx*sy/n)/(n - 1) END AS cov1,
           CASE WHEN n <= 0 THEN NULL
                ELSE (sxy - sx*sy/n)/n END AS cov0,
           CASE WHEN n < 2 OR n*sxx - sx*sx <= 0 OR n*syy - sy*sy <= 0 THEN NULL
                ELSE (n*sxy - sx*sy)/sqrt((n*sxx - sx*sx)*(n*syy - sy*sy)) END AS corr
    FROM s ORDER BY l_returnflag, l_linestatus"""

  /** Rollup subtotals (pandas pivot_table margins / SQL ROLLUP): per
    * (flag, status), per flag, and grand total in ONE aggregation pass —
    * Catalyst's Expand feeds a single hash-agg, not three scans. */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  val qRollupOracle: String = """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           sum(l_quantity) AS sum_qty,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag, l_linestatus"""

  /** Sketch-based approximate aggregates — the 100 TB substitutes for
    * exact distinct/quantile (HLL++ and KLL-style). The estimates
    * themselves are engine-specific by construction, so the DECLARED
    * output emits oracle-checkable facts instead: the exact distinct
    * count (reproducible in DuckDB) plus Spark-side booleans asserting
    * each sketch landed inside its published error bound —
    * `nd_within_bound`: |HLL − exact| ≤ max(3, 0.15·exact) (3× the
    * default 5% rsd plus an absolute floor so tiny groups can't flake a
    * correct sketch);
    * `med_within_bound`: the approx median's VALUE lies between the exact
    * 0.40 and 0.60 quantiles (approx_percentile(accuracy=1000)
    * guarantees rank error ≤ 1/1000 ≪ this ±0.10 window), OR the group
    * has fewer rows than the sketch accuracy — in that regime
    * approx_percentile holds every sample and is exact by construction,
    * while an INTERPOLATED quantile window around a sparse group can
    * exclude every actual data value (e.g. p49..p51 of {1,2,3,100} is
    * [2.47, 2.53], containing no element), so the window test only
    * applies where approximation actually happens. The oracle asserts
    * both booleans TRUE — a sketch regression flips a bit and fails the
    * hash, without ever pretending estimates match across engines.
    * SketchSpec still pins the numeric error bounds. */
  /** Raw sketch estimates next to their exact references — what
    * SketchSpec pins numerically; [[qApprox]] reduces it to the
    * oracle-checkable shape. The p40/p60 window bounds come from a
    * 10×-higher-accuracy quantile sketch (rank error ≤ 1e-4·n), NOT the
    * exact `percentile()` aggregate — exact percentile buffers every
    * group value in executor memory, which OOM'd the sf10 run (60M rows)
    * and is a non-starter at 100 TB. Sketch memory scales ~1/ε, so the
    * window accuracy is sized to the job: 1e-4 rank error is 1000×
    * tighter than the ±0.10 band it checks while its summaries stay a
    * few hundred KB per group.
    *
    * The exact count-distinct runs as its OWN aggregation joined back on
    * the (tiny) group key: Spark's distinct-aggregate rewrite computes
    * every co-grouped non-distinct function's partial over
    * (group, distinct-col) keys, so mixing countDistinct with the
    * imperative sketch buffers materializes an HLL + three quantile
    * summaries PER DISTINCT PART KEY (~2M × ~10 KB at sf10 — the OOM the
    * single-agg form hit at 24 GB). Split, each side is bounded: sketch
    * buffers per FLAG, and the distinct agg's per-key state is bytes. */
  def qApproxRaw(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val sketches = li.groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        approx_count_distinct(col("l_partkey")).as("approx_nd"),
        approx_percentile(col("l_quantity"), lit(0.5), lit(1000)).as("amed"),
        // one summaries object serves both bounds (array form) — two
        // scalar calls would build and merge the sketch twice
        approx_percentile(col("l_quantity"), array(lit(0.40), lit(0.60)),
          lit(10000)).as("qb"))
      .withColumn("qlo", element_at(col("qb"), 1))
      .withColumn("qhi", element_at(col("qb"), 2))
      .drop("qb")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_nd_part"))
    sketches.join(exact, Seq("l_returnflag"))
  }

  def qApprox(spark: SparkSession, dir: String): DataFrame =
    qApproxRaw(spark, dir)
      .select(col("l_returnflag"), col("exact_nd_part"),
        (abs(col("approx_nd") - col("exact_nd_part")).cast("double") <=
          greatest(lit(3.0), col("exact_nd_part").cast("double") * 0.15))
          .as("nd_within_bound"),
        ((col("amed") >= col("qlo") && col("amed") <= col("qhi")) ||
          col("n_rows") < 1000).as("med_within_bound"))
      .orderBy("l_returnflag")

  val qApproxOracle: String = """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_nd_part,
           TRUE AS nd_within_bound,
           TRUE AS med_within_bound
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Per-group ordinary-least-squares fit (pandas/sklearn `fit` per
    * group, SQL `regr_slope`/`regr_intercept` semantics, reimplemented
    * over exact integer power sums like q_corr): one hash-agg produces
    * the five sufficient statistics, the closed-form slope/intercept is
    * computed in double with an identical formula on both engines. */
  def qRegr(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), cents("l_quantity").as("xc"),
        cents("l_extendedprice").as("yc"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum("xc").cast("double").as("sx"),
        // Σyc (price cents ≤ 1.05e7/row over 3 groups) and the cents
        // products (≈1e7–1e10/row) all outgrow a long inside the 100 TB
        // design point — exact 128-bit sums (r15 sweep, PLANS.md)
        ExactAgg.sumI128(col("yc")).cast("double").as("sy"),
        ExactAgg.sumI128(col("xc") * col("xc")).cast("double").as("sxx"),
        ExactAgg.sumI128(col("xc") * col("yc")).cast("double").as("sxy"))
      .select(col("l_returnflag"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
        (((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
          col("n")) / 100.0).as("intercept"))
      .orderBy("l_returnflag")

  val qRegrOracle: String = """
    WITH c AS (SELECT l_returnflag,
                      CAST(round(l_quantity*100) AS BIGINT) xc,
                      CAST(round(l_extendedprice*100) AS BIGINT) yc
               FROM lineitem),
    s AS (SELECT l_returnflag, count(*) AS n,
                 CAST(sum(xc) AS DOUBLE) sx, CAST(sum(yc) AS DOUBLE) sy,
                 CAST(sum(xc*xc) AS DOUBLE) sxx, CAST(sum(xc*yc) AS DOUBLE) sxy
          FROM c GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           (n*sxy - sx*sy)/(n*sxx - sx*sx) AS slope,
           ((sy - ((n*sxy - sx*sy)/(n*sxx - sx*sx))*sx)/n)/100.0 AS intercept
    FROM s ORDER BY l_returnflag"""

  /** Iceberg / heavy-hitter aggregation: parts whose share of global
    * quantity is ≥1.2× the mean part share — a scale-free threshold, so
    * the query selects a stable fraction of groups at any SF. The
    * comparison stays in exact integer space
    * (`part_qc * n_parts * 5 >= total_qc * 6`), the global total is a
    * broadcast scalar, and the candidate set comes from ONE hash-agg over
    * the fact table — the classic a-priori iceberg shape with no second
    * scan. */
  def qIceberg(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), cents("l_quantity").as("qc"))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n"), sum("qc").as("part_qc"))
    val tot = broadcast(per.agg(
      sum("part_qc").as("total_qc"), count(lit(1)).as("n_parts")))
    per.crossJoin(tot)
      .where(col("part_qc") * col("n_parts") * 5 >= col("total_qc") * 6)
      .select(col("l_partkey"), col("n"),
        (col("part_qc").cast("double") / 100.0).as("part_qty"),
        ((col("part_qc") * col("n_parts")).cast("double") /
          col("total_qc").cast("double")).as("rel_share"))
      .orderBy("l_partkey")
  }

  val qIcebergOracle: String = """
    WITH c AS (SELECT l_partkey,
                      CAST(round(l_quantity*100) AS BIGINT) qc FROM lineitem),
    p AS (SELECT l_partkey, count(*) AS n,
                 CAST(sum(qc) AS BIGINT) AS part_qc FROM c GROUP BY 1),
    t AS (SELECT CAST(sum(part_qc) AS BIGINT) AS total_qc,
                 count(*) AS n_parts FROM p)
    SELECT l_partkey, n,
           CAST(part_qc AS DOUBLE)/100.0 AS part_qty,
           CAST(part_qc * n_parts AS DOUBLE)/CAST(total_qc AS DOUBLE) AS rel_share
    FROM p CROSS JOIN t
    WHERE part_qc * n_parts * 5 >= total_qc * 6
    ORDER BY l_partkey"""

  /** pandas idxmin/idxmax per group (SQL arg_min/arg_max) with an
    * explicit deterministic tiebreak: cents values DO tie, and plain
    * `max_by`/`arg_max` pick an arbitrary winner among ties on both
    * engines — so both sides resolve ties identically via the
    * (value, event_id) total order. One window sort feeds both extremes
    * (rn=1 / rn=n), then a conditional hash-agg collapses the group. */
  def qIdxMinMax(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("c"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("c", Money.cents(col("value")))
      .withColumn("rn", row_number().over(w))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .groupBy("event_type")
      .agg(
        min(when(col("rn") === 1, col("event_id"))).as("idxmin"),
        (min(when(col("rn") === 1, col("c"))).cast("double") / 100.0).as("min_v"),
        min(when(col("rn") === col("nn"), col("event_id"))).as("idxmax"),
        (min(when(col("rn") === col("nn"), col("c"))).cast("double") / 100.0).as("max_v"))
      .orderBy("event_type")
  }

  val qIdxMinMaxOracle: String = """
    WITH e AS (SELECT event_type, event_id,
                      CAST(round(value*100) AS BIGINT) AS c FROM events),
    r AS (SELECT event_type, event_id, c,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY c, event_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS nn
          FROM e)
    SELECT event_type,
           min(CASE WHEN rn = 1 THEN event_id END) AS idxmin,
           CAST(min(CASE WHEN rn = 1 THEN c END) AS DOUBLE)/100.0 AS min_v,
           min(CASE WHEN rn = nn THEN event_id END) AS idxmax,
           CAST(min(CASE WHEN rn = nn THEN c END) AS DOUBLE)/100.0 AS max_v
    FROM r GROUP BY 1 ORDER BY 1"""

  /** One-hot encoding (pandas get_dummies / OneHotEncoder): the category
    * set here is the fixture's closed lang vocabulary, so the dummy
    * columns are static and the encode is a pure codegen projection —
    * the 100 TB path for open vocabularies is the same projection after a
    * distinct-collect of the category dictionary (tiny, broadcast). Also
    * aggregates the dummies per source (the usual next step), proving the
    * encode feeds map-side combine. */
  def qOnehot(spark: SparkSession, dir: String): DataFrame = {
    val langs = Seq("en", "es", "zh", "de", "fr")
    val docs = Tables.documents(spark, dir)
    val dummies = langs.map(l =>
      when(col("lang") === l, 1L).otherwise(0L).as(s"lang_$l"))
    docs.select(col("source") +: dummies: _*)
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        langs.map(l => sum(col(s"lang_$l")).as(s"n_$l")): _*)
      .orderBy("source")
  }

  val qOnehotOracle: String = """
    SELECT source, count(*) AS n,
           CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
           CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
           CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_zh,
           CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
           CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr
    FROM documents GROUP BY source ORDER BY source"""

  /** Arbitrary GROUPING SETS — the general form of rollup/cube (pandas
    * pivot_table with selected margins): per-flag, per-status, and grand
    * total in ONE Expand-fed aggregation pass over the fact table, not
    * three scans. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_li_gs")
    spark.sql("""
      SELECT l_returnflag, l_linestatus, count(*) AS n,
             sum(l_quantity) AS sum_qty,
             CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid
      FROM graft_li_gs
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY gid, l_returnflag, l_linestatus""")
  }

  val qGroupingSetsOracle: String = """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           sum(l_quantity) AS sum_qty,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY gid, l_returnflag, l_linestatus"""

  /** Weighted (lower) median per group — the weighted-percentile kernel
    * importance-weighted sampling pipelines need (numpy's weighted
    * quantile; no pandas built-in). Weights are fixture-derived integers,
    * the running weight is one partitioned window cumsum over the
    * (value, id) total order, and the pick is `min(v | 2·cumw ≥ totw)` —
    * all integer compares, so engines can't diverge on tie handling. */
  def qWeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("c"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("event_type"))
    Tables.events(spark, dir)
      .withColumn("c", Money.cents(col("value")))
      .withColumn("wt", (col("event_id") % 7 + 1).cast("long"))
      .withColumn("cumw", sum(col("wt")).over(w))
      .withColumn("totw", sum(col("wt")).over(wAll))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max("totw").as("tot_weight"),
        (min(when(col("cumw") * 2 >= col("totw"), col("c"))).cast("double") / 100.0)
          .as("weighted_median"))
      .orderBy("event_type")
  }

  val qWeightedMedianOracle: String = """
    WITH e AS (SELECT event_type, event_id,
                      CAST(round(value*100) AS BIGINT) AS c,
                      event_id % 7 + 1 AS wt FROM events),
    r AS (SELECT event_type, c, wt,
                 sum(wt) OVER (PARTITION BY event_type ORDER BY c, event_id
                               ROWS UNBOUNDED PRECEDING) AS cumw,
                 sum(wt) OVER (PARTITION BY event_type) AS totw
          FROM e)
    SELECT event_type, count(*) AS n,
           CAST(max(totw) AS BIGINT) AS tot_weight,
           CAST(min(CASE WHEN cumw * 2 >= totw THEN c END) AS DOUBLE)/100.0
             AS weighted_median
    FROM r GROUP BY 1 ORDER BY 1"""

  /** Pairwise correlation matrix (pandas `df.corr()`) over the four
    * lineitem measures, melted to (var_a, var_b, n, corr) rows. ONE scan
    * and ONE reduce-to-a-row aggregate computes all 14 exact integer power
    * sums (whole-unit price quantization keeps Σprice² inside a long past
    * 10⁸ rows); the 6 upper-triangle pairs unpivot from that single row,
    * so the plan is scan → partial agg → 1-row final agg → projection —
    * no per-pair scans, no joins. */
  def qCorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val measures = Seq(
      "qty"   -> round(col("l_quantity")).cast("long"),
      "price" -> round(col("l_extendedprice")).cast("long"),
      "disc"  -> Money.cents(col("l_discount")),
      "tax"   -> Money.cents(col("l_tax")))
    val base = Tables.lineitem(spark, dir)
      .select(measures.map { case (n, c) => c.as(n) }: _*)
    val names = measures.map(_._1)
    // The squared/cross products (price² ≈ 1e10 per row) wrap a long
    // accumulator past ~1e9 rows, and even the plain Σprice has only ~17×
    // headroom at the 100 TB design point — every accumulator of this
    // one-pass agg therefore runs in the exact 128-bit sum (sum_i128;
    // r15 — replacing the r13 Decimal(38,0) casts at ~long-sum speed).
    val sums =
      count(lit(1)).as("n") +:
        (names.map(a => ExactAgg.sumI128(col(a)).as(s"s_$a")) ++
          names.map(a => ExactAgg.sumI128(col(a) * col(a)).as(s"ss_$a")) ++
          names.combinations(2).map { case Seq(a, b) =>
            ExactAgg.sumI128(col(a) * col(b)).as(s"sp_${a}_$b")
          }.toSeq)
    val one = base.agg(sums.head, sums.tail: _*)
    val pairRows = names.combinations(2).map { case Seq(a, b) =>
      s"'$a', '$b', s_$a, s_$b, ss_$a, ss_$b, sp_${a}_$b"
    }.mkString(", ")
    // n·Σx² for the price pairs tops 5e20 at sf0.1 — past long range, so
    // the closed-form variance/covariance numerators run in Decimal(38,0)
    // (exact, mirrors the oracle's HUGEINT) and convert to double only for
    // the final sqrt/division
    val dec = "decimal(38,0)"
    def d(c: Column) = c.cast(dec)
    one.select(col("n"), expr(
        s"stack(6, $pairRows) as (var_a, var_b, sx, sy, sxx, syy, sxy)"))
      .select(col("var_a"), col("var_b"), col("n"),
        ((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))).cast("double") /
          (sqrt((d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))).cast("double")) *
            sqrt((d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))).cast("double"))))
          .as("corr"))
      .orderBy("var_a", "var_b")
  }

  val qCorrMatrixOracle: String = """
    WITH b AS (SELECT CAST(round(l_quantity) AS BIGINT) qty,
                      CAST(round(l_extendedprice) AS BIGINT) price,
                      CAST(round(l_discount*100) AS BIGINT) disc,
                      CAST(round(l_tax*100) AS BIGINT) tax FROM lineitem),
    a AS (SELECT count(*) n,
      sum(qty) s_qty, sum(price) s_price, sum(disc) s_disc, sum(tax) s_tax,
      sum(qty*qty) ss_qty, sum(price*price) ss_price,
      sum(disc*disc) ss_disc, sum(tax*tax) ss_tax,
      sum(qty*price) sp_qty_price, sum(qty*disc) sp_qty_disc,
      sum(qty*tax) sp_qty_tax, sum(price*disc) sp_price_disc,
      sum(price*tax) sp_price_tax, sum(disc*tax) sp_disc_tax
      FROM b),
    p AS (
      SELECT 'qty' var_a, 'price' var_b, n, s_qty sx, s_price sy,
             ss_qty sxx, ss_price syy, sp_qty_price sxy FROM a
      UNION ALL SELECT 'qty', 'disc', n, s_qty, s_disc, ss_qty, ss_disc, sp_qty_disc FROM a
      UNION ALL SELECT 'qty', 'tax', n, s_qty, s_tax, ss_qty, ss_tax, sp_qty_tax FROM a
      UNION ALL SELECT 'price', 'disc', n, s_price, s_disc, ss_price, ss_disc, sp_price_disc FROM a
      UNION ALL SELECT 'price', 'tax', n, s_price, s_tax, ss_price, ss_tax, sp_price_tax FROM a
      UNION ALL SELECT 'disc', 'tax', n, s_disc, s_tax, ss_disc, ss_tax, sp_disc_tax FROM a)
    SELECT var_a, var_b, n,
           CAST(n*sxy - sx*sy AS DOUBLE) /
             (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
              sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr
    FROM p ORDER BY var_a, var_b"""

  /** Poisson-bootstrap confidence band for the per-flag mean revenue —
    * error bars on a 100 TB aggregate in ONE scan. The classic resample-B-
    * times bootstrap multiplies the data ×B; the Poisson bootstrap
    * (Chamandy et al. 2012, "Estimating uncertainty for massive data
    * streams") replaces each replicate's multinomial resample with an
    * independent Poisson(1) weight per (row, replicate), so all B
    * replicates ride one pass as conditional sums — here B=16 weighted
    * (Σw·cents, Σw) pairs in a single codegen'd hash aggregate.
    *
    * Determinism: the per-(row, b) weight is an INTEGER threshold lookup
    * on a 32-bit md5 hash (thresholds = ⌊CDF_Poisson(1)(k)·2³²⌋, weights
    * capped at 5 ≈ CDF 0.9994) — no float in the draw, so both engines
    * assign identical weights; replicate means divide the same exact
    * longs and the ±band picks the 2nd/15th of the 16 sorted means
    * (≈87.5% central band). Weight sums stay in long comfortably at any
    * realistic per-group cardinality (5·cents·rows ≲ 10¹⁸ to ~2e9 rows
    * per group; beyond that the cents sums move to Decimal like the
    * other cents queries document). */
  def qBootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val B = 16
    val ts = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L)
    // r17 expression-dedup (guide §1.2 step 2): the weights are PROJECTED
    // once per (row, replicate) BELOW the aggregate. Inlining w(b) in the
    // agg expressions re-embedded the conv(substring(md5(...))) subtree in
    // every CASE arm and both of each replicate's sums — up to 160 md5
    // evaluations per row in the partial-aggregate stage (the plan dump
    // showed the duplication verbatim; runtime subexpr elimination did not
    // close it). One Project of h0..h15 → w0..w15 makes it exactly 16,
    // and CollapseProject provably keeps non-cheap multiply-referenced
    // aliases out of consumers, so the shape survives optimization
    // (pinned in PlanAuditSpec). Same expressions, same values — the
    // oracle SQL is untouched. Measured sf0.1: 5.08 s → 0.71 s.
    def h(b: Int): Column = conv(substring(md5(concat_ws("_",
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
      lit(b))), 1, 8), 16, 10).cast("long")
    def wOf(hc: Column): Column =
      // fold from the LARGEST threshold so the smallest ends up outermost
      // (the CASE must test h < t0 first)
      ts.zipWithIndex.reverse.foldLeft(lit(5L)) { case (acc, (t, k)) =>
        when(hc < t, k.toLong).otherwise(acc)
      }
    val cents = Money.cents(col("l_extendedprice"))
    // fanout BEFORE the 16-way md5 projection: the fixture file arrives in
    // ~2 input splits, serializing ~19 µs/row of hashing on 2 of 32 cores
    // (same failure mode as the r16 one-task minhash); a cluster-scale
    // input already has ≥ parallelism splits and fanout is a no-op there
    val projected = graft.ops.Phase.fanout(Tables.lineitem(spark, dir))
      .select(Seq(col("l_returnflag"), cents.as("cents")) ++
        (0 until B).map(b => h(b).as(s"h$b")): _*)
      .select(Seq(col("l_returnflag"), col("cents")) ++
        (0 until B).map(b => wOf(col(s"h$b")).as(s"w$b")): _*)
    val aggs =
      Seq(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents")) ++
        (0 until B).flatMap(b => Seq(
          sum(col(s"w$b") * col("cents")).as(s"sw$b"),
          sum(col(s"w$b")).as(s"nw$b")))
    // Total expression: a replicate whose Poisson weights all drew 0
    // (possible only for tiny groups) falls back to the unweighted mean —
    // identically on both engines — instead of a NULL/NaN whose sort
    // position differs between Spark (NULLS LAST) and DuckDB list_sort
    // (NULLS FIRST).
    val mean0 =
      col("sum_cents").cast("double") / col("n_rows").cast("double")
    val means = array((0 until B).map(b =>
      when(col(s"nw$b") === 0L, mean0).otherwise(
        col(s"sw$b").cast("double") / col(s"nw$b").cast("double"))): _*)
    projected
      .groupBy(col("l_returnflag"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("l_returnflag"), col("n_rows"),
        (col("sum_cents").cast("double") / col("n_rows").cast("double"))
          .as("mean_cents"),
        element_at(array_sort(means), 2).as("ci_lo_cents"),
        element_at(array_sort(means), B - 1).as("ci_hi_cents"))
      .orderBy("l_returnflag")
  }

  val qBootstrapCiOracle: String = {
    val B = 16
    val ts = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L)
    def w(b: Int): String = {
      val h = s"('0x' || substr(md5(l_orderkey || '_' || l_linenumber || " +
        s"'_' || l_partkey || '_' || $b), 1, 8))::BIGINT"
      val cases = ts.zipWithIndex.map { case (t, k) =>
        s"WHEN $h < $t THEN $k"
      }.mkString(" ")
      s"(CASE $cases ELSE 5 END)"
    }
    val sums = (0 until B).map(b =>
      s"sum(${w(b)} * c) AS sw$b, sum(${w(b)}) AS nw$b").mkString(",\n      ")
    // same totality fallback as the Spark side: nw=0 -> unweighted mean
    val means = (0 until B).map(b =>
      s"CASE WHEN nw$b = 0 THEN sum_cents::DOUBLE / n_rows::DOUBLE " +
        s"ELSE sw$b::DOUBLE / nw$b::DOUBLE END").mkString(", ")
    s"""
    WITH base AS (SELECT l_returnflag, l_orderkey, l_linenumber, l_partkey,
                         CAST(round(l_extendedprice * 100) AS BIGINT) c
                  FROM lineitem),
    agg AS (SELECT l_returnflag, count(*) AS n_rows, sum(c) AS sum_cents,
      $sums
      FROM base GROUP BY l_returnflag)
    SELECT l_returnflag, n_rows,
           sum_cents::DOUBLE / n_rows::DOUBLE AS mean_cents,
           list_sort([$means])[2] AS ci_lo_cents,
           list_sort([$means])[${B - 1}] AS ci_hi_cents
    FROM agg ORDER BY l_returnflag"""
  }

  /** Two-sample A/B comparison (Welch's t) between purchase and click
    * values: per-arm exact integer power sums (n, Σc, Σc²) from ONE
    * conditional-aggregation scan (no per-arm scans), then the t statistic
    * as an identically-shaped double expression on both engines.
    * The unbiased variance comes from the integer identity
    * n·Σx² − (Σx)² = n·(n−1)·s², so both engines divide the same exact
    * longs. */
  def qAbTest(spark: SparkSession, dir: String): DataFrame = {
    def arm(t: String, suf: String): Seq[Column] = {
      val c = when(col("event_type") === t,
        Money.cents(col("value")))
      // Σc² (c² ≤ ~3.1e9/row) would wrap a long at ~2.9e9 rows per arm —
      // far inside the 100 TB design point — so it runs in the exact
      // 128-bit sum (r15 overflow sweep, PLANS.md); Σc (≤5.6e4/row) keeps
      // ~650× long headroom at design scale and stays long
      Seq(count(c).as(s"n$suf"), sum(c).as(s"s$suf"),
        ExactAgg.sumI128(c * c).as(s"ss$suf"))
    }
    val one = Tables.events(spark, dir)
      .agg((arm("purchase", "a") ++ arm("click", "b")).head,
        (arm("purchase", "a") ++ arm("click", "b")).tail: _*)
    def mean(s: Column, n: Column)  = s.cast("double") / n.cast("double")
    // s²/n = (n·Σx² − (Σx)²) / (n²·(n−1)). The numerator and the n²(n−1)
    // term are formed in Decimal(38,0): with cents up to ~2e4 the long
    // n²(n−1) product wraps silently (non-ANSI) once an arm passes ~2.1M
    // rows — exact decimal keeps the 100 TB path honest (same device as
    // qCorrMatrix), and the double conversion happens only at the final
    // division.
    def vOverN(n: Column, s: Column, ss: Column) = {
      val dec = "decimal(38,0)"
      ((n.cast(dec) * ss.cast(dec) - s.cast(dec) * s.cast(dec)).cast("double") /
        (n.cast(dec) * n.cast(dec) * (n - 1).cast(dec)).cast("double"))
    }
    one.select(col("na"), col("nb"),
        (mean(col("sa"), col("na")) / 100.0).as("mean_a"),
        (mean(col("sb"), col("nb")) / 100.0).as("mean_b"),
        ((mean(col("sa"), col("na")) - mean(col("sb"), col("nb"))) /
          sqrt(vOverN(col("na"), col("sa"), col("ssa")) +
            vOverN(col("nb"), col("sb"), col("ssb")))).as("t_welch"))
  }

  val qAbTestOracle: String = """
    WITH a AS (SELECT
        count(CASE WHEN event_type='purchase' THEN 1 END) na,
        count(CASE WHEN event_type='click' THEN 1 END) nb,
        CAST(sum(CASE WHEN event_type='purchase'
                 THEN CAST(round(value*100) AS BIGINT) END) AS BIGINT) sa,
        CAST(sum(CASE WHEN event_type='click'
                 THEN CAST(round(value*100) AS BIGINT) END) AS BIGINT) sb,
        CAST(sum(CASE WHEN event_type='purchase'
                 THEN CAST(round(value*100) AS BIGINT)
                      * CAST(round(value*100) AS BIGINT) END) AS BIGINT) ssa,
        CAST(sum(CASE WHEN event_type='click'
                 THEN CAST(round(value*100) AS BIGINT)
                      * CAST(round(value*100) AS BIGINT) END) AS BIGINT) ssb
      FROM events)
    SELECT na, nb,
      CAST(sa AS DOUBLE)/CAST(na AS DOUBLE)/100.0 mean_a,
      CAST(sb AS DOUBLE)/CAST(nb AS DOUBLE)/100.0 mean_b,
      (CAST(sa AS DOUBLE)/CAST(na AS DOUBLE)
        - CAST(sb AS DOUBLE)/CAST(nb AS DOUBLE)) /
      sqrt(CAST(CAST(na AS HUGEINT)*CAST(ssa AS HUGEINT)
                - CAST(sa AS HUGEINT)*CAST(sa AS HUGEINT) AS DOUBLE)
           / CAST(CAST(na AS HUGEINT)*CAST(na AS HUGEINT)
                  *CAST(na-1 AS HUGEINT) AS DOUBLE)
         + CAST(CAST(nb AS HUGEINT)*CAST(ssb AS HUGEINT)
                - CAST(sb AS HUGEINT)*CAST(sb AS HUGEINT) AS DOUBLE)
           / CAST(CAST(nb AS HUGEINT)*CAST(nb AS HUGEINT)
                  *CAST(nb-1 AS HUGEINT) AS DOUBLE)) t_welch
    FROM a"""
    // HUGEINT (not BIGINT) products: at sf10 na*ssa ≈ 2e20 overflows
    // INT64 and ANSI DuckDB errors out (caught by the r13 full-suite
    // sf10 sweep). The ENGINE side already forms these in Decimal(38,0)
    // (vOverN above) — the oracle now matches it exactly; identical
    // values at every SF (HUGEINT->DOUBLE and Decimal(38)->double both
    // round the same exact integer to nearest).

  /** Top-k rows per group via the custom heap aggregate
    * ([[graft.functions.TopKByValue]], a TypedImperativeAggregate):
    * top-3 events by value per event_type WITHOUT a window sort — the
    * plan is scan → partial heap-agg → k-sized shuffle → final heap-agg →
    * posexplode (PlanAuditSpec pins the no-Window/no-fact-Sort shape).
    * Same results as the row_number() window formulation (the oracle),
    * deterministic under ties via the id ASC tiebreak. */
  def qTopkAgg(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.events(spark, dir)
      .withColumn("c", Money.cents(col("value")))
      .groupBy("event_type")
      .agg(expr("topk_agg(c, event_id, 3)").as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).as("rk"),
        col("col.id").as("event_id"),
        (col("col.v").cast("double") / 100.0).as("value"))
      .orderBy("event_type", "rk")
  }

  val qTopkAggOracle: String = """
    WITH e AS (SELECT event_type, event_id,
                      CAST(round(value*100) AS BIGINT) c FROM events),
    r AS (SELECT event_type, event_id, c,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY c DESC, event_id) rk
          FROM e)
    SELECT event_type, CAST(rk AS INT) rk, event_id,
           CAST(c AS DOUBLE)/100.0 AS value
    FROM r WHERE rk <= 3 ORDER BY event_type, rk"""

  /** Two-sample Kolmogorov–Smirnov statistic (distribution-drift test)
    * between purchase and click value distributions: per distinct cents
    * value the running counts of each arm, D = max |F_a − F_b| kept as
    * the EXACT integer numerator |cum_a·n_b − cum_b·n_a| (one division at
    * the end). The cumulative window is unpartitioned but runs over
    * DISTINCT VALUES — bounded by the value domain (≤ max-cents rows),
    * not the event count, the same spine-bounded argument as the hourly
    * anomaly window. */
  def qKsTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .where(col("event_type").isin("purchase", "click"))
      .select(Money.cents(col("value")).as("c"),
        (col("event_type") === "purchase").cast("long").as("isA"))
    val perV = ev.groupBy("c")
      .agg(sum("isA").as("ca"), sum(lit(1L) - col("isA")).as("cb"))
    val wc = Window.orderBy("c")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    val cum = perV
      .withColumn("cum_a", sum("ca").over(wc))
      .withColumn("cum_b", sum("cb").over(wc))
      .withColumn("na", sum("ca").over(wAll))
      .withColumn("nb", sum("cb").over(wAll))
      .withColumn("num", abs(col("cum_a") * col("nb") - col("cum_b") * col("na")))
    val top = Window.partitionBy().orderBy(col("num").desc, col("c"))
    cum.withColumn("rn", row_number().over(top)).where(col("rn") === 1)
      .select(col("na"), col("nb"), col("num").as("ks_num"),
        (col("num").cast("double") /
          (col("na") * col("nb")).cast("double")).as("ks"),
        (col("c").cast("double") / 100.0).as("ks_at_value"))
  }

  val qKsTestOracle: String = """
    WITH e AS (SELECT CAST(round(value*100) AS BIGINT) c,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END isA
               FROM events WHERE event_type IN ('purchase', 'click')),
    v AS (SELECT c, CAST(sum(isA) AS BIGINT) ca,
                 CAST(sum(1 - isA) AS BIGINT) cb FROM e GROUP BY 1),
    cum AS (SELECT c,
                   CAST(sum(ca) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS BIGINT) cum_a,
                   CAST(sum(cb) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS BIGINT) cum_b,
                   CAST(sum(ca) OVER () AS BIGINT) na,
                   CAST(sum(cb) OVER () AS BIGINT) nb
            FROM v),
    n AS (SELECT *, abs(cum_a*nb - cum_b*na) num FROM cum),
    r AS (SELECT *, row_number() OVER (ORDER BY num DESC, c) rn FROM n)
    SELECT na, nb, num AS ks_num,
           CAST(num AS DOUBLE) / CAST(na*nb AS DOUBLE) AS ks,
           CAST(c AS DOUBLE)/100.0 AS ks_at_value
    FROM r WHERE rn = 1"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_ks_test", qKsTest, Some(qKsTestOracle)),
    QueryDef("q_topk_agg", qTopkAgg, Some(qTopkAggOracle)),
    QueryDef("q_ab_test", qAbTest, Some(qAbTestOracle)),
    QueryDef("q_bootstrap_ci", qBootstrapCi, Some(qBootstrapCiOracle)),
    QueryDef("q_corr_matrix", qCorrMatrix, Some(qCorrMatrixOracle)),
    QueryDef("q1_flagship", q1, Some(q1Oracle)),
    QueryDef("q_kahan_sum", qKahan, Some(qKahanOracle)),
    QueryDef("q_approx_sketch", qApprox, Some(qApproxOracle)),
    QueryDef("q_dropna_keys", qDropNaKeys, Some(qDropNaKeysOracle)),
    QueryDef("q_mode", qMode, Some(qModeOracle)),
    QueryDef("q_rollup", qRollup, Some(qRollupOracle)),
    QueryDef("q_cube", qCube, Some(qCubeOracle)),
    QueryDef("q_corr", qCorr, Some(qCorrOracle)),
    QueryDef("q_collect", qCollect, Some(qCollectOracle)),
    QueryDef("q_sum_mincount", qSumMinCount, Some(qSumMinCountOracle)),
    QueryDef("q_prod", qProd, Some(qProdOracle)),
    QueryDef("q_moments", qMoments, Some(qMomentsOracle)),
    QueryDef("q_minmax", qMinMax, Some(qMinMaxOracle)),
    QueryDef("q_first_last_nth", qFirstLastNth, Some(qFirstLastNthOracle)),
    QueryDef("q_binary_nth", qBinaryNth, Some(qBinaryNthOracle)),
    QueryDef("q_ohlc", qOhlc, Some(qOhlcOracle)),
    QueryDef("q_quantile", qQuantile, Some(qQuantileOracle)),
    QueryDef("q_weighted_mean", qWeightedMean, Some(qWeightedMeanOracle)),
    QueryDef("q_describe", qDescribe, Some(qDescribeOracle)),
    QueryDef("q_merge_indicator", qMergeIndicator, Some(qMergeIndicatorOracle)),
    QueryDef("q_scale", qScale, Some(qScaleOracle)),
    QueryDef("q_winsorize", qWinsorize, Some(qWinsorizeOracle)),
    QueryDef("q_median", qMedian, Some(qMedianOracle)),
    QueryDef("q_anyall", qAnyAll, Some(qAnyAllOracle)),
    QueryDef("q_count_distinct", qCountDistinct, Some(qCountDistinctOracle)),
    QueryDef("q_json", qJson, Some(qJsonOracle)),
    QueryDef("q_regr", qRegr, Some(qRegrOracle)),
    QueryDef("q_iceberg", qIceberg, Some(qIcebergOracle)),
    QueryDef("q_idx_minmax", qIdxMinMax, Some(qIdxMinMaxOracle)),
    QueryDef("q_onehot", qOnehot, Some(qOnehotOracle)),
    QueryDef("q_grouping_sets", qGroupingSets, Some(qGroupingSetsOracle)),
    QueryDef("q_weighted_median", qWeightedMedian, Some(qWeightedMedianOracle)))
}

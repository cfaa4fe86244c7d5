package graft.queries

import graft.Tables
import graft.ops.Money
import graft.ops.{Phase, RelOps, TakeOps}
import graft.ops.Phase._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pack C — positional gather / factorize (SURVEY.md §2.1, §2.5) and the
  * relational capabilities the reference delegates to pandas: joins
  * (broadcast + shuffle), semi/anti joins, set ops, top-k per group, as-of
  * join.
  */
object QueriesRel {

  /** take_1d (`/root/reference/src/lib.rs:37-55`): gather by a positional
    * indexer with −1 → NULL. The indexer is derived deterministically from
    * the documents table itself (fixtures ship no indexer column). */
  def qTake(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val n    = broadcast(docs.agg(count(lit(1)).as("n")))
    val indexer = docs.select(col("doc_id")).crossJoin(n)
      .withColumn("idx",
        when(col("doc_id") % 97 === 0, lit(-1L))
          .otherwise((col("doc_id") * 7 + 13) % col("n")))
      .select("doc_id", "idx")
    val values = docs.select(col("doc_id").as("pos"), col("n_chars"))
    TakeOps.take1d(indexer, "idx", values, "pos")
      .select(col("doc_id"), col("idx"), col("n_chars").as("taken_n_chars"))
      .orderBy("doc_id")
  }

  val qTakeOracle: String = """
    WITH n AS (SELECT count(*) n FROM documents),
    idxr AS (SELECT doc_id,
                    CASE WHEN doc_id % 97 = 0 THEN -1
                         ELSE (doc_id * 7 + 13) % n END idx
             FROM documents CROSS JOIN n)
    SELECT idxr.doc_id, idx, d2.n_chars AS taken_n_chars
    FROM idxr LEFT JOIN documents d2 ON idx = d2.doc_id
    ORDER BY idxr.doc_id"""

  /** take_1d across the reference's dtype upcast matrix
    * (`/root/reference/src/lib.rs:64-165`): gather embeddings' int32
    * `label` widened to i64 and f64, and its float32 first component
    * widened to f64 — the i8/i16/i32→{i64,f64} and f32→f64 arms on real
    * mixed-dtype columns (forbidden arms, e.g. the commented-out i64→f64,
    * are negative-tested in RelTakeSpec). */
  def qTakeUpcast(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val emb = Tables.embeddings(spark, dir)
    val n   = broadcast(emb.agg(count(lit(1)).as("n")))
    val indexer = emb.select(col("vec_id")).crossJoin(n)
      .withColumn("idx",
        when(col("vec_id") % 31 === 0, lit(-1L))
          .otherwise((col("vec_id") * 3 + 7) % col("n")))
      .select("vec_id", "idx")
    val values = emb.select(col("vec_id").as("pos"), col("label"),
      element_at(col("embedding"), 1).as("e0"))
    TakeOps.take1d(indexer, "idx", values, "pos")
      .select(col("vec_id"), col("idx"),
        TakeOps.widen(col("label"), IntegerType, LongType).as("label_l"),
        TakeOps.widen(col("label"), IntegerType, DoubleType).as("label_d"),
        TakeOps.widen(col("e0"), FloatType, DoubleType).as("e0_d"))
      .orderBy("vec_id")
  }

  val qTakeUpcastOracle: String = """
    WITH n AS (SELECT count(*) n FROM embeddings),
    idxr AS (SELECT vec_id,
                    CASE WHEN vec_id % 31 = 0 THEN -1
                         ELSE (vec_id * 3 + 7) % n END idx
             FROM embeddings CROSS JOIN n)
    SELECT idxr.vec_id, idx,
           CAST(e.label AS BIGINT) AS label_l,
           CAST(e.label AS DOUBLE) AS label_d,
           CAST(e.embedding[1] AS DOUBLE) AS e0_d
    FROM idxr LEFT JOIN embeddings e ON idx = e.vec_id
    ORDER BY idxr.vec_id"""

  /** Key factorization (labels contract, `src/lib.rs:781-783`): distinct
    * keys → dense codes in key order. */
  def qFactorize(spark: SparkSession, dir: String): DataFrame =
    TakeOps.factorize(Tables.lineitem(spark, dir),
        Seq("l_returnflag", "l_linestatus"))
      .orderBy("code")

  val qFactorizeOracle: String = """
    SELECT l_returnflag, l_linestatus,
           CAST(dense_rank() OVER (ORDER BY l_returnflag, l_linestatus) AS BIGINT) - 1 AS code
    FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
    ORDER BY code"""

  /** Star join: fact × dims, revenue per nation (cents-exact).
    *
    * Scale shape: lineitem is pre-aggregated per order BEFORE any join —
    * that collapses ~4 lines/order at the first (and only wide) shuffle,
    * turns `count(DISTINCT o_orderkey)` into a plain `count` (orders are
    * unique per pre-aggregated row, so no distinct-Expand doubling and
    * re-shuffling the joined fact). The orders join is HINTED to a
    * shuffled-hash join: both sides are fact-scaled (SMJ would sort each
    * one — two O(n log n) passes bought nothing, measured ~15% of sf1
    * wall-time), the build side is the narrower orders projection, and
    * per-partition build maps stay bounded because AQE sizes shuffle
    * partitions (and splits skew) before the join runs. The joined rows
    * then collapse AGAIN to customer grain before touching the customer
    * dim, so the dim join and everything after it carries |customers|
    * rows, not |orders|. Dims (customer at small SF, nation, region) are
    * left to AQE's runtime broadcast conversion — customer scales with
    * the fact at 100 TB, so a static broadcast hint would be wrong there;
    * nation/region are constant-size and hinted.
    *
    * Exactness: rev_c is cents·10⁻² integer units, ≤ ~1e9 per line. The
    * per-order and per-customer long sums are safe BY CONSTRUCTION
    * (≤7 lines/order, orders-per-customer fixed by the schema), but the
    * FINAL nation-grain sum crosses group sizes that scale with the
    * corpus: at ~9e9 lines per nation (≈2e11 total rows, well under the
    * 100 TB design point) a long accumulator wraps — so that one
    * accumulator, whose input is already customer-grain (|customers|/25
    * rows, off the hot path), sums in Decimal (r15 overflow sweep,
    * PLANS.md). The two fact-scale aggregations stay long: their group
    * sizes are schema-bounded, which the sweep table records. */
  def qJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        (Money.cents(col("l_extendedprice"))
          * (lit(100L) - Money.cents(col("l_discount")))).as("rev_c"))
      .groupBy("l_orderkey")
      .agg(sum(col("rev_c")).as("rev_c"), count(lit(1)).as("nl"))
    val o   = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c   = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    val perCust = perOrder
      .join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("rev_c")).as("rev_c"), count(lit(1)).as("n_orders"),
        sum(col("nl")).as("nl"))
    perCust.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        // decimal(20,0) summand (per-cust rev_c ≤ ~1.1e12) → decimal(30,0)
        // accumulator: exact to 1e30, vs the long's wrap at ~9e9
        // lines/nation; input here is customer-grain so the cast is off
        // the fact-scan hot path
        (sum(col("rev_c").cast("decimal(20,0)")).cast("double") / 10000.0)
          .as("revenue"),
        sum(col("n_orders")).as("n_orders"),
        sum(col("nl")).as("n_lines"))
      .orderBy("r_name", "n_name")
  }

  val qJoinAggOracle: String = """
    SELECT r_name, n_name,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue,
           count(DISTINCT o_orderkey) AS n_orders,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name ORDER BY r_name, n_name"""

  /** Anti join: customers with no urgent orders, counted per market
    * segment (plain "no orders" is empty at sf0.01 — every customer has
    * orders there). */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_no_orders"),
        min(col("c_custkey")).as("min_custkey"))
      .orderBy("c_mktsegment")

  val qAntiJoinOracle: String = """
    SELECT c_mktsegment, count(*) AS n_no_orders, min(c_custkey) AS min_custkey
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** Semi join: suppliers with at least one max-quantity lineitem. */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .join(Tables.lineitem(spark, dir).where(col("l_quantity") === 50),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy("s_suppkey")

  val qSemiJoinOracle: String = """
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey AND l_quantity = 50)
    ORDER BY s_suppkey"""

  /** Set operations: INTERSECT / EXCEPT / UNION over customer-key sets. */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val rich   = Tables.customer(spark, dir).where(col("c_acctbal") > 7500)
      .select(col("c_custkey").as("k"))
    val urgent = Tables.orders(spark, dir).where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("k")).distinct()
    val inter  = rich.intersect(urgent)
    val exc    = rich.except(urgent)
    val uni    = rich.union(urgent).distinct()
    inter.agg(count(lit(1)).as("n")).withColumn("op", lit("intersect"))
      .unionByName(exc.agg(count(lit(1)).as("n")).withColumn("op", lit("except")))
      .unionByName(uni.agg(count(lit(1)).as("n")).withColumn("op", lit("union")))
      .select("op", "n")
      .orderBy("op")
  }

  val qSetOpsOracle: String = """
    WITH rich AS (SELECT c_custkey k FROM customer WHERE c_acctbal > 7500),
    urgent AS (SELECT DISTINCT o_custkey k FROM orders WHERE o_orderpriority = '1-URGENT')
    SELECT 'intersect' op, count(*) n FROM (SELECT * FROM rich INTERSECT SELECT * FROM urgent)
    UNION ALL
    SELECT 'except' op, count(*) n FROM (SELECT * FROM rich EXCEPT SELECT * FROM urgent)
    UNION ALL
    SELECT 'union' op, count(*) n FROM (SELECT k FROM rich UNION SELECT k FROM urgent)
    ORDER BY op"""

  /** Top-k per group (pandas nlargest): top 3 parts per brand by
    * (retailprice desc, partkey) — window row_number, no global sort. */
  def qTopK(spark: SparkSession, dir: String): DataFrame =
    RelOps.topKPerGroup(Tables.part(spark, dir), Seq("p_brand"),
        Seq(col("p_retailprice").desc, col("p_partkey").asc), 3)
      .select(col("p_brand"), col("rk").cast("long").as("rk"),
        col("p_partkey"), col("p_retailprice"))
      .orderBy("p_brand", "rk")

  val qTopKOracle: String = """
    SELECT p_brand, rk, p_partkey, p_retailprice FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             CAST(row_number() OVER (PARTITION BY p_brand
                                     ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) rk
      FROM part) WHERE rk <= 3 ORDER BY p_brand, rk"""

  /** As-of join (pandas merge_asof): each purchase event picks up the value
    * of the user's latest click at-or-before it. Partitioned-merge plan
    * (graft.plans.AsofMergeJoin): one exchange + one sort PER SIDE, then
    * a streaming two-cursor pass — see RelOps.asofJoin for the
    * formulation choice and the window fallback. */
  def qAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev        = Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("click_value"))
    // no final global orderBy — per-row output keyed by event_id; the
    // presentational sort of the full output measured 2.2× the query at
    // 100M events (SortTaxProbe, SCALE.md "r17: the presentational-sort
    // tax") and the harness compares order-independently
    RelOps.asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
        "click_value", "last_click_value")
      .select("event_id", "user_id", "value", "last_click_value")
  }

  // The oracle carries the matched right ROW as a struct (not the bare
  // payload): as-of matches rows, so a matched row's null payload must
  // propagate instead of being skipped by IGNORE NULLS — pandas
  // merge_asof semantics, and exactly what RelOps.asofJoin computes.
  val qAsofOracle: String = """
    WITH u AS (
      SELECT user_id, ts, 0 AS isr, event_id, value, NULL::DOUBLE AS pay
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, 1 AS isr, NULL AS event_id, NULL::DOUBLE AS value, value AS pay
      FROM events WHERE event_type = 'click'),
    s AS (SELECT *, (last_value(CASE WHEN isr = 1 THEN {'o': ts, 'p': pay} END
                                IGNORE NULLS)
                      OVER (PARTITION BY user_id ORDER BY ts, isr DESC
                            ROWS UNBOUNDED PRECEDING)).p last_click_value
          FROM u)
    SELECT event_id, user_id, value, last_click_value
    FROM s WHERE isr = 0 ORDER BY event_id"""

  /** As-of join, forward + nearest directions (pandas merge_asof
    * direction= parity; q_asof covers backward). */
  def qAsofDir(spark: SparkSession, dir: String): DataFrame = {
    val ev        = Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("click_value"))
    val fwd = RelOps.asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
      "click_value", "next_click_value", direction = "forward")
    RelOps.asofJoin(fwd, clicks, Seq("user_id"), "ts", "ts",
        "click_value", "nearest_click_value", direction = "nearest")
      .select("event_id", "user_id", "value", "next_click_value",
        "nearest_click_value")
      .orderBy("event_id")
  }

  // Struct-carried matches (see qAsofOracle): both the payload and the
  // matched timestamp come from the SAME right row, so a null payload
  // propagates and the nearest tie-break always uses the true match ts.
  val qAsofDirOracle: String = """
    WITH u AS (
      SELECT user_id, ts, 0 AS isr, event_id, value, NULL::DOUBLE AS pay
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, 1 AS isr, NULL AS event_id, NULL::DOUBLE AS value,
             value AS pay
      FROM events WHERE event_type = 'click'),
    s AS (SELECT *,
            last_value(CASE WHEN isr = 1 THEN {'o': ts, 'p': pay} END
                       IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts, isr DESC
                    ROWS UNBOUNDED PRECEDING) bs,
            last_value(CASE WHEN isr = 1 THEN {'o': ts, 'p': pay} END
                       IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts DESC, isr DESC
                    ROWS UNBOUNDED PRECEDING) fs
          FROM u)
    SELECT event_id, user_id, value,
           fs.p AS next_click_value,
           CASE WHEN fs IS NULL THEN bs.p
                WHEN bs IS NULL THEN fs.p
                WHEN ts - bs.o <= fs.o - ts THEN bs.p ELSE fs.p
           END AS nearest_click_value
    FROM s WHERE isr = 0 ORDER BY event_id"""

  /** Pivot (pandas pivot_table): linestatus values become columns, one
    * row per returnflag — Catalyst plans this as a single hash aggregate
    * with conditional sums (no per-value scans). */
  def qPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("l_quantity")))
      .orderBy("l_returnflag")

  val qPivotOracle: String = """
    SELECT l_returnflag,
           sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F,
           sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Melt / unpivot (pandas melt): wide numeric columns to long
    * (id, variable, value) rows — a pure projection + generator, no
    * shuffle. */
  def qMelt(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "variable", "value")
      .orderBy("l_orderkey", "l_linenumber", "variable")

  val qMeltOracle: String = """
    SELECT l_orderkey, l_linenumber, variable, "value" FROM (
      SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable,
             l_quantity AS "value" FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
    ORDER BY l_orderkey, l_linenumber, variable"""

  /** Z-order (Morton) clustering key — the multi-dimensional data-layout
    * primitive behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving the
    * bits of two dimensions gives one sort key under which a range filter
    * on EITHER dimension touches O(√buckets) of the file ranges instead of
    * all of them. The 16-bit interleave is the classic magic-number bit
    * spread — five mask/shift steps per dimension, pure codegen integer
    * ops, identical arithmetic in DuckDB. Output: per-bucket occupancy
    * (the file-skipping histogram a writer would use). */
  def qZorder(spark: SparkSession, dir: String): DataFrame = {
    def spread(v: Column): Column = {
      val v0 = v.bitwiseAND(lit(65535L))
      val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(16711935L))
      val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(252645135L))
      val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(858993459L))
      v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(1431655765L))
    }
    val z = spread(pmod(col("l_partkey"), lit(65536L)))
      .bitwiseOR(shiftleft(spread(pmod(col("l_suppkey"), lit(65536L))), 1))
    Tables.lineitem(spark, dir)
      .withColumn("z", z)
      .withColumn("zbucket", shiftright(col("z"), 14))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n"), min("z").as("min_z"), max("z").as("max_z"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"))
      .orderBy("zbucket")
  }

  val qZorderOracle: String = """
    WITH s AS (
      SELECT l_partkey, l_suppkey,
             l_partkey % 65536 AS x0, l_suppkey % 65536 AS y0 FROM lineitem),
    sx AS (SELECT l_partkey, l_suppkey, y0,
                  ((x0 | (x0 << 8)) & 16711935) AS x1 FROM s),
    sx2 AS (SELECT l_partkey, l_suppkey, y0,
                   ((x1 | (x1 << 4)) & 252645135) AS x2 FROM sx),
    sx3 AS (SELECT l_partkey, l_suppkey, y0,
                   ((x2 | (x2 << 2)) & 858993459) AS x3 FROM sx2),
    sx4 AS (SELECT l_partkey, l_suppkey, y0,
                   ((x3 | (x3 << 1)) & 1431655765) AS xs FROM sx3),
    sy AS (SELECT l_partkey, l_suppkey, xs,
                  ((y0 | (y0 << 8)) & 16711935) AS y1 FROM sx4),
    sy2 AS (SELECT l_partkey, l_suppkey, xs,
                   ((y1 | (y1 << 4)) & 252645135) AS y2 FROM sy),
    sy3 AS (SELECT l_partkey, l_suppkey, xs,
                   ((y2 | (y2 << 2)) & 858993459) AS y3 FROM sy2),
    sy4 AS (SELECT l_partkey, l_suppkey, xs,
                   ((y3 | (y3 << 1)) & 1431655765) AS ys FROM sy3),
    z AS (SELECT l_partkey, (xs | (ys << 1)) AS z FROM sy4)
    SELECT z >> 14 AS zbucket, count(*) AS n,
           CAST(min(z) AS BIGINT) AS min_z, CAST(max(z) AS BIGINT) AS max_z,
           min(l_partkey) AS min_part, max(l_partkey) AS max_part
    FROM z GROUP BY 1 ORDER BY 1"""

  /** Two rounds of PageRank over the part↔supplier bipartite graph
    * (iterative graph analytics — the Pregel-style shape: one shuffle per
    * half-iteration, rank flowing along edges). All rank arithmetic is
    * integer ppm with floor division (`rank div outdeg`, damping
    * `150000 + (85*inflow) div 100`), so the fixpoint math is
    * order-independent and bit-equal across engines — float PageRank
    * would hash-diverge by summation order. Production shape: persist the
    * edge list once and reuse it per iteration; the fixture form leans on
    * the parquet cache since correctness, not iteration count, is under
    * test. Top-50 cut is TakeOrderedAndProject (per-partition heaps). */
  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    // materialize the edge list ONCE (eager lineage cut, same phase-barrier
    // pattern as DedupOps): 4 half-iterations reuse it instead of
    // re-scanning + re-distincting the fact table per join
    val edges = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s")).distinct()
      .phaseCut
    val degP = edges.groupBy("p").agg(count(lit(1)).as("deg_p"))
    val degS = edges.groupBy("s").agg(count(lit(1)).as("deg_s"))
    def suppRound(partRank: DataFrame): DataFrame =
      edges.join(partRank, Seq("p")).join(broadcast(degP), Seq("p"))
        .groupBy("s").agg(sum(expr("rp div deg_p")).as("inflow"))
        .select(col("s"), (lit(150000L) + expr("(85 * inflow) div 100")).as("rs"))
    def partRound(suppRank: DataFrame): DataFrame =
      edges.join(suppRank, Seq("s")).join(broadcast(degS), Seq("s"))
        .groupBy("p").agg(sum(expr("rs div deg_s")).as("inflow"))
        .select(col("p"), (lit(150000L) + expr("(85 * inflow) div 100")).as("rp"))
    val r0 = degP.select(col("p"), lit(1000000L).as("rp"))
    val r1 = partRound(suppRound(r0))
    val r2 = partRound(suppRound(r1))
    r2.select(col("p").as("l_partkey"), col("rp").as("rank_ppm"))
      .orderBy(col("rank_ppm").desc, col("l_partkey")).limit(50)
  }

  val qPagerankOracle: String = """
    WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    dp AS (SELECT p, count(*) AS deg_p FROM e GROUP BY 1),
    ds AS (SELECT s, count(*) AS deg_s FROM e GROUP BY 1),
    r0 AS (SELECT p, CAST(1000000 AS BIGINT) AS rp FROM dp),
    s1 AS (SELECT s, 150000 + (85 * sum(rp // deg_p)) // 100 AS rs
           FROM e JOIN r0 USING (p) JOIN dp USING (p) GROUP BY s),
    p1 AS (SELECT p, 150000 + (85 * sum(rs // deg_s)) // 100 AS rp
           FROM e JOIN s1 USING (s) JOIN ds USING (s) GROUP BY p),
    s2 AS (SELECT s, 150000 + (85 * sum(rp // deg_p)) // 100 AS rs
           FROM e JOIN p1 USING (p) JOIN dp USING (p) GROUP BY s),
    p2 AS (SELECT p, 150000 + (85 * sum(rs // deg_s)) // 100 AS rp
           FROM e JOIN s2 USING (s) JOIN ds USING (s) GROUP BY p)
    SELECT p AS l_partkey, CAST(rp AS BIGINT) AS rank_ppm
    FROM p2 ORDER BY rank_ppm DESC, l_partkey LIMIT 50"""

  /** Join-key skew diagnostics — the measurement pass a 100 TB pipeline
    * runs BEFORE choosing a repartition/salting strategy (the numbers that
    * decide between a plain shuffle join, AQE skew split, or explicit
    * salting, cf. RelOps.saltedAgg). One lineitem scan stacks the three
    * candidate keys into (col_name, key) rows, one hash-agg counts per
    * key, and the hot-key rank is a window PARTITIONED by col_name over
    * the (already aggregated) frequency table. Shares are exact integer
    * ppm; max/mean skew ratio in exact milli (max_cnt·n_keys ≈
    * skew·n_rows, so the milli product stays inside a long up to ~10¹²
    * rows × 1000× skew). */
  def qSkewDiag(spark: SparkSession, dir: String): DataFrame = {
    val byCol = org.apache.spark.sql.expressions.Window
      .partitionBy("col_name").orderBy(col("cnt").desc, col("key"))
    val freq = Tables.lineitem(spark, dir)
      .select(expr("stack(3, 'l_orderkey', l_orderkey, " +
        "'l_partkey', l_partkey, 'l_suppkey', l_suppkey) as (col_name, key)"))
      .groupBy("col_name", "key").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(byCol))
    freq.groupBy("col_name")
      .agg(sum("cnt").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max("cnt").as("max_cnt"),
        max(when(col("rn") === 1, col("key"))).as("top_key"))
      .select(col("col_name"), col("n_rows"), col("n_keys"),
        col("max_cnt"), col("top_key"),
        expr("max_cnt * 1000000L div n_rows").as("max_share_ppm"),
        expr("max_cnt * n_keys * 1000L div n_rows").as("skew_x1000"))
      .orderBy("col_name")
  }

  val qSkewDiagOracle: String = """
    WITH s AS (
      SELECT 'l_orderkey' col_name, l_orderkey jk FROM lineitem
      UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
      UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem),
    f AS (SELECT col_name, jk, count(*) cnt FROM s GROUP BY 1, 2),
    r AS (SELECT *, row_number() OVER (PARTITION BY col_name
                      ORDER BY cnt DESC, jk) rn FROM f),
    a AS (SELECT col_name, sum(cnt) n_rows, count(*) n_keys,
                 max(cnt) max_cnt,
                 max(CASE WHEN rn = 1 THEN jk END) top_key
          FROM r GROUP BY 1)
    SELECT col_name, CAST(n_rows AS BIGINT) n_rows, n_keys, max_cnt, top_key,
           CAST(max_cnt * 1000000 // n_rows AS BIGINT) max_share_ppm,
           CAST(max_cnt * n_keys * 1000 // n_rows AS BIGINT) skew_x1000
    FROM a ORDER BY col_name"""

  /** As-of join with pandas `tolerance=`: a backward match farther than 10
    * minutes is DISCARDED (not replaced by an earlier row). Exercises the
    * numeric-ordinate arm of RelOps.asofJoin (epoch micros) — same
    * union-and-scan single-sort plan; the tolerance is a post-match
    * comparison on the carried (ord, payload) struct. */
  def qAsofTol(spark: SparkSession, dir: String): DataFrame = {
    val tolUs     = 10L * 60 * 1000000
    val ev        = Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("value").as("click_value"))
    RelOps.asofJoin(purchases, clicks, Seq("user_id"), "us", "us",
        "click_value", "last_click_value",
        tolerance = Some(lit(tolUs)))
      .select("event_id", "user_id", "value", "last_click_value")
      .orderBy("event_id")
  }

  val qAsofTolOracle: String = """
    WITH u AS (
      SELECT user_id, epoch_us(ts) us, 0 AS isr, event_id, value,
             NULL::DOUBLE AS pay
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, epoch_us(ts), 1, NULL, NULL::DOUBLE, value
      FROM events WHERE event_type = 'click'),
    s AS (SELECT *, last_value(CASE WHEN isr = 1 THEN {'o': us, 'p': pay} END
                               IGNORE NULLS)
                      OVER (PARTITION BY user_id ORDER BY us, isr DESC
                            ROWS UNBOUNDED PRECEDING) m
          FROM u)
    SELECT event_id, user_id, value,
           CASE WHEN us - m.o <= 600000000 THEN m.p END AS last_click_value
    FROM s WHERE isr = 0 ORDER BY event_id"""

  /** TPC-H Q3 shape (shipping-priority top-10) on the fixture star schema:
    * segment-filtered customers ⋈ date-filtered orders ⋈ date-filtered
    * lineitem, revenue per order, global top-10. The segment filter
    * prunes at the customer scan and travels to the orders side as a
    * join; lineitem revenue pre-aggregates per order BEFORE the orders
    * join (q_join_agg's device — the wide shuffle happens once, at
    * order grain); the top-10 is TakeOrderedAndProject (per-partition
    * heaps, no global sort materialization). Cents arithmetic keeps
    * revenue exact; the tiebreak on l_orderkey makes top-10 stable. */
  def qTpchQ3(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-06-01").cast("date")
    val c = Tables.customer(spark, dir)
      .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(spark, dir)
      .where(to_date(col("o_orderdate")) < cutoff)
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("o_orderpriority"))
    val perOrder = Tables.lineitem(spark, dir)
      .where(to_date(col("l_shipdate")) > cutoff)
      .select(col("l_orderkey"),
        (Money.cents(col("l_extendedprice")) *
          (lit(100L) - Money.cents(col("l_discount")))).as("rev_c"))
      .groupBy("l_orderkey").agg(sum("rev_c").as("rev_c"))
    perOrder
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("l_orderkey"), col("o_date"), col("o_orderpriority"),
        (col("rev_c").cast("double") / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val qTpchQ3Oracle: String = """
    SELECT l_orderkey,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_date,
           o_orderpriority,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT)))
                AS DOUBLE)/10000.0 AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1998-06-01'
      AND CAST(l_shipdate AS DATE) > DATE '1998-06-01'
    GROUP BY l_orderkey, o_date, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** Null-safe equality join (Spark `<=>` / SQL IS NOT DISTINCT FROM —
    * pandas merge treats NaN keys as matching, plain SQL `=` drops them):
    * both sides aggregate to a bounded nullable-bucket grain first, the
    * NULL bucket carries every 10th user, and the null-safe key lets the
    * NULL groups pair up. Catalyst still plans this as a hash equi-join
    * (EqualNullSafe is a supported join key — no nested-loop fallback). */
  def qNullsafeJoin(spark: SparkSession, dir: String): DataFrame = {
    def side(t: String, cntName: String, sumName: String) =
      Tables.events(spark, dir)
        .where(col("event_type") === t)
        .groupBy(when(col("user_id") % 10 =!= 0, col("user_id") % 10)
          .as("bucket"))
        .agg(count(lit(1)).as(cntName),
          sum(Money.cents(col("value"))).as(sumName))
    val p = side("purchase", "n_purch", "c_purch")
    val c = side("click", "n_click", "c_click")
    p.join(c, p("bucket") <=> c("bucket"), "full_outer")
      .select(coalesce(p("bucket"), c("bucket")).as("bucket_val"),
        p("bucket").isNull.and(c("bucket").isNull).cast("int").as("is_null_bucket"),
        col("n_purch"), col("n_click"),
        ((col("c_purch") + col("c_click")).cast("double") / 100.0).as("total_value"))
      .orderBy(col("bucket_val").asc_nulls_first)
  }

  val qNullsafeJoinOracle: String = """
    WITH p AS (SELECT CASE WHEN user_id % 10 <> 0 THEN user_id % 10 END bucket,
                      count(*) n_purch,
                      CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) c_purch
               FROM events WHERE event_type = 'purchase' GROUP BY 1),
    c AS (SELECT CASE WHEN user_id % 10 <> 0 THEN user_id % 10 END bucket,
                 count(*) n_click,
                 CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) c_click
          FROM events WHERE event_type = 'click' GROUP BY 1)
    SELECT coalesce(p.bucket, c.bucket) bucket_val,
           CAST(p.bucket IS NULL AND c.bucket IS NULL AS INT) is_null_bucket,
           n_purch, n_click,
           CAST(c_purch + c_click AS DOUBLE)/100.0 total_value
    FROM p FULL OUTER JOIN c ON p.bucket IS NOT DISTINCT FROM c.bucket
    ORDER BY bucket_val NULLS FIRST"""

  /** Order-fulfillment lead time (ship − order date) quantiles per
    * priority — supply-chain latency reporting on the exact pandas
    * quantile kernel (QuantileOps two-phase sort; linear interpolation).
    * The join pre-projects two columns each side, so the only wide state
    * is (priority, lat_days). */
  def qLeadTime(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"),
        col("o_orderpriority"))
    val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("sd"), col("od")).cast("long").as("lat"))
    graft.ops.QuantileOps.groupedQuantiles(j, Seq("o_orderpriority"), "lat",
        Seq(0.5, 0.9))
      .select(col("o_orderpriority"), col("q"), col("linear").as("lat_days"))
      .orderBy("o_orderpriority", "q")
  }

  val qLeadTimeOracle: String = {
    val idx = "CAST(floor(q*(n-1)) AS BIGINT)"
    s"""
    WITH j AS (SELECT o_orderpriority,
                      datediff('day', CAST(o_orderdate AS DATE),
                               CAST(l_shipdate AS DATE)) lat
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    nn AS (SELECT o_orderpriority, lat v,
                  CAST(row_number() OVER (PARTITION BY o_orderpriority
                                          ORDER BY lat) AS BIGINT) - 1 rn,
                  count(*) OVER (PARTITION BY o_orderpriority) n
           FROM j WHERE lat IS NOT NULL),
    e AS (SELECT nn.*, q FROM nn
          CROSS JOIN (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE))) t(q)),
    g AS (SELECT o_orderpriority, q,
                 max(CASE WHEN rn = $idx THEN v END) lov,
                 max(CASE WHEN rn = $idx + 1 THEN v END) hiv,
                 max(q*(n-1) - floor(q*(n-1))) f
          FROM e WHERE rn = $idx OR rn = $idx + 1
          GROUP BY o_orderpriority, q)
    SELECT o_orderpriority, q,
           CAST(CASE WHEN f = 0 THEN lov
                     ELSE lov + (hiv - lov)*f END AS DOUBLE) AS lat_days
    FROM g ORDER BY o_orderpriority, q"""
  }

  /** Market-basket co-occurrence (association mining lite): top-20 part
    * pairs co-purchased within an order, with exact-ppm support and lift
    * from integer counts. The pair generator is a SELF-JOIN ON THE ORDER
    * KEY — safe because basket size is bounded (~O(lines/order) pairs per
    * order, never corpus-quadratic); item marginals broadcast back onto
    * the (already small) pair aggregate, and the top-20 is a heap cut. */
  def qBasket(spark: SparkSession, dir: String): DataFrame = {
    // ONE exchange of lineitem (r18, guide §2.3/§2.4): the former
    // items.distinct() + self-join-on-ok + two separate marginal
    // aggregates re-shuffled the (ok, pk) projection four times (7
    // Exchange nodes; plans/r18/q_basket_before.txt). collect_set is the
    // distinct (partial map-side), the sorted basket array generates each
    // order's pa < pb pairs without any join, and the marginals/order
    // count are cheap consumers of the one materialized basket relation
    // (cut: three downstream branches — see Phase). Output identical:
    // count(baskets) = count(DISTINCT ok) (every order has ≥1 item),
    // per-pk basket count = count over DISTINCT (ok, pk), and sorted
    // i<j combinations = the DISTINCT pa < pb pairs per order.
    val baskets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("pks"))
      // cut, not lazy reuse: column pruning specializes each consumer's
      // copy of the aggregate (pairs keep pks, marginals prune), so the
      // three subtrees are NOT identical and ReuseExchange cannot dedup
      // them (verified in the executed plan) — without the cut the full
      // lineitem exchange runs three times, which is the old shape again
      .phaseCut
    val nOrders = baskets.select(count(lit(1)).as("n_orders"))
    val itemN = baskets.select(explode(col("pks")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("n_item"))
    val pairs = baskets
      .select(explode(flatten(transform(col("pks"), (x, i) =>
        transform(slice(col("pks"), i + lit(2), size(col("pks"))),
          y => struct(x.as("pa"), y.as("pb")))))).as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_co"))
      .orderBy(col("n_co").desc, col("pa"), col("pb")).limit(20)
    pairs
      .join(broadcast(itemN.select(col("pk").as("pa"), col("n_item").as("n_a"))), Seq("pa"))
      .join(broadcast(itemN.select(col("pk").as("pb"), col("n_item").as("n_b"))), Seq("pb"))
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("n_co"),
        expr("n_co * 1000000L div n_orders").as("support_ppm"),
        ((col("n_co") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("n_co").desc, col("pa"), col("pb"))
  }

  val qBasketOracle: String = """
    WITH items AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
    no AS (SELECT count(DISTINCT ok) n_orders FROM items),
    i_n AS (SELECT pk, count(*) n_item FROM items GROUP BY 1),
    p AS (SELECT a.pk pa, b.pk pb, count(*) n_co
          FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
          GROUP BY 1, 2
          ORDER BY n_co DESC, pa, pb LIMIT 20)
    SELECT pa, pb, n_co,
           CAST(n_co * 1000000 // n_orders AS BIGINT) support_ppm,
           CAST(n_co * n_orders AS DOUBLE)
             / CAST(na.n_item * nb.n_item AS DOUBLE) lift
    FROM p JOIN i_n na ON pa = na.pk JOIN i_n nb ON pb = nb.pk
    CROSS JOIN no
    ORDER BY n_co DESC, pa, pb"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_lead_time", qLeadTime, Some(qLeadTimeOracle)),
    QueryDef("q_basket", qBasket, Some(qBasketOracle)),
    QueryDef("q_nullsafe_join", qNullsafeJoin, Some(qNullsafeJoinOracle)),
    QueryDef("q_tpch_q3", qTpchQ3, Some(qTpchQ3Oracle)),
    QueryDef("q_asof_tol", qAsofTol, Some(qAsofTolOracle)),
    QueryDef("q_skew_diag", qSkewDiag, Some(qSkewDiagOracle)),
    QueryDef("q_take", qTake, Some(qTakeOracle)),
    QueryDef("q_take_upcast", qTakeUpcast, Some(qTakeUpcastOracle)),
    QueryDef("q_factorize", qFactorize, Some(qFactorizeOracle)),
    QueryDef("q_join_agg", qJoinAgg, Some(qJoinAggOracle)),
    QueryDef("q_anti_join", qAntiJoin, Some(qAntiJoinOracle)),
    QueryDef("q_semi_join", qSemiJoin, Some(qSemiJoinOracle)),
    QueryDef("q_set_ops", qSetOps, Some(qSetOpsOracle)),
    QueryDef("q_topk", qTopK, Some(qTopKOracle)),
    QueryDef("q_asof", qAsof, Some(qAsofOracle)),
    QueryDef("q_asof_dir", qAsofDir, Some(qAsofDirOracle)),
    QueryDef("q_pivot", qPivot, Some(qPivotOracle)),
    QueryDef("q_melt", qMelt, Some(qMeltOracle)),
    QueryDef("q_zorder", qZorder, Some(qZorderOracle)),
    QueryDef("q_pagerank", qPagerank, Some(qPagerankOracle)))
}

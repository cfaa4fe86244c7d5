package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, IntegralDivide, Literal}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}

import graft.plans.{AsofMergeJoin, AsofMergeJoinStrategy}

/** Relational building blocks beyond plain joins: as-of join and top-k per
  * group. These are capabilities a user of the reference gets from pandas
  * (`merge_asof`, `nlargest`) — SURVEY.md §2.5.
  */
object RelOps {

  /** As-of join with pandas `merge_asof` direction semantics:
    *   - "backward" (default): latest right row with `rightOrd <= leftOrd`
    *   - "forward": earliest right row with `rightOrd >= leftOrd`
    *   - "nearest": whichever of the two is closer; exact-distance ties go
    *     backward
    *
    * Matching is by ROW, not by payload: a matched right row whose payload
    * is null yields null (pandas parity) — the match struct carries
    * (ord, payload) so null payloads never fall through to earlier rows.
    *
    * Default plan (keys non-empty): the partitioned-merge operator
    * [[graft.plans.AsofMergeJoin]] — co-partition and sort each side
    * SEPARATELY on (keys, ord), then one streaming two-cursor pass per
    * partition (r17: 2.45× vs the union plan was DuckDB's merge-operator
    * edge at 100M events; this is the same shape, distributed). No
    * point-in-time self-join explosion, AQE sizes each side's exchange
    * independently, skewed keys salt like any clustered exchange.
    *
    * Fallback (keyless, or `spark.graft.asof.merge=false`) and the
    * REFERENCE SEMANTICS the merge exec is A/B-pinned against
    * (AsofMergeSpec): union-and-scan — tag both sides, sort by (keys,
    * ord, rightFirst) once, and stream `last(match ignore nulls)` over
    * the running frame (forward is the same scan over the reversed
    * order; nearest combines both and compares the two ord distances —
    * interval arithmetic, so timestamp and numeric ord columns both
    * work). Right rows at the exact same ord sort before left rows so
    * matches are inclusive in both directions.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftOrd: String, rightOrd: String,
               payload: String, as: String,
               direction: String = "backward",
               tolerance: Option[Column] = None): DataFrame = {
    // Two physical shapes, same semantics (A/B-pinned in RelOpsSpec):
    // the partitioned-merge operator (graft.plans.AsofMergeJoin — two
    // side-local shuffles+sorts, one streaming pass) is the scale path
    // and the default; the union-and-scan window formulation below stays
    // as the keyless fallback and the opt-out
    // (spark.graft.asof.merge=false), and remains the reference
    // semantics the merge operator is held to.
    val merge = keys.nonEmpty && left.sparkSession.conf
      .get("spark.graft.asof.merge", "true").toBoolean
    direction match {
      case "backward" | "forward" if merge =>
        val j = mergeJoined(left, right, keys, leftOrd, rightOrd, payload,
          fwd = direction == "forward", tag = "")
        val bounded = tolerance match {
          case None => col("__graft_mp")
          case Some(tol) =>
            val dist =
              if (direction == "forward") col("__graft_mo") - col(leftOrd)
              else col(leftOrd) - col("__graft_mo")
            when(dist <= tol, col("__graft_mp"))
        }
        placeAs(j, left.columns, as, bounded)
      case "nearest" if merge =>
        // two merges; the second reuses the first's left-side exchange
        // and sort (AsofMergeJoinExec preserves left partitioning and
        // ordering). Combination formula mirrors the window path's
        // struct comparison EXACTLY, including its null arithmetic.
        val b = mergeJoined(left, right, keys, leftOrd, rightOrd, payload,
          fwd = false, tag = "b")
        val bf = mergeJoined(b, right, keys, leftOrd, rightOrd, payload,
          fwd = true, tag = "f")
        val (bo, bp) = (col("__graft_mob"), col("__graft_mpb"))
        val (fo, fp) = (col("__graft_mof"), col("__graft_mpf"))
        val nearO = when(!col("__graft_mff"), bo)
          .when(!col("__graft_mfb"), fo)
          .when(col(leftOrd) - bo <= fo - col(leftOrd), bo).otherwise(fo)
        val nearP = when(!col("__graft_mff"), bp)
          .when(!col("__graft_mfb"), fp)
          .when(col(leftOrd) - bo <= fo - col(leftOrd), bp).otherwise(fp)
        val bounded = tolerance match {
          case None => nearP
          case Some(tol) =>
            val dist = greatest(col(leftOrd) - nearO, nearO - col(leftOrd))
            when(dist <= tol, nearP)
        }
        placeAs(bf, left.columns, as, bounded)
      case _ => asofViaWindow(left, right, keys, leftOrd, rightOrd,
        payload, as, direction, tolerance)
    }
  }

  /** `withColumn` placement semantics for the merge path's result: the
    * `as` column replaces an existing column in place or appends. */
  private def placeAs(df: DataFrame, leftCols: Array[String], as: String,
                      value: Column): DataFrame = {
    val out =
      if (leftCols.contains(as)) leftCols.map(c =>
        if (c == as) value.as(as) else col(c)).toSeq
      else leftCols.map(col(_)).toSeq :+ value.as(as)
    df.select(out: _*)
  }

  /** Build the [[graft.plans.AsofMergeJoin]] node: right side projected
    * to (keys, ord, payload) under fresh aliases (fresh exprIds, so a
    * self-as-of — both sides carved from one scan — never presents
    * conflicting attributes), left side untouched. Returns the left
    * columns plus `__graft_mf/mo/mp<tag>` (matched?, matched ord,
    * matched payload). */
  private def mergeJoined(left: DataFrame, right: DataFrame,
                          keys: Seq[String], leftOrd: String,
                          rightOrd: String, payload: String,
                          fwd: Boolean, tag: String): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val rProj = right.select(
      keys.zipWithIndex.map { case (k, i) => col(k).as(s"__graft_rk$i") } ++
        Seq(col(rightOrd).as("__graft_ro"),
          col(payload).as("__graft_rp")): _*)
    val lPlan = PlanBridge.analyzed(left)
    val rPlan = PlanBridge.analyzed(rProj)
    // resolve with the session's case-sensitivity rule, and refuse
    // ambiguity — exact string equality here would be a silent behavior
    // change vs the window path's col() resolution (r17 review finding)
    val caseSensitive = spark.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    def resolves(a: String, b: String): Boolean =
      if (caseSensitive) a == b else a.equalsIgnoreCase(b)
    def lAttr(n: String): Attribute = {
      val hits = lPlan.output.filter(a => resolves(a.name, n))
      require(hits.size == 1, s"asofJoin: column $n " +
        (if (hits.isEmpty) "not found in left side"
         else s"is ambiguous in left side (${hits.map(_.name).mkString(", ")})"))
      hits.head
    }
    val rOut = rPlan.output
    val node = AsofMergeJoin(
      leftKeys = keys.map(lAttr), rightKeys = rOut.take(keys.size),
      leftOrd = lAttr(leftOrd), rightOrd = rOut(keys.size),
      payload = rOut(keys.size + 1),
      forward = fwd,
      matchedFlag = AttributeReference(s"__graft_mf$tag",
        org.apache.spark.sql.types.BooleanType, nullable = false)(),
      matchedOrd = AttributeReference(s"__graft_mo$tag",
        rOut(keys.size).dataType)(),
      matchedPay = AttributeReference(s"__graft_mp$tag",
        rOut(keys.size + 1).dataType)(),
      left = lPlan, right = rPlan)
    PlanBridge.ofRows(spark, node)
  }

  /** Idempotently register the merge-asof planner strategy on the
    * session (the per-session seam; GraftExtensions carries the same
    * strategy for `spark.sql.extensions` deployments). */
  private def ensureStrategy(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[AsofMergeJoinStrategy]))
      spark.experimental.extraStrategies = cur :+ new AsofMergeJoinStrategy
  }

  private def asofViaWindow(left: DataFrame, right: DataFrame,
                            keys: Seq[String],
                            leftOrd: String, rightOrd: String,
                            payload: String, as: String,
                            direction: String,
                            tolerance: Option[Column]): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__ord", col(leftOrd)).withColumn("__isR", lit(0))
      .withColumn("__pay", lit(null).cast(right.schema(payload).dataType))
    val r = right.select(
      (keys.map(col) :+ col(rightOrd).as("__ord")) :+ lit(1).as("__isR") :+
        col(payload).as("__pay"): _*)
    val unioned = l.select((keys.map(col) ++ Seq(col("__ord"), col("__isR"), col("__pay")) ++
      leftCols.filterNot(keys.contains).map(col)): _*)
      .unionByName(r, allowMissingColumns = true)
    def scan(desc: Boolean) = {
      val ord = if (desc) col("__ord").desc else col("__ord").asc
      Window.partitionBy(keys.map(col): _*)
        .orderBy(ord, col("__isR").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    // right-row (ord, payload) carried as a struct so `nearest` can
    // compare match distances; null for left rows keeps ignoreNulls exact
    val rs = when(col("__isR") === 1, struct(col("__ord").as("o"), col("__pay").as("p")))
    val matched = direction match {
      case "backward" => last(rs, ignoreNulls = true).over(scan(desc = false))
      case "forward"  => last(rs, ignoreNulls = true).over(scan(desc = true))
      case "nearest"  =>
        val b = last(rs, ignoreNulls = true).over(scan(desc = false))
        val f = last(rs, ignoreNulls = true).over(scan(desc = true))
        when(f.isNull, b).when(b.isNull, f)
          .when(col("__ord") - b.getField("o") <= f.getField("o") - col("__ord"), b)
          .otherwise(f)
      case other => throw new IllegalArgumentException(s"direction $other")
    }
    // pandas merge_asof tolerance=: a match farther than `tol` (in ordinate
    // units — works for numeric ords and interval-typed timestamp diffs)
    // is discarded, not substituted by an earlier row. Identical window
    // expressions collapse to one physical window, so re-using `matched`
    // here adds no extra pass.
    val bounded = tolerance match {
      case None => matched
      case Some(tol) =>
        val dist = direction match {
          case "backward" => col("__ord") - matched.getField("o")
          case "forward"  => matched.getField("o") - col("__ord")
          case _ => greatest(col("__ord") - matched.getField("o"),
            matched.getField("o") - col("__ord"))
        }
        when(dist <= tol, matched)
    }
    unioned
      .withColumn(as, bounded.getField("p"))
      .where(col("__isR") === 0)
      .select(leftCols.map(col) :+ col(as): _*)
  }

  /** Floor division that stays on integers (SQL `div` truncates toward
    * zero, which misaligns bins for negative ordinates). The numerator is
    * an exact multiple of `w`, and the division is integral
    * (`IntegralDivide`), never a double round-trip — double division is
    * only exact below 2^53 and silently mis-bins epoch-nanosecond-sized
    * ordinates. */
  def fdiv(c: Column, w: Long): Column = {
    val el = ColumnBridge.expression((c - pmod(c, lit(w))).cast("long"))
    ColumnBridge.column(new IntegralDivide(el, Literal(w)))
  }

  /** Binned range join: every (point, range) pair sharing `keys` with
    * `lo <= point <= hi` (inclusive both ends). Ordinates are integral
    * (e.g. epoch microseconds via `unix_micros`).
    *
    * Scale story: the naive formulation — equi-join on `keys` with the
    * range predicate as a residual (or a pure theta-join when `keys` is
    * empty) — degenerates into a per-key cross product whenever a key is
    * hot, and a BroadcastNestedLoopJoin when no equality key exists.
    * Binning makes the ordinate part of the join key: a point falls in
    * exactly one `binWidth` bucket, a range is exploded over the buckets
    * it overlaps (ranges ≈ binWidth → ≤ 2 copies), and the join becomes
    * an ordinary shuffled equi-join on (keys, bin) that AQE can
    * skew-split. Each qualifying pair meets exactly once — in the point's
    * single bin — so no post-join dedup is needed. Pick `binWidth` near
    * the typical range span: range-side blowup is
    * ceil(span/binWidth) + 1 copies.
    */
  def rangeJoin(points: DataFrame, pointCol: String,
                ranges: DataFrame, loCol: String, hiCol: String,
                keys: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", fdiv(col(pointCol), binWidth))
    val r = ranges.withColumn("__bin",
      explode(sequence(fdiv(col(loCol), binWidth), fdiv(col(hiCol), binWidth))))
    p.join(r, keys :+ "__bin")
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Binned interval-OVERLAP join: every (left, right) interval pair
    * sharing `keys` with `llo <= rhi AND rlo <= lhi` (inclusive overlap —
    * the interval-interval generalization of [[rangeJoin]]'s
    * point-in-range). Both sides explode over the bins their interval
    * touches and join on (keys, bin), so the plan is an ordinary shuffled
    * equi-join AQE can size and skew-split — never a per-key cross
    * product. An overlapping pair shares every bin of
    * [max(llo,rlo), min(lhi,rhi)]; keeping only the FIRST shared bin
    * (`bin == greatest(fdiv(llo), fdiv(rlo))`) emits each qualifying pair
    * exactly once with no post-join distinct. Per-row blowup is
    * ceil(span/binWidth)+1 copies on each side — pick `binWidth` near the
    * typical interval span.
    */
  def overlapJoin(left: DataFrame, lloCol: String, lhiCol: String,
                  right: DataFrame, rloCol: String, rhiCol: String,
                  keys: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.withColumn("__bin",
      explode(sequence(fdiv(col(lloCol), binWidth), fdiv(col(lhiCol), binWidth))))
    val r = right.withColumn("__bin",
      explode(sequence(fdiv(col(rloCol), binWidth), fdiv(col(rhiCol), binWidth))))
    l.join(r, keys :+ "__bin")
      .where(col(lloCol) <= col(rhiCol) && col(rloCol) <= col(lhiCol) &&
        col("__bin") === greatest(fdiv(col(lloCol), binWidth),
          fdiv(col(rloCol), binWidth)))
      .drop("__bin")
  }

  /** Skew-resistant grouped aggregation by key salting: phase 1 aggregates
    * on (key, salt) so a hot key's rows spread over `buckets` reducers;
    * phase 2 combines the partials per key. Only usable for aggregations
    * with a partial/final decomposition — the caller provides both sides
    * (e.g. partial `sum`/`count`, final `sum`/`sum`). AQE's skew handling
    * covers joins; this covers the hot-key aggregation case it does not.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                partial: Seq[(String, Column)],
                finalAgg: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(finalAgg.head._2.as(finalAgg.head._1),
        finalAgg.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Skew-resistant equi-join by key salting: the probe (skewed) side gets
    * an arbitrary salt in [0, buckets) — the value never affects the
    * result, only the shuffle spread — and the build side is replicated
    * once per salt via a generator (an explode, not a cartesian), so the
    * join runs on (keys, salt) and a hot key's probe rows fan over
    * `buckets` reducers instead of one. Output equals the plain join
    * (the salt column is dropped). AQE's skew-join covers shuffle joins
    * it can re-plan at runtime; this covers the cases it cannot — joins
    * whose exchanges were removed (bucketed tables, co-partitioned
    * reuse), stream-stream joins, and static plans — at the cost of
    * build-side replication ×buckets, so size `buckets` to the skew
    * factor, not higher. Inner and left joins only: right/full would
    * duplicate unmatched build rows per salt. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner",
                 saltCols: Seq[Column] = Nil): DataFrame = {
    require(Set("inner", "left", "left_outer", "leftouter")(joinType),
      s"saltedJoin supports inner/left joins, not $joinType")
    require(buckets >= 1, s"saltedJoin needs buckets >= 1, got $buckets " +
      "(0 would make every probe salt NULL and silently drop all matches)")
    // Deterministic salt (hash of the probe row by default): legal on
    // streaming DataFrames — monotonically_increasing_id is rejected by
    // the UnsupportedOperationChecker — and stable under task retries.
    // Map-typed columns are excluded (xxhash64 cannot hash them).
    // Caveat: probe rows that are bit-identical across every hashed
    // column land in the same bucket; a hot key still spreads as long as
    // its rows differ in any non-key column (the normal case for fact
    // rows). When the probe IS reduced to bare keys — or carries a
    // high-entropy row id — pass that distinguishing column explicitly
    // via `saltCols`.
    // recursive: a map nested in an array/struct fails xxhash64 analysis
    // just like a top-level one (ADVICE r9)
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType    => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType  => hasMap(a.elementType)
      case _             => false
    }
    val defaultSalt = probe.schema.fields
      .filterNot(f => hasMap(f.dataType))
      .map(f => col(f.name)).toSeq
    val src = if (saltCols.nonEmpty) saltCols else defaultSalt
    require(src.nonEmpty, "saltedJoin: no hashable salt source columns")
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(src: _*), lit(buckets.toLong)))
    val reps = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    salted.join(reps, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Top-k rows per group by `ord` (descending), deterministic via the
    * caller-supplied tiebreaker in `ord`. Window row_number + filter: one
    * shuffle, k rows kept per group per partition — no global sort. */
  def topKPerGroup(df: DataFrame, keys: Seq[String], ord: Seq[Column],
                   k: Int, rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn(rankCol, row_number().over(w)).where(col(rankCol) <= k)
  }
}

package graft

import org.apache.spark.sql.DataFrame

/** Plan-shape regression guards: the PLANS.md audit encoded as tests.
  * These inspect the planned (pre-execution) physical plan only — no data
  * runs — and pin the properties the round-2 perf work established. */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  /** Count plan nodes named exactly `node`: Spark prints last children as
    * "+- X" but non-last (left) children as ":- X" — counting only one
    * prefix would let a join-side Sort/Exchange escape the budget; the
    * trailing boundary keeps Sort from matching SortMergeJoin, and
    * Exchange from matching BroadcastExchange. */
  private def count(hay: String, node: String): Int =
    s"[+:]- $node[ \\[]".r.findAllIn(hay).size

  test("q_rank: counting-sort domain plan — equi-joins only, AQE picks the strategy") {
    // round-9 shape: tie-based ranks come from windows over the two
    // (group, value) DOMAINS (post-agg), and the fact picks them up via
    // UNHINTED equi-joins — no hardcoded broadcast() of the domain, which
    // for near-unique measures approaches |fact| and would OOM the driver
    // at scale. Either BHJ (AQE measured a small domain) or SMJ (it
    // didn't) is a legal plan; cartesian/nested-loop is not.
    val p = plan("q_rank")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), p)
    // At fixture scale the domains ARE tiny: the adaptively-finalized plan
    // must land on broadcast joins — proving the size decision now comes
    // from AQE's runtime stats, not a hint that ignores them.
    // collect() (not .write, which re-plans under a separate
    // QueryExecution) so THIS dataset's adaptive plan finalizes
    val df = SparkEntry.queries("q_rank")(spark, dir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("isFinalPlan=true"), fin)
    assert(fin.contains("BroadcastHashJoin"), fin)
  }

  test("q_approx_sketch: exact distinct is NOT co-grouped with the sketch buffers") {
    // merging countDistinct back into the sketch aggregation makes Spark's
    // distinct-rewrite key every non-distinct partial by (group,
    // distinct-col) — an HLL + quantile summaries PER PART KEY, the OOM
    // the sf10 sweep caught. The split form joins two aggregates on the
    // tiny group key: the plan must contain that join.
    val p = plan("q_approx_sketch")
    assert(p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_qcut: quartile edges come from the counting-sort plan, not percentile buffers") {
    // the exact percentile() aggregate buffers every group value in
    // executor memory (same OOM class); the counting-sort edge plan shows
    // up as window-ranked domain aggregates and NO percentile call
    val p = plan("q_qcut")
    assert(!p.toLowerCase.contains("percentile"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_dup_spans: one gram exchange (min≠max doc-frequency agg), windows per doc") {
    val p = plan("q_dup_spans")
    // dup-gram detection must stay a single map-side-combined hash-agg on
    // the gram (a count-distinct regression adds a second full
    // gram-relation exchange via its (g, doc_id) partial dedup), the
    // island merge must partition by doc (never SinglePartition), and the
    // probe must stay an equi-join
    assert(!p.contains("count(distinct"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("CartesianProduct"), p)
    val gramExchanges = "Exchange hashpartitioning\\(g#".r.findAllIn(p).size
    assert(gramExchanges == 1, s"expected 1 gram exchange, got $gramExchanges\n$p")
  }

  test("q_diversity_sample: quota rank is pushed down to WindowGroupLimit") {
    val p = plan("q_diversity_sample")
    // the per-cluster quota filter must ride Spark's rank-pushdown so each
    // task keeps <= cap rows per cluster BEFORE the cluster shuffle — the
    // shuffle then carries O(clusters*cap), not the corpus
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_quantile: counting-sort plan — the fact table is never sorted") {
    val p = plan("q_quantile")
    // the round-7 rewrite: no per-row rank over the fact (the old plan's
    // row_number window), and the only sorts are the domain window's
    // in-partition sort + the output orderBy — any regression back to a
    // fact-table sort shows up as an extra Sort or a row_number
    assert(!p.contains("row_number"), p)
    assert(count(p, "Sort") <= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_median: same counting-sort kernel (no fact-table rank window)") {
    val p = plan("q_median")
    assert(!p.contains("row_number"), p)
    assert(count(p, "Sort") <= 2, p)
  }

  test("q_join_agg: no count-distinct Expand; pre-agg both sides of the fact join") {
    val p = plan("q_join_agg")
    assert(!p.contains("Expand"), p)
    // exchanges: the per-order pre-agg (the one WIDE shuffle over the
    // fact), the orders side of the shuffled-hash join, the per-customer
    // pre-agg, the tiny 25-group final agg, and the output orderBy range
    // partitioning; broadcasts excluded. Payloads after the first two are
    // |orders| -> |customers| -> 25 rows — strictly shrinking.
    val wide = count(p, "Exchange")
    assert(wide <= 5, s"expected <=5 non-broadcast exchanges, plan:\n$p")
    // the fact-side join is hash-based either way AQE lands it: SHJ as
    // hinted, or BHJ when the orders side is broadcast-small at tiny SF
    assert(p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_topk: WindowGroupLimit pushes the per-group limit below the shuffle") {
    assert(plan("q_topk").contains("WindowGroupLimit"))
  }

  test("similarity/near-dup plans never go all-pairs") {
    // LSH paths: candidates only from bucket equi-joins — no unconditioned
    // join of any kind
    Seq("q_embed_neardup", "q_embed_lsh", "q_embed_lsh_probe").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
    // IVF: the ONE nested-loop is each vector scoring the broadcast
    // centroid codebook (O(n·nlist) by design); the corpus itself must
    // never be on both sides of an unconditioned join
    Seq("q_embed_ivf", "q_embed_ivf_probe").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"$q rerank must be equi-join:\n$p")
    }
  }

  test("q1_flagship: filter pushed to the parquet scan, no sort before agg") {
    val p = plan("q1_flagship")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p)
    assert(count(p, "Sort") <= 1, p) // output orderBy only
  }

  test("q_factorize: no window operator (distributed code assignment)") {
    assert(!plan("q_factorize").contains("Window"))
  }

  test("q_funnel: stage joins broadcast the per-user mins; never cartesian") {
    val p = plan("q_funnel")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_bm25: tiny df/corpus sides broadcast; top-10 filter becomes WindowGroupLimit") {
    val p = plan("q_bm25")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_blocklist: word arm is a hash equi-join on term — no per-(doc×term) product") {
    val p = plan("q_blocklist")
    // the round-8 rewrite: single-word terms tokenize the doc once and
    // equi-join the (broadcast) term relation, so blocklist SIZE never
    // multiplies document-side work; the BNLJ replace arm survives only
    // for multi-word phrases (none in the default list)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_mix: pure scan + one agg shuffle, no joins") {
    val p = plan("q_mix")
    assert(!p.contains("Join"), p)
    assert(count(p, "Exchange") <= 2, p) // source agg + output orderBy
  }

  test("q_range_join: binned equi-join — never a nested-loop/cartesian plan") {
    val p = plan("q_range_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the attribution join itself must be an equality join on (user, bin)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("q_overlap_join: binned equi-join — never a nested-loop/cartesian plan") {
    val p = plan("q_overlap_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("q_chunk / q_pii: pure scan + generate/projection, no joins, no pre-sort shuffle") {
    Seq("q_chunk", "q_pii").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q:\n$p")
      // only the output orderBy's range partitioning may shuffle
      assert(count(p, "Exchange") <= 1, s"$q:\n$p")
    }
  }

  test("r6 window queries: every window is partitioned (no single-task global sort)") {
    Seq("q_sessionize", "q_pack", "q_expanding").foreach { q =>
      val p = plan(q)
      assert(p.contains("Window"), s"$q:\n$p")
      // Spark prints an unpartitioned window spec as
      // "Window [...], [ord ASC ...]" with no partition list — every
      // windowexec here must carry its partition columns
      assert(!p.contains("SinglePartition"), s"$q:\n$p")
    }
  }

  test("q_doc_lm / q_contingency: vocab/marginal joins broadcast, never cartesian over rows") {
    Seq("q_doc_lm", "q_contingency").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"$q:\n$p")
    }
  }

  test("q_iceberg: one fact-table agg, scalar total broadcast back") {
    val p = plan("q_iceberg")
    assert(!p.contains("CartesianProduct"), p)
    // per-part agg shuffle (+ its reuse feeding the scalar total's
    // single-partition agg) + output orderBy; AQE dedups the reuse at run
    assert(count(p, "Exchange") <= 4, p)
  }

  test("q_zorder / q_regr: scan + hash-agg, no joins") {
    Seq("q_zorder", "q_regr").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q:\n$p")
      assert(count(p, "Exchange") <= 2, s"$q:\n$p") // agg + output orderBy
    }
  }

  test("q_skyline: no self-join — one partitioned window pass resolves dominance") {
    val p = plan("q_skyline")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(count(p, "Sort") <= 2, p) // window sort + output orderBy
  }

  test("q_vocab: global top-20 is TakeOrderedAndProject, not a full sort") {
    val p = plan("q_vocab")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(count(p, "Sort") == 0, p)
  }

  test("q_pagerank: rank flows via equi-joins; degree sides broadcast; no cartesian") {
    val p = plan("q_pagerank")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_dup_keep: one digest-partitioned window, no self-join") {
    val p = plan("q_dup_keep")
    assert(!p.contains("Join"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(count(p, "Exchange") <= 2, p) // digest hash + output orderBy
  }

  test("q_str_ops: pure codegen projection — no joins, only the output sort shuffle") {
    val p = plan("q_str_ops")
    assert(!p.contains("Join"), p)
    assert(count(p, "Exchange") <= 1, p)
  }

  test("q_busday: closed-form weekday math — equi-join only, no calendar spine") {
    val p = plan("q_busday")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_idx_minmax: one partitioned window sort resolves both extremes") {
    val p = plan("q_idx_minmax")
    assert(!p.contains("Join"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(count(p, "Sort") <= 2, p) // window sort + output orderBy
  }

  test("q_contam: benchmark gram set broadcast; shingle shuffle reused, not recomputed") {
    val p = plan("q_contam")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // three consumers of the shingle distinct must share one exchange —
    // AQE performs the reuse at runtime, so run the query and inspect the
    // FINAL adaptive plan (the pre-execution plan shows plain exchanges)
    val df = SparkEntry.queries("q_contam")(spark, dir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("ReusedExchange"), fin)
  }

  test("pack H: cdc/ordinal windows partitioned by user; no fact-level global sort") {
    Seq("q_cumcount", "q_scd2", "q_twa").foreach { q =>
      val p = plan(q)
      assert(p.contains("Window"), s"$q:\n$p")
      assert(!p.contains("SinglePartition"), s"$q:\n$p")
      assert(!p.contains("Join"), s"$q:\n$p")
      // one window exchange + the output range partitioning at most
      assert(count(p, "Exchange") <= 2, s"$q:\n$p")
    }
  }

  test("q_gini: majority rank runs partitioned on the class agg, no single-task stage") {
    val p = plan("q_gini")
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("Join"), p)
  }

  test("q_value_counts: global window sits above the agg, never over the fact scan") {
    val p = plan("q_value_counts")
    // the SinglePartition exchange is fed by the (bounded-cardinality)
    // HashAggregate, so the fact table never funnels into one task: the
    // scan's direct parent must be a partial aggregate
    assert(p.contains("SinglePartition"), p)
    val lines = p.linesIterator.toSeq
    val scanIdx = lines.indexWhere(_.contains("FileScan"))
    assert(lines(scanIdx - 1).contains("HashAggregate"), p)
  }

  test("q_profile: one scan, Expand-fed multi-distinct single pass") {
    val p = plan("q_profile")
    assert(count(p, "FileScan") == 1, p)
    assert(p.contains("Expand"), p)
    assert(!p.contains("Join"), p)
  }

  test("q_tpch_q3: pre-agg at order grain, filters pushed, top-10 is a heap cut") {
    val p = plan("q_tpch_q3")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    // revenue aggregates BEFORE the orders join: the lineitem-side
    // HashAggregate must sit below every join in the tree
    val aggIdx  = p.linesIterator.indexWhere(_.contains("HashAggregate"))
    val joinIdx = p.linesIterator.indexWhere(_.contains("Join"))
    assert(joinIdx < aggIdx, p) // parents print first: join above, agg below
  }

  test("q_acf: the lag window's exchange is reused by the power-sum agg") {
    val p = plan("q_acf")
    assert(!p.contains("Join"), p)
    assert(!p.contains("SinglePartition"), p)
    // one user_id hash exchange + the output range partitioning only —
    // the groupBy(user_id) agg must NOT add a third
    assert(count(p, "Exchange") <= 2, p)
  }

  test("q_topk_agg: heap aggregate — no window, no fact-table sort") {
    val p = plan("q_topk_agg")
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate"), p)
    // map-side partial heaps shrink the shuffle to k rows per group
    assert(p.contains("partial_topk_agg"), p)
    // the only Sort is the output orderBy (above the aggregate)
    assert(count(p, "Sort") <= 1, p)
  }

  test("q_embed_topk: pair scoring never shuffles — heap agg, not a window") {
    val p = plan("q_embed_topk")
    // the 2B-pair regression shape: a Window/row_number over the scored
    // pairs shuffles |Q|x|C| rows with both vectors attached (OOM at sf10);
    // the heap aggregate folds pairs map-side and shuffles O(|Q|*k) heaps
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_topk_agg"), p)
    // scoring stays OUTSIDE the interpreted aggregate: the heap's value
    // argument must be the projected cos_sim attribute, not a collapsed
    // inline CASE/dotq expression re-evaluated per heap offer
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("partial_topk_agg(CASE"), p)
    // queries broadcast; corpus side never exchanged before scoring
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("every declared query plans without error and never goes cartesian") {
    // catches analysis regressions (renamed columns, bad SQL in expr())
    // across the whole surface at plan time, and pins the global
    // invariant: no CartesianProduct anywhere — scalar cross joins must
    // come in as 1-row BroadcastNestedLoopJoins, full products never
    val bad = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      try {
        val p = plan(name)
        if (p.contains("CartesianProduct")) Some(s"$name: CartesianProduct")
        else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("q_oov: vocab cut is a heap TakeOrdered; coverage join broadcasts the vocab") {
    val p = plan("q_oov")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("q_roll_time / q_corr_matrix: single-pass shapes") {
    val rt = plan("q_roll_time")
    assert(rt.contains("Window") && !rt.contains("SinglePartition") &&
      !rt.contains("Join"), rt)
    val cm = plan("q_corr_matrix")
    assert(count(cm, "FileScan") == 1 && !cm.contains("Join"), cm)
  }

  test("pack R: decile/quintile queries use the rank-edge cut — no fact-grain ntile sort") {
    // round-10 lock on the last scale-killer plan class (r9 verdict #1):
    // q_decile_lift / q_quality_curve / q_rfm must never assign tiles via
    // `ntile().over(Window.orderBy(...))` at fact grain — that funnels the
    // whole doc/customer relation through ONE task's sort. With the
    // counting-sort rank-edge cut, every SinglePartition exchange left in
    // the plan is fed DIRECTLY by a HashAggregate (the bounded value
    // domain or the ≤10-row tile rollup), never by row-grain data.
    // q_auc joins the lock in round 11: its cumulative window now runs
    // over the ppm-QUANTIZED score (≤ ~1e6 distinct values — the same
    // bounded domain as its two decile siblings), never the raw double
    // whose cardinality grows with the corpus.
    Seq("q_decile_lift", "q_quality_curve", "q_rfm", "q_auc").foreach { q =>
      val p = plan(q)
      assert(!p.toLowerCase.contains("ntile"), s"$q reintroduced ntile:\n$p")
      val lines = p.linesIterator.toVector
      val sps = lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      assert(sps.nonEmpty, s"$q: expected the bounded-domain window:\n$p")
      sps.foreach { case (_, i) =>
        assert(lines(i + 1).contains("HashAggregate"),
          s"$q: SinglePartition exchange over non-aggregated input:\n$p")
      }
    }
  }

  test("multimodal decode/resize/resample: one codec pass, no shuffle before the output sort") {
    // The per-payload codec work (encode → decode+resample) must stay a
    // single mapPartitions chain over the scan: any Exchange other than
    // the FINAL output ordering's range partitioning means pixels or
    // samples crossed the wire mid-pipeline — the shuffle-per-payload
    // shape that dies at 100 TB. rangepartitioning appears exactly once
    // (the deterministic output orderBy); no hash-partition exchange,
    // no join, no aggregate in these plans.
    Seq("q_image_resize", "q_audio_resample").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q grew a join:\n$p")
      assert(!p.contains("hashpartitioning"),
        s"$q shuffles payload mid-pipeline:\n$p")
      assert(count(p, "Exchange") == 1 && p.contains("rangepartitioning"),
        s"$q: expected exactly the output-sort exchange:\n$p")
      assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"),
        s"$q lost the batch-shaped codec pass:\n$p")
    }
  }

  test("streaming banding: the minhash signature is evaluated once per document") {
    // The r11 regression class: higher-order functions are codegen-
    // fallback with no common-subexpression elimination, and
    // CollapseProject inlines a signature-computing projection into
    // every sibling reference — banding as explode(<16 refs to sig>)
    // re-evaluates the whole shingle+md5 pipeline ~17x per row
    // (measured 2.3 ms/doc, the dominant term of the 476 s r10 gate).
    // bandBuckets explodes plain band INDICES (a Generate is a collapse
    // barrier) and extracts element_at(sig, ...) above it, so the
    // optimized plan must contain the md5 expression exactly once.
    import org.apache.spark.sql.functions._
    // a parquet scan, not a LocalRelation — ConvertToLocalRelation would
    // eagerly evaluate the projection and leave nothing to count
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"), col("text"))
    val banded = graft.streaming.StreamOps.bandBuckets(
      docs.withColumn("sig",
        graft.functions.TextFunctions.rowMinhashSig(col("text"))), 16, 1)
    val opt = banded.queryExecution.optimizedPlan.toString
    val md5Count = "md5\\(".r.findAllIn(opt).size
    assert(md5Count == 1,
      s"signature inlined $md5Count times — banding lost its collapse barrier:\n$opt")
    assert("Generate ".r.findAllIn(opt).size == 1, opt)
  }

  test("streaming embed banding: the vector is quantized once per row") {
    // same regression class as the minhash lock above: `quantize` is a
    // higher-order transform (codegen-fallback, no CSE); inlined into
    // every bandSig reference it would re-quantize bands x planes times
    // per row. embedBandBuckets let-binds the quantized vector and
    // computes all band signatures into one array below the posexplode
    // Generate, so the optimized plan carries the quantize round()
    // exactly once (the plane sign matrices are plan-time literals — no
    // other round() exists in the projection).
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val banded = graft.streaming.StreamOps.embedBandBuckets(emb, 8, 8, 64)
      .select("id", "bucket")
    val opt = banded.queryExecution.optimizedPlan.toString
    val roundCount = "round\\(".r.findAllIn(opt).size
    assert(roundCount == 1,
      s"quantize inlined $roundCount times — embed banding lost its barrier:\n$opt")
    assert("Generate ".r.findAllIn(opt).size == 1, opt)
  }

  test("subset co-partitioning stays accepted: a non-rerank join whose children are partitioned on a key SUBSET adds no exchange") {
    // VERDICT r16 what's-wrong #3: GraftSession sets
    // spark.sql.requireAllClusterKeysForCoPartition=false SESSION-WIDE
    // for the tiled rerank (the pair side is partitioned on the grid
    // CELL, a strict subset of the (cell, id) join keys). Scoping the
    // conf to the rerank is theater — SQLConf is read at plan/execution
    // time, not when rerankOnQuantized builds its lazy DataFrame — so
    // the behavior change is accepted engine-wide and PINNED here on a
    // representative non-rerank join: both children pre-partitioned on
    // k1, joined on (k1, k2). With the conf at Spark's default (true)
    // this plan re-exchanges both sides on the full key set (4
    // exchanges); with graft's setting the subset co-partitioning is
    // accepted and the plan carries exactly the two repartition
    // exchanges. A failure here means the conf was removed, renamed, or
    // its default changed under a Spark upgrade — re-decide the scope
    // question at Tables.scala if so.
    import org.apache.spark.sql.functions.col
    def side(v: String) = spark.range(0, 1000)
      .select((col("id") % 10).as("k1"), (col("id") % 7).as("k2"),
        col("id").as(v))
      .repartition(8, col("k1"))
    val p = side("va").join(side("vb"), Seq("k1", "k2"))
      .queryExecution.executedPlan.toString
    assert(count(p, "Exchange") == 2,
      s"expected exactly the 2 caller repartitions — subset " +
        s"co-partitioning must not re-exchange:\n$p")
  }

  test("q_bootstrap_ci: the 16 replicate hashes are projected once, not re-embedded per CASE arm") {
    // r17 expression-dedup: inlining the Poisson-weight expression in the
    // aggregate re-embedded conv(substring(md5(...))) in every CASE arm
    // and both of each replicate's sums — the plan dump carried up to 160
    // md5 calls per row and the measured query sat at 16 s (sf0.1).
    // Projected once below the aggregate (plus an input fanout, the
    // r16 one-task-minhash fix), it is exactly 16: one per replicate.
    // CollapseProject must keep non-cheap multiply-referenced aliases out
    // of consumers for this to hold — if this count ever grows, that
    // optimizer contract (or the query's projection) broke.
    val p = plan("q_bootstrap_ci")
    val md5s = "md5\\(".r.findAllIn(p).size
    assert(md5s == 16, s"expected exactly 16 md5 projections, got $md5s:\n$p")
  }
}

package graft.streaming
import graft.ops.Money

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-windowed aggregation builders over the `events` fixture — the
  * Structured-Streaming surface of the engine (SURVEY.md §2.5: the
  * reference has no streaming; semantics specified from Spark's own
  * contract).
  *
  * Each builder works identically on a batch DataFrame and a streaming one
  * (`readStream`), which is how the specs verify stream/batch equivalence.
  * Window starts are emitted as epoch seconds (bigint) for engine-agnostic
  * comparison.
  */
object StreamOps {

  private lazy val graftLog =
    org.slf4j.LoggerFactory.getLogger(StreamOps.getClass)

  /** Run the tumbling aggregation through the REAL streaming engine and
    * return the drained result as a batch DataFrame: the source is staged
    * to a temp directory, read back with `readStream`, aggregated, and
    * written to a memory sink in COMPLETE output mode under an
    * `AvailableNow` trigger (process everything already there, then stop
    * — the batch-backfill trigger, so the result is deterministic and
    * equals the batch plan's answer). This puts the streaming engine
    * itself — micro-batch planner, state store, sink commit — under the
    * DuckDB differential gate rather than only under stream==batch specs.
    * Complete mode re-emits the full aggregate each micro-batch, so no
    * watermark is needed and no window is withheld at the end. */
  def tumblingViaStream(spark: SparkSession, source: DataFrame, tsCol: String,
                        duration: String, keys: Seq[Column],
                        aggs: Seq[Column], slide: Option[String] = None)
      : DataFrame = {
    val win = slide.map(s => window(col(tsCol), duration, s))
      .getOrElse(window(col(tsCol), duration))
    aggViaStream(spark, source, sdf =>
      sdf.groupBy(win +: keys: _*)
        .agg(aggs.head, aggs.tail: _*)
        .withColumn("window_start", unix_timestamp(col("window.start")))
        .drop("window"))
  }

  /** Session windows through the real streaming engine, same gate shape as
    * [[tumblingViaStream]]. Session state is the hardest streaming state
    * shape — windows MERGE as late rows bridge gaps — so running it under
    * the DuckDB oracle (complete mode: every micro-batch re-emits the
    * fully-merged sessions, no watermark withholding at end-of-input)
    * covers the merging-session state store path, not just batch
    * session_window. */
  def sessionViaStream(spark: SparkSession, source: DataFrame, tsCol: String,
                       gap: String, keys: Seq[Column], aggs: Seq[Column])
      : DataFrame =
    // one file per micro-batch: sessions then MUST merge across batches
    // (arbitrary event-time interleaving between files), exercising the
    // merging state store rather than a single-batch degenerate run
    aggViaStream(spark, source, sdf =>
      sdf.groupBy(session_window(col(tsCol), gap) +: keys: _*)
        .agg(aggs.head, aggs.tail: _*)
        .withColumn("session_start",
          unix_timestamp(col("session_window.start")))
        .drop("session_window"),
      maxFilesPerTrigger = Some(1))

  /** PRODUCTION-MODE session windows through the real streaming engine:
    * `withWatermark` + APPEND output — the mode an unbounded job actually
    * runs, where a session row is emitted exactly once, when the
    * watermark passes its end (last event + gap), and open sessions stay
    * withheld in the state store. Complements [[sessionViaStream]]
    * (complete mode), which re-emits the full merged aggregate and so
    * never exercises watermark-driven eviction/finalization. All staged
    * files process in ONE batch (no maxFilesPerTrigger): the watermark
    * starts at the epoch so nothing is dropped mid-run, then the
    * no-data finalization batch advances it to max(ts) − delay and
    * emits every session that closed before it — a deterministic,
    * oracle-checkable subset. (Cross-batch merging is q_stream_session's
    * gate; late-row drop and in-watermark merge are pinned
    * deterministically in StreamingSpec with a MemoryStream.) */
  def sessionViaStreamAppend(spark: SparkSession, source: DataFrame,
                             tsCol: String, gap: String, watermark: String,
                             keys: Seq[Column], aggs: Seq[Column])
      : DataFrame =
    aggViaStream(spark, source,
      sessionAggWatermarked(_, tsCol, gap, watermark, keys, aggs),
      outputMode = "append")

  /** The watermarked session aggregation [[sessionViaStreamAppend]]
    * drives, over an already-streaming (or batch) frame — split out so
    * deterministic MemoryStream specs can pin the per-row watermark
    * behaviors (late-row drop, in-watermark merge) batch by batch. */
  def sessionAggWatermarked(sdf: DataFrame, tsCol: String, gap: String,
                            watermark: String, keys: Seq[Column],
                            aggs: Seq[Column]): DataFrame =
    sdf.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start",
        unix_timestamp(col("session_window.start")))
      .drop("session_window")

  /** Streaming exact dedup through the REAL engine (at-least-once delivery
    * compaction): stage, readStream one file per micro-batch — so most
    * duplicates arrive in LATER batches and are dropped by the state left
    * from earlier ones, exercising the dedup state store rather than
    * intra-batch hashing — watermark + `dropDuplicatesWithinWatermark`,
    * append sink. Only the key columns are emitted: which physical row
    * survives is delivery-order-dependent, but the KEY SET is
    * deterministic, which is what makes the gate oracle-checkable. The
    * gate passes a watermark delay wider than the fixture's event-time
    * span so no state is evicted mid-run and the emitted set is exactly
    * the global distinct; the production horizon semantics — state
    * eviction once the watermark passes first-seen + delay, and
    * re-admission of the key after it — are pinned deterministically in
    * StreamingSpec. At 100 TB/unbounded the same plan runs with a real
    * horizon (hours/days) and state stays bounded by keys-per-horizon. */
  def dedupViaStream(spark: SparkSession, source: DataFrame, tsCol: String,
                     watermark: String, keyCols: Seq[String]): DataFrame =
    aggViaStream(spark, source, sdf =>
      sdf.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(keyCols)
        .select(keyCols.map(col): _*),
      maxFilesPerTrigger = Some(1), outputMode = "append")

  /** Stream-stream event-time interval join through the REAL engine,
    * with a watermark that ADVANCES (r11 — the production bounded-state
    * shape): both sides stage as event-time-range slices replayed one
    * file per micro-batch, so arrivals are coarsely time-ordered and a
    * span/4 watermark delay (≥ two slice widths) both never drops a row
    * and lets the symmetric join state EVICT progressively — state is
    * bounded by lookback + delay instead of the whole corpus, and the
    * per-batch watermark-maintenance scan stops being quadratic in
    * batches (the round-10 full-span-watermark gate measured 81 s/sf1;
    * this shape ~halves the held state). The emitted pair set is STILL
    * exactly the batch range join: a view with v_ts ≤ purchase ts lands
    * in a slice ≤ the purchase's slice (so it is in state or in the
    * same batch when the purchase arrives), and the right-side eviction
    * threshold watermark − lookback always trails the oldest view any
    * future purchase can need, because the watermark trails real event
    * time by the delay. An inner join emits eagerly as matches appear —
    * nothing waits on the watermark, so no sentinel is needed. */
  def intervalJoinViaStream(spark: SparkSession,
                            left: DataFrame, leftKey: String, leftTs: String,
                            right: DataFrame, rightKey: String,
                            rightTs: String, lookback: String): DataFrame = {
    val (lDelay, _, lLo, lHi) = watermarkPlan(left, leftTs)
    val (rDelay, _, rLo, rHi) = watermarkPlan(right, rightTs)
    val delayUs = math.max(lDelay, rDelay)
    val watermark = s"${delayUs / 1000000L} seconds"
    viaStream(spark, Seq(left, right),
      dfs => intervalJoin(dfs(0), leftKey, leftTs,
        dfs(1), rightKey, rightTs, lookback, watermark),
      maxFilesPerTrigger = Some(1), outputMode = "append",
      sliceBy = Map(0 -> leftTs, 1 -> rightTs),
      sliceBounds = Map(0 -> ((lLo, lHi)), 1 -> ((rLo, rHi))))
  }

  /** The watermark-buffered funnel state machine under the oracle gate,
    * MULTI-BATCH (r10 verdict item 3): events stage as event-time-range
    * slices replayed one file per micro-batch, and
    * [[BufferedFunnelProcessor]] holds each user's arrivals in ListState
    * until the watermark passes them, then runs the stage machine over
    * them in event-time order — so per-user order is established by the
    * WATERMARK (the production contract for bounded disorder), not by
    * sorting a lucky single batch. A sentinel row past every real event
    * plus the delay advances the final watermark over the whole corpus,
    * so end-of-input flushes everything through event-time timers and
    * the advancement rows equal the batch min-ts formulation exactly.
    * The caller rolls the bounded (≤3 rows/user) advancement stream up
    * to q_funnel's shape in batch — chaining a second stateful
    * aggregation behind an append-mode transformWithState inside one
    * streaming query is the multi-stateful pattern Spark restricts, and
    * the gate's target is the state machine, not the rollup. */
  def funnelViaStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val src0 = events.select(col("user_id").cast("long").as("user_id"),
      col("event_type"), col("ts").cast("timestamp").as("ts"))
    val (delayUs, sentinelUs, loUs, hiUs) = watermarkPlan(src0, "ts")
    val src = src0.unionByName(spark.range(1).select(
      lit(-1L).as("user_id"), lit("__wm__").as("event_type"),
      timestamp_micros(lit(sentinelUs)).as("ts")))
    withRocksDbStore(spark) {
      viaStream(spark, Seq(src), dfs =>
          bufferedFunnel(dfs.head
              .withWatermark("ts", s"${delayUs / 1000000L} seconds")
              .select(col("user_id"), col("event_type"),
                unix_micros(col("ts")).as("ts_us"), col("ts"))
              .as[(Long, String, Long, java.sql.Timestamp)])
            .toDF("user_id", "stage", "ts_us", "lag_us"),
        maxFilesPerTrigger = Some(1), outputMode = "append",
        sliceBy = Map(0 -> "ts"), sliceBounds = Map(0 -> ((loUs, hiUs))))
    }
  }

  /** Watermark parameters for the order-sensitive gates, picked at
    * runtime from the observed event-time span: a delay of a quarter
    * span (≥ two staging slice widths, so intra- and cross-slice
    * disorder is never late) and a sentinel timestamp one delay plus a
    * margin past the corpus max (final watermark = real max + margin →
    * every real event flushes at end-of-input). Returns
    * (delayUs, sentinelUs, loUs, hiUs); the bounds feed the gate's
    * [[stageTimeSliced]] call so the span is scanned ONCE per gate
    * (r12 — was one agg here plus one per staged source). An EMPTY
    * source gets safe defaults (the sentinel alone then flows and stays
    * withheld past the watermark → empty result, not the NPE the r11
    * shape threw on the null aggregate — ADVICE r11). */
  private def watermarkPlan(src: DataFrame, tsCol: String)
      : (Long, Long, Long, Long) = {
    val b = src.agg(min(unix_micros(col(tsCol))),
      max(unix_micros(col(tsCol)))).head()
    if (b.isNullAt(0)) return (60000000L, 70000000L, 0L, 0L)
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val delayUs = math.max((hi - lo) / 4, 60000000L)
    val marginUs = math.max((hi - lo) / 8, 10000000L)
    (delayUs, hi + delayUs + marginUs, lo, hi)
  }

  /** [[streamingNearDup]] under the oracle gate: documents stage and
    * re-read one file per micro-batch, so most bucket collisions pair a
    * new arrival against posting-list STATE left by earlier batches.
    * The candidate set is arrival-order-independent (every earlier
    * member is in state when a later one arrives), so multi-batch
    * replay is deterministic and equals the batch LSH candidate set at
    * signature level — which is what the DuckDB oracle computes. A pair
    * sharing several buckets emits once per bucket with the SAME
    * estimate (it depends only on the two signatures), so the caller's
    * `distinct()` collapses it exactly. */
  def nearDupViaStream(spark: SparkSession, docs: DataFrame, bands: Int,
                       rows: Int, simThreshold: Double): DataFrame = {
    import spark.implicits._
    val src = docs.select(col("doc_id").cast("long").as("_1"),
      col("text").as("_2"))
    withRocksDbStore(spark) {
      // FILE sink: candidate pairs are unbounded grain (~27M rows at
      // sf10 — a memory sink accumulates every pair in the driver and
      // OOMs a 64 GB heap; measured round 11). The executors write the
      // pairs to parquet and the read-back stays distributed.
      var loss: Option[NearDupLossAcc] = None
      val out = viaStream(spark, Seq(src),
        dfs => {
          val (pairs, l) = streamingNearDupWithLoss(
            dfs.head.as[(Long, String)], bands, rows, simThreshold)
          loss = Some(l)
          pairs.toDF("id_a", "id_b", "est_jaccard")
        },
        maxFilesPerTrigger = Some(1), outputMode = "append", fileSink = true)
      reportNearDupLoss(loss)
      out
    }
  }

  /** Watermark-buffered per-user running sums (flatMapGroupsWithState —
    * the remaining state API with no oracle-gated query) through the
    * real engine, MULTI-BATCH (r10 verdict item 3): events stage as
    * event-time-range slices replayed one file per micro-batch, and
    * [[statefulCumsumBuffered]] holds each user's arrivals in state
    * until the watermark passes them, then folds them into the running
    * sum in (event-time, id) order — prefix ORDER established by the
    * watermark, the production contract, instead of by a lucky
    * single-batch sort. End-of-input flush rides EventTimeTimeout: a
    * sentinel row past every real event plus the delay advances the
    * final watermark over the whole corpus. Cents carried as doubles
    * stay exact to 2^53, bit-identical to the oracle's BIGINT window
    * sum. */
  def cumsumViaStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val src0 = events.select(col("event_id").cast("long").as("event_id"),
      col("user_id").cast("long").as("user_id"),
      Money.cents(col("value")).cast("double").as("c"),
      col("ts").cast("timestamp").as("ts"))
    val (delayUs, sentinelUs, loUs, hiUs) = watermarkPlan(src0, "ts")
    val src = src0.unionByName(spark.range(1).select(
      lit(-1L).as("event_id"), lit(-1L).as("user_id"), lit(0.0).as("c"),
      timestamp_micros(lit(sentinelUs)).as("ts")))
    viaStream(spark, Seq(src), dfs =>
        statefulCumsumBuffered(dfs.head
            .withWatermark("ts", s"${delayUs / 1000000L} seconds")
            .select(col("event_id"), col("user_id"), col("c"),
              unix_micros(col("ts")).as("ts_us"), col("ts"))
            .as[(Long, Long, Double, Long, java.sql.Timestamp)])
          .toDF("event_id", "user_id", "run_c"),
      maxFilesPerTrigger = Some(1), outputMode = "append",
      // one output row PER EVENT — the unbounded-grain gate the memory
      // sink must not drain to the driver (10M rows at sf10); the file
      // sink keeps the result distributed end to end
      fileSink = true, sliceBy = Map(0 -> "ts"),
      sliceBounds = Map(0 -> ((loUs, hiUs))))
  }

  /** Stream-static enrichment + windowed rollup through the real engine:
    * the static dim is broadcast and RE-PLANNED per micro-batch (Spark's
    * contract for stream-static joins — a dim refresh lands on the next
    * batch), the enriched rows feed a tumbling aggregation in complete
    * mode, and per-file staging makes every micro-batch re-execute the
    * broadcast. The join is stateless, so multi-batch replay is
    * deterministic regardless of file order. */
  def enrichViaStream(spark: SparkSession, source: DataFrame,
                      static: DataFrame, keys: Seq[String], tsCol: String,
                      duration: String, groupKeys: Seq[Column],
                      aggs: Seq[Column]): DataFrame =
    viaStream(spark, Seq(source),
      dfs => enrichWithStatic(dfs.head, static, keys)
        .groupBy(window(col(tsCol), duration) +: groupKeys: _*)
        .agg(aggs.head, aggs.tail: _*)
        .withColumn("window_start", unix_timestamp(col("window.start")))
        .drop("window"),
      maxFilesPerTrigger = Some(1))

  /** [[enrichViaStream]] in PRODUCTION append mode (r11 verdict item 4):
    * `withWatermark` before the post-join tumbling rollup, append-mode
    * sink — the mode an unbounded deployment runs, where an enriched
    * window row is emitted exactly once, when the watermark passes its
    * end, and open windows stay withheld in state. Complements the
    * complete-mode gate (which re-emits everything and so never
    * exercises watermark finalization of the ENRICHED rollup). All
    * staged files process in one batch (the q_stream_session_append
    * shape): the watermark starts at the epoch so nothing drops mid-run,
    * then the no-data finalization batch advances it to max(ts) − delay
    * and emits every window that closed before it — a deterministic,
    * oracle-checkable subset. Per-batch dim re-planning is the complete
    * gate's job; late-row drop is pinned in StreamingSpec. */
  def enrichViaStreamAppend(spark: SparkSession, source: DataFrame,
                            static: DataFrame, keys: Seq[String],
                            tsCol: String, duration: String,
                            watermark: String, groupKeys: Seq[Column],
                            aggs: Seq[Column]): DataFrame =
    viaStream(spark, Seq(source),
      dfs => tumblingAggWatermarked(
        enrichWithStatic(dfs.head, static, keys),
        tsCol, duration, watermark, groupKeys, aggs),
      outputMode = "append")

  /** transformWithState requires the multi-column-family store: RocksDB
    * (also the provider a production deployment runs). Scope the conf to
    * one gate and restore, so the HDFS-backed default keeps covering the
    * windowed-aggregation gates. */
  /** Set/restore a block of session confs around `body` (gate-local
    * tuning; exception-safe restore). */
  private def withConf[A](spark: SparkSession, confs: Map[String, String])
      (body: => A): A = {
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def withRocksDbStore[A](spark: SparkSession)(body: => A): A =
    // Changelog checkpointing rides along for EVERY RocksDB gate (r13
    // verdict residual 2: the raw near-dup gate's band was
    // commit-dominated — commit_ms 32.8k of ~63 s at sf1 — because each
    // batch uploaded full SST snapshots per partition; the changelog
    // commits only the batch's delta and snapshots in the background,
    // the same setting the production gate already ran with).
    withConf(spark, Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        ("org.apache.spark.sql.execution.streaming.state" +
          ".RocksDBStateStoreProvider"),
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true"))(body)

  /** Shared drive-the-real-engine harness: stage the batch source to temp
    * parquet, readStream it, apply `buildAgg`, drain through an
    * AvailableNow memory sink (complete mode unless overridden — append
    * for watermarked production-mode gates), then clean up every staged
    * artifact (see the cleanup note below). */
  private def aggViaStream(spark: SparkSession, source: DataFrame,
                           buildAgg: DataFrame => DataFrame,
                           maxFilesPerTrigger: Option[Int] = None,
                           outputMode: String = "complete")
      : DataFrame =
    viaStream(spark, Seq(source), dfs => buildAgg(dfs.head),
      maxFilesPerTrigger, outputMode)

  /** Multi-source generalization of [[aggViaStream]]: stages EACH source
    * to its own temp dir and readStream, builds the (joined/combined)
    * streaming frame from all of them, drains and cleans identically.
    * Stream-stream join gates need it: both sides must be real streams
    * or Spark plans a stream-static join (different state machinery). */
  private def viaStream(spark: SparkSession, sources: Seq[DataFrame],
                        build: Seq[DataFrame] => DataFrame,
                        maxFilesPerTrigger: Option[Int] = None,
                        outputMode: String = "complete",
                        fileSink: Boolean = false,
                        sliceBy: Map[Int, String] = Map.empty,
                        sliceBounds: Map[Int, (Long, Long)] = Map.empty)
      : DataFrame =
    // Per-file-batch gates: 8 state partitions for the whole run. Every
    // micro-batch pays a state-store open/commit per partition per
    // stateful operator, so the session's 32 shuffle partitions are pure
    // fixed cost at fixture scale (measured −30% on the dedup gate at
    // sf0.1; dedup and interval-join re-verified checksum-exact at sf10
    // under 8). A real deployment sizes this to keys-per-horizon vs
    // executor memory — it is a deployment knob, not plan shape.
    withConf(spark, if (maxFilesPerTrigger.isDefined)
        Map("spark.sql.shuffle.partitions" -> "8") else Map.empty) {
    viaStream0(spark, sources, build, maxFilesPerTrigger, outputMode,
      fileSink, sliceBy, sliceBounds)
  }

  private def viaStream0(spark: SparkSession, sources: Seq[DataFrame],
                        build: Seq[DataFrame] => DataFrame,
                        maxFilesPerTrigger: Option[Int],
                        outputMode: String,
                        fileSink: Boolean,
                        sliceBy: Map[Int, String],
                        sliceBounds: Map[Int, (Long, Long)])
      : DataFrame = {
    val stages = sources.map(_ => java.nio.file.Files
      .createTempDirectory("graft-stream-src").toString)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt")
      .toString
    val sinkDir = if (fileSink)
      Some(java.nio.file.Files.createTempDirectory("graft-stream-out").toString)
    else None
    require(!fileSink || outputMode == "append",
      "file sink gates require append output mode")
    // Track the started query + temp view so the FAILURE path can stop the
    // query and drop the view BEFORE the staged directories are deleted —
    // otherwise a build()/awaitTermination() throw leaves a live query
    // whose source dirs the finally tears out from under it (ADVICE r10).
    var started: Option[org.apache.spark.sql.streaming.StreamingQuery] = None
    var view: Option[String] = None
    // cleanup must also run on the FAILURE path (a gate that throws mid
    // stream — bad conf, analysis error — must not leave staged dirs
    // behind; a long session of failed runs would otherwise accrete them)
    try {
    val streams = sources.zip(stages).zipWithIndex.map {
      case ((source, stage), si) =>
      // When the caller asks for per-file micro-batches, GUARANTEE there
      // are multiple files: a fixture-scale source scans as one split
      // (16 MB maxPartitionBytes), would stage as one parquet file, and
      // the "cross-batch state" gate would silently degenerate to a
      // single batch. The fan-out is round-robin, so event-time
      // interleaves arbitrarily across batches — the state-merge order
      // the gate means to exercise; every gated result (merged sessions,
      // dedup key set, join pair set) is order-independent, so the
      // answer is unchanged. `sliceBy` (source index → ts column)
      // switches a source to event-time-range slices instead, for gates
      // whose watermark must ADVANCE during replay.
      sliceBy.get(si) match {
        case Some(tsCol) =>
          stageTimeSliced(source, tsCol, stage, sliceBounds.get(si))
        case None =>
          val staged = if (maxFilesPerTrigger.isDefined &&
              source.rdd.getNumPartitions < 8) source.repartition(8)
            else source
          staged.write.mode("overwrite").parquet(stage)
      }
      val reader0 = spark.readStream.schema(source.schema)
      val reader = maxFilesPerTrigger
        .map(n => reader0.option("maxFilesPerTrigger", n)).getOrElse(reader0)
      reader.parquet(stage)
    }
    val agg = build(streams)
    val writer0 = sinkDir match {
      case Some(out) =>
        // FILE sink for unbounded-grain gates (per-event output like the
        // running-sum stream): the result lands as parquet written by the
        // executors and is read back DISTRIBUTED — the driver never holds
        // the rows (the memory sink would collect all of them: 10M rows /
        // tens of GB at sf10, the one driver-memory coupling the r10
        // verdict flagged in this harness).
        agg.writeStream.format("parquet").option("path", out)
      case None =>
        val name = "graft_stream_" +
          java.util.UUID.randomUUID.toString.replace("-", "")
        view = Some(name)
        agg.writeStream.format("memory").queryName(name)
    }
    ensureProgressListener(spark)
    val q = writer0
      .outputMode(outputMode)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    started = Some(q)
    q.awaitTermination()
    logGateProgress(q)
    started = None
    sinkDir match {
      case Some(out) =>
        // Lineage-cut the read-back (Phase.cut: distributed blocks — a
        // reliable checkpoint under spark.graft.checkpointDir) so the
        // staged sink directory can be deleted in the finally while the
        // returned frame stays valid. Explicit schema keeps an
        // empty-result gate readable. Repartition FIRST, sized by the
        // sink's on-disk volume (~32 MB parquet ≈ ~100 MB in-memory per
        // partition): the sink wrote under the gate's 8 state
        // partitions, so a large-grain result (27M pairs at sf10) lands
        // in a few fat files, and checkpoint blocks + downstream
        // per-task aggregation state sized by those files OOM'd a 16 GB
        // heap (round 11); core-count partitioning still left ~850k-row
        // aggregation maps racing 32-way for execution memory. Volume
        // keyed blocks stay bounded at any output grain.
        val sinkBytes = {
          val s = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
          try s.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum()
          finally s.close()
        }
        val parts = math.max(spark.sparkContext.defaultParallelism,
          (sinkBytes / (32L << 20) + 1).toInt)
        // DISK-backed cut, scoped to this read-back only: localCheckpoint
        // caches the blocks in the unified memory region, and an
        // unbounded-grain result (27M pairs ≈ several GB at sf10) pins
        // it hard enough that the next aggregation cannot acquire a
        // single page (measured: default and 16 GB drivers both OOM).
        // The batch pipelines keep their fast in-memory cuts — their cut
        // results are bounded by design; a streaming gate's output grain
        // is the one thing the harness cannot bound.
        withConf(spark, Map(graft.ops.Phase.ConfKey -> streamCkptDir)) {
          graft.ops.Phase.cut(spark.read.schema(agg.schema).parquet(out)
            .repartition(parts))
        }
      case None =>
        // Drain the memory sink into a local relation and release
        // everything the run staged: the sink already holds the full
        // (bounded, windowed aggregate) result in driver memory, so the
        // copy adds no new scale hazard, and it lets repeated Bench/
        // Verify/TimeQ invocations run leak-free — temp view dropped,
        // stage parquet + checkpoint deleted.
        val name = view.get
        val res = localize(spark, spark.table(name))
        spark.catalog.dropTempView(name)
        view = None
        res
    }
    } finally {
      started.foreach(q => try q.stop() catch { case e: Throwable =>
        graftLog.warn(s"viaStream: could not stop failed query: ${e.getMessage}") })
      view.foreach(n => try spark.catalog.dropTempView(n) catch { case _: Throwable => () })
      cleanupDirs(stages ++ sinkDir :+ ckpt)
    }
  }

  /** Per-run progress accumulator behind [[logGateProgress]]:
    * `q.recentProgress` retains only the last
    * `spark.sql.streaming.numRecentProgressUpdates` entries (default
    * 100), so a gate draining more micro-batches would silently
    * under-report its summed update/commit/RocksDB totals while the log
    * line reads as a per-run sum (ADVICE r13). A session-level
    * StreamingQueryListener records EVERY progress event by runId;
    * logGateProgress merges the accumulated list with recentProgress
    * (dedup by batchId — the listener bus is async, so the final
    * batch's event can still be in flight when awaitTermination
    * returns) and removes the entry. Bounded: entries are dropped once
    * logged, and the map refuses new runIds past 64 in flight. */
  private val progressAcc = new java.util.concurrent.ConcurrentHashMap[
    java.util.UUID,
    scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.streaming.StreamingQueryProgress]]()
  // FIFO of live runIds: at the 64-entry bound the OLDEST run is evicted
  // (a gate that threw before logging and leaked its buffer) instead of
  // refusing new runIds — refusal would starve every later gate back to
  // the recentProgress cap, the exact under-reporting this exists to fix
  private val progressOrder =
    new java.util.concurrent.ConcurrentLinkedQueue[java.util.UUID]()
  // runIds already logged: the listener bus is async, so the final
  // progress event can arrive AFTER logGateProgress removed the entry —
  // without this guard it would re-insert a one-event buffer that leaks
  // forever. Bounded LRU (eldest evicted past 256).
  private val closedRuns = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[java.util.UUID, java.lang.Boolean]() {
      override def removeEldestEntry(
          e: java.util.Map.Entry[java.util.UUID, java.lang.Boolean]): Boolean =
        size > 256
    })
  // weakly keyed (the bucketStatsSessions rationale): a JVM that churns
  // sessions must not accrete strong refs to dropped ones
  private val progressListenerSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.lang.Boolean]())
  private def ensureProgressListener(spark: SparkSession): Unit =
    if (progressListenerSessions.put(spark, java.lang.Boolean.TRUE) == null) {
      import org.apache.spark.sql.streaming.StreamingQueryListener
      spark.streams.addListener(new StreamingQueryListener {
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val rid = e.progress.runId
          if (!closedRuns.containsKey(rid)) {
            if (!progressAcc.containsKey(rid) && progressAcc.size >= 64) {
              val evict = progressOrder.poll()
              if (evict != null) progressAcc.remove(evict)
            }
            val buf = progressAcc.computeIfAbsent(rid, r => {
              progressOrder.add(r)
              scala.collection.mutable.ArrayBuffer()
            })
            // per-RUN bound (the 64-entry FIFO bounds run COUNT only): a
            // continuous query that never reaches logGateProgress would
            // otherwise grow its buffer one progress object per trigger
            // forever. Drop-oldest keeps the tail, which the recentProgress
            // merge overlaps — far beyond any gate's batch count (gates
            // drain ≤ a few hundred).
            buf.synchronized {
              if (buf.size >= 8192) buf.remove(0)
              buf += e.progress
            }
          }
        }
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })
    }

  /** Aggregate and log state-store metrics across a drained gate's
    * micro-batches (r12 verdict item 1 — observability for the sf1 gate
    * timing drift): per stateful operator, batch count, input rows,
    * final state rows/bytes, summed update/removal/commit work and the
    * RocksDB byte traffic when that provider is active. One stdout line
    * per operator (the bench/TimeQ harnesses capture stdout — same
    * channel as the lsh-bucket-stats line), so every gate run carries
    * the measurement that separates state-I/O growth from box weather. */
  private def logGateProgress(
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = try {
    closedRuns.put(q.runId, java.lang.Boolean.TRUE) // before the remove:
    // a trailing async event must not re-insert a buffer we just logged
    val accumulated = Option(progressAcc.remove(q.runId))
      .map(buf => buf.synchronized { buf.toList }).getOrElse(Nil)
    progressOrder.remove(q.runId)
    // merge (listener may trail the last batch; recentProgress may have
    // evicted early batches) and dedup by batchId, batch order restored
    val progs = (accumulated ++ q.recentProgress)
      .groupBy(_.batchId).map(_._2.head).toArray.sortBy(_.batchId)
    if (progs.isEmpty) return
    val batches = progs.length
    val inRows = progs.map(_.numInputRows).sum
    // (opName, opIndex-within-plan) → summed/last metrics; LinkedHashMap
    // keeps plan order in the log
    case class Agg(var stateRows: Long = 0L, var memBytes: Long = 0L,
                   var updated: Long = 0L, var removed: Long = 0L,
                   var droppedWm: Long = 0L, var updateMs: Long = 0L,
                   var removalMs: Long = 0L, var commitMs: Long = 0L,
                   var rdbRead: Long = 0L, var rdbWrite: Long = 0L)
    val byOp = scala.collection.mutable.LinkedHashMap[String, Agg]()
    progs.foreach { p =>
      p.stateOperators.zipWithIndex.foreach { case (so, i) =>
        val name = Option(so.operatorName).filter(_.nonEmpty)
          .getOrElse("stateOp") + s"#$i"
        val a = byOp.getOrElseUpdate(name, Agg())
        a.stateRows = so.numRowsTotal          // last batch wins
        a.memBytes  = so.memoryUsedBytes
        a.updated   += so.numRowsUpdated
        a.removed   += so.numRowsRemoved
        a.droppedWm += so.numRowsDroppedByWatermark
        a.updateMs  += so.allUpdatesTimeMs
        a.removalMs += so.allRemovalsTimeMs
        a.commitMs  += so.commitTimeMs
        val cm = so.customMetrics
        if (cm != null) {
          a.rdbRead  += Option(cm.get("rocksdbTotalBytesRead")).map(_.longValue).getOrElse(0L)
          a.rdbWrite += Option(cm.get("rocksdbTotalBytesWritten")).map(_.longValue).getOrElse(0L)
        }
      }
    }
    if (byOp.isEmpty)
      println(s"[graft] stream-gate-state batches=$batches " +
        s"input_rows=$inRows state_ops=0")
    else byOp.foreach { case (name, a) =>
      println(s"[graft] stream-gate-state op=$name batches=$batches " +
        s"input_rows=$inRows state_rows=${a.stateRows} " +
        s"state_bytes=${a.memBytes} updated=${a.updated} " +
        s"removed=${a.removed} dropped_by_wm=${a.droppedWm} " +
        s"update_ms=${a.updateMs} removal_ms=${a.removalMs} " +
        s"commit_ms=${a.commitMs} rocksdb_read_bytes=${a.rdbRead} " +
        s"rocksdb_write_bytes=${a.rdbWrite}")
    }
    // Micro-batch DURATION attribution (r15 verdict item 4): the state
    // lines above cover only state-store work; the rest of a gate's wall
    // time hides in the trigger pipeline. Sum Spark's per-batch
    // durationMs phases across the run — triggerExecution is the total,
    // addBatch the plan's execute (query compute + state ops),
    // queryPlanning the per-batch re-plan, walCommit/commitOffsets the
    // checkpoint log I/O, latestOffset/getBatch the source admin — so a
    // slow gate shows WHICH phase grew without a profiler attach.
    val dur = scala.collection.mutable.LinkedHashMap[String, Long]()
    progs.foreach { p =>
      val dm = p.durationMs
      if (dm != null) dm.forEach { (k, v) =>
        dur.update(k, dur.getOrElse(k, 0L) + v.longValue)
      }
    }
    if (dur.nonEmpty)
      println(s"[graft] stream-gate-durations batches=$batches " +
        dur.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${k}_ms=$v" }.mkString(" "))
  } catch { case e: Throwable =>
    graftLog.warn(s"stream-gate-state logging failed: ${e.getMessage}")
  }

  /** Copy a bounded frame into a local relation so every staged artifact
    * behind it can be deleted (gate results are windowed aggregates /
    * key sets / snapshots — bounded by construction). */
  private def localize(spark: SparkSession, df: DataFrame): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(df.collect(): _*)),
      df.schema)

  private def cleanupDirs(dirs: Seq[String]): Unit =
    dirs.foreach { d =>
      try {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
        // close the walk stream (it holds a directory handle) before the
        // deletes; materialize first so the reverse traversal is safe
        val paths = try walk.iterator().asScala.toSeq finally walk.close()
        paths.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case e: Throwable =>
        graftLog.warn(s"viaStream: could not clean $d: ${e.getMessage}")
      }
    }

  /** Number of event-time slices [[stageTimeSliced]] writes. */
  private val TimeSlices = 8

  /** JVM-unique reliable-checkpoint dir for the file-sink read-back cuts
    * (deleted on exit; mirrors GraftSession's warehouse lifecycle). */
  private lazy val streamCkptDir: String = {
    val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      s"/graft-stream-ckpt-${java.util.UUID.randomUUID().toString.take(8)}"
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import scala.jdk.CollectionConverters._
        val p = java.nio.file.Paths.get(dir)
        if (java.nio.file.Files.exists(p)) {
          val walk = java.nio.file.Files.walk(p)
          val paths = try walk.iterator().asScala.toSeq finally walk.close()
          paths.reverse.foreach(q => java.nio.file.Files.deleteIfExists(q))
        }
      } catch { case _: Throwable => () } // exit path: never throw
    ))
    dir
  }

  /** EVENT-TIME-ORDERED staging for order-sensitive state machines: the
    * source is cut into [[TimeSlices]] contiguous time-range slices,
    * written as `slice-000 … slice-00{n}` with strictly increasing
    * modification times, so the file source (oldest-modified first)
    * replays the stream in coarse event-time order — the arrival model
    * watermarks are FOR (production streams arrive roughly time-ordered
    * with bounded disorder; the round-robin fan-out's unbounded disorder
    * is precisely what no watermark can absorb). Within a slice, order
    * stays arbitrary: a watermark delay of one slice width or more
    * covers it, which the buffered processors' gates pick at runtime
    * from the observed span. */
  private[graft] def stageTimeSliced(source: DataFrame, tsCol: String,
                                     stage: String,
                                     bounds: Option[(Long, Long)] = None): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val withUs = source.withColumn("__us",
      unix_micros(col(tsCol).cast("timestamp")))
    val loHi = bounds.orElse {
      val b = withUs.agg(min(col("__us")), max(col("__us"))).head()
      if (b.isNullAt(0)) None else Some((b.getLong(0), b.getLong(1)))
    }
    loHi match {
      case None =>
        // empty source (ADVICE r11: the unguarded getLong NPE'd here):
        // stage one empty file so the gate replays to an empty result
        source.coalesce(1).write.mode("overwrite").parquet(stage)
      case Some((lo, hi)) =>
        val width = math.max((hi - lo) / TimeSlices + 1, 1L)
        // ONE source scan (r12, verdict item 7 — was one filter pass per
        // slice): tag each row with its slice id, hash-partition by the
        // tag so every slice lands in exactly one task (one part file per
        // Hive dir), write `partitionBy(__slice)` — the data files then
        // carry exactly the source schema — and move each slice's file
        // into place with strictly increasing mtimes. `least` clamps rows
        // past `hi` into the LAST slice: with watermarkPlan's real-event
        // bounds, that is where the end-of-input sentinel rides.
        // `greatest` clamps rows BELOW `lo` into the FIRST slice (ADVICE
        // r12: caller-supplied bounds that under-cover the low side used
        // to yield a negative __slice whose directory the move loop never
        // picks up — a silent drop from the replay).
        val tmp = Files.createTempDirectory("graft-stream-slice").toString
        try {
          withUs.withColumn("__slice",
              greatest(lit(0L),
                least(floor((col("__us") - lit(lo)) / lit(width)),
                  lit((TimeSlices - 1).toLong))).cast("int"))
            .drop("__us")
            .repartition(TimeSlices, col("__slice"))
            .write.partitionBy("__slice").mode("overwrite").parquet(tmp)
          val baseMs = System.currentTimeMillis()
          (0 until TimeSlices).foreach { k =>
            val dir = Paths.get(tmp, s"__slice=$k")
            val part = if (Files.exists(dir)) {
              val s = Files.list(dir)
              try s.filter(p =>
                p.getFileName.toString.startsWith("part-")).findFirst()
              finally s.close()
            } else java.util.Optional.empty[java.nio.file.Path]()
            if (part.isPresent) {
              val target = Paths.get(stage, f"slice-$k%03d.parquet")
              Files.move(part.get(), target, StandardCopyOption.ATOMIC_MOVE)
              // deterministic replay order even on coarse-mtime filesystems
              Files.setLastModifiedTime(target,
                java.nio.file.attribute.FileTime.fromMillis(baseMs + k))
            }
          }
        } finally cleanupDirs(Seq(tmp))
    }
  }

  /** [[upsertSnapshot]] under the oracle gate (stage-then-clean, the
    * q_embed_lsh_index pattern for side-effecting paths): the source
    * replays one staged file per micro-batch through
    * `writeStream.foreachBatch(upsertSnapshot(...))`, so every batch
    * compacts against the previous batch's committed snapshot and swaps
    * the `_CURRENT` pointer — the full exactly-once chain, not a
    * single-batch degenerate. The final snapshot is read back via the
    * pointer, localized (bounded: one row per key), and every artifact
    * deleted. With a UNIQUE version column the per-key argmax is
    * associative and order-independent, so any batch interleaving
    * yields the same final snapshot — what makes the gate exact. */
  def upsertViaStream(spark: SparkSession, source: DataFrame,
                      keys: Seq[String], verCol: String): DataFrame = {
    val stage = java.nio.file.Files.createTempDirectory("graft-stream-src")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt")
      .toString
    val snap = java.nio.file.Files.createTempDirectory("graft-stream-snap")
      .toString
    try {
    val staged = if (source.rdd.getNumPartitions < 8) source.repartition(8)
      else source
    staged.write.mode("overwrite").parquet(stage)
    val stream = spark.readStream.schema(source.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    ensureProgressListener(spark)
    val q = stream.writeStream
      .foreachBatch(upsertSnapshot(snap, keys, verCol))
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    logGateProgress(q)
    val pointer = java.nio.file.Paths.get(snap, "_CURRENT")
    // an empty source commits no batch and never writes the pointer —
    // fail with the cause, not a bare NoSuchFileException
    require(java.nio.file.Files.exists(pointer),
      s"upsertViaStream: no snapshot committed under $snap (empty source?)")
    localize(spark, readSnapshot(spark, snap))
    } finally cleanupDirs(Seq(stage, ckpt, snap))
  }

  /** Streaming crawl → persisted IVF index (the index-maintenance sink a
    * production embedding ingest runs): the source replays one staged
    * file per micro-batch and EVERY batch is assigned against the frozen
    * stored codebook and appended to the bucketed postings inside
    * `foreachBatch` ([[graft.ops.SimilarityOps.appendIvfIndex]]) — so
    * cross-batch the index accretes exactly like daily crawl deliveries,
    * and the probe afterwards sees the union. Gate contract (same
    * stage-then-clean shape as [[upsertViaStream]]): every batch append is
    * FENCED through [[IndexFence.fencedAppend]] (r14 verdict item 2) — a
    * writer epoch claimed before the stream starts plus a committed-batch
    * manifest next to the postings table, so a failure-recovery
    * redelivery of a micro-batch is an exactly-once no-op (and a crash
    * mid-append is repaired by the pending-listing orphan purge) instead
    * of a silent double-append; a zombie writer fails loudly. */
  def ivfAppendViaStream(spark: SparkSession, batches: DataFrame,
                         idCol: String, vecCol: String,
                         table: String): Unit = {
    val stage = java.nio.file.Files.createTempDirectory("graft-stream-ivf")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ivfck")
      .toString
    try {
      val staged = if (batches.rdd.getNumPartitions < 8)
        batches.repartition(8) else batches
      staged.write.mode("overwrite").parquet(stage)
      val stream = spark.readStream.schema(batches.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
      ensureProgressListener(spark)
      // epoch claimed at CONSTRUCTION (before the stream starts), same
      // contract as upsertSnapshot: epochs follow writer start order
      val myClaim = IndexFence.claimWriterEpoch(spark, s"${table}_postings")
      val q = stream.writeStream
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          IndexFence.fencedAppend(spark, Seq(s"${table}_postings"),
            myClaim, batchId) {
            graft.ops.SimilarityOps.appendIvfIndex(df, idCol, vecCol, table)
          }
          () // foreachBatch wants Unit; fencedAppend returns ran/skipped
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // a foreachBatch throw must not leave the query running while the
      // finally deletes its source dirs (the viaStream failure contract)
      try {
        q.awaitTermination()
        logGateProgress(q)
      } finally if (q.isActive) {
        try q.stop() catch { case e: Throwable =>
          graftLog.warn(s"ivfAppendViaStream: could not stop failed " +
            s"query: ${e.getMessage}")
        }
      }
    } finally cleanupDirs(Seq(stage, ckpt))
  }

  /** Tumbling event-time windows: one row per (window, extra keys). */
  def tumblingAgg(df: DataFrame, tsCol: String, duration: String,
                  keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), duration) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", unix_timestamp(col("window.start")))
      .drop("window")

  /** Sliding event-time windows. */
  def slidingAgg(df: DataFrame, tsCol: String, duration: String, slide: String,
                 keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), duration, slide) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", unix_timestamp(col("window.start")))
      .drop("window")

  /** Session windows with a fixed gap: events of one key belong to one
    * session while consecutive gaps stay < gap. */
  def sessionAgg(df: DataFrame, tsCol: String, gap: String,
                 keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", unix_timestamp(col("session_window.start")))
      .drop("session_window")

  /** Watermarked streaming variant of [[tumblingAgg]] for append-mode
    * sinks; batch frames pass through `withWatermark` untouched. */
  def tumblingAggWatermarked(df: DataFrame, tsCol: String, duration: String,
                             watermark: String, keys: Seq[Column],
                             aggs: Seq[Column]): DataFrame =
    tumblingAgg(df.withWatermark(tsCol, watermark), tsCol, duration, keys, aggs)

  /** Streaming exact dedup by key: state-backed drop of reruns within the
    * watermark horizon. */
  def streamingDedup(df: DataFrame, tsCol: String, watermark: String,
                     keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Event-time interval join (stream-stream or batch): each left row
    * joins right rows with the same key whose timestamp falls in
    * [left.ts − lookback, left.ts]. Watermarks on both sides bound the
    * join state (Spark drops right-state older than the watermark +
    * interval), which is what makes the stream-stream join runnable
    * indefinitely; on batch frames `withWatermark` is a no-op and the same
    * builder plans a plain range-condition join. Key columns must be
    * distinctly named on the two sides. */
  def intervalJoin(left: DataFrame, leftKey: String, leftTs: String,
                   right: DataFrame, rightKey: String, rightTs: String,
                   lookback: String, watermark: String): DataFrame = {
    // The condition uses unqualified col() names: a column present on BOTH
    // sides would either fail as ambiguous or silently resolve to one side.
    // Enforce the disjoint-name contract loudly at build time.
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"intervalJoin requires disjoint column names; shared: ${shared.toSeq.sorted.mkString(", ")}")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL '$lookback'") &&
        col(rightTs) <= col(leftTs))
  }

  /** Custom per-key running state via flatMapGroupsWithState: emits each
    * input event with its per-key running sum — the stateful analog of
    * `group_cumsum` for unbounded streams (reference cumulative kernels
    * need the whole group in hand; stream state holds just one double per
    * key).
    *
    * The intra-batch `toSeq.sortBy` materializes one key's slice of ONE
    * micro-batch (bounded by trigger size) — fine for streams; for large
    * BATCH groups use [[batchCumsum]], which never materializes a group. */
  def statefulCumsum(ds: org.apache.spark.sql.Dataset[(Long, Long, Double)])
      : org.apache.spark.sql.Dataset[(Long, Long, Double)] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    ds.groupByKey(_._2)
      .flatMapGroupsWithState[Double, (Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Double)], state: GroupState[Double]) =>
          var acc = state.getOption.getOrElse(0.0)
          // within a micro-batch, order by the event id for determinism
          val out = rows.toSeq.sortBy(_._1).map { case (id, k, v) =>
            acc += v
            (id, k, acc)
          }
          state.update(acc)
          out.iterator
      }
  }

  /** Watermark-buffered running sum on flatMapGroupsWithState +
    * EventTimeTimeout: arrivals pend in state until the watermark passes
    * them, then fold into the per-key sum in (event-time, id) order —
    * per-key prefix ORDER comes from the watermark (bounded-disorder
    * production contract), not from intra-batch luck. The timeout
    * timestamp tracks the earliest pending row so watermark advances
    * with NO new data for the key (including the end-of-input no-data
    * batch) still flush it. Pending state is bounded by
    * events-per-key-per-delay-horizon — the same bound every watermarked
    * Spark aggregation carries. Input must be watermarked on its 5th
    * (timestamp) column; rows are (id, key, cents, ts_us, ts). */
  def statefulCumsumBuffered(
      ds: org.apache.spark.sql.Dataset[(Long, Long, Double, Long, java.sql.Timestamp)])
      : org.apache.spark.sql.Dataset[(Long, Long, Double)] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    ds.groupByKey(_._2)
      .flatMapGroupsWithState[(Double, Seq[(Long, Double, Long)]),
        (Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Double, Long, java.sql.Timestamp)],
         state: GroupState[(Double, Seq[(Long, Double, Long)])]) =>
          var (acc, pending) = state.getOption.getOrElse(
            (0.0, Seq.empty[(Long, Double, Long)]))
          pending = pending ++ rows.map(r => (r._1, r._3, r._4))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, hold) = pending.partition(_._3 <= wmUs)
          val out = ready.sortBy(r => (r._3, r._1)).map { case (id, c, _) =>
            acc += c
            (id, key, acc)
          }
          state.update((acc, hold))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(hold.map(_._3).min / 1000L + 1L)
          out.iterator
      }
  }

  /** The same per-key running sum on Spark 4's `transformWithState`
    * stateful-processor API (the successor to flatMapGroupsWithState):
    * typed `ValueState` holds one double per key, optionally TTL-bounded.
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`) when run as a
    * stream — which is also what makes the state disk-backed and
    * unbounded-key-safe at 100 TB. */
  class RunningSumProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Double), (Long, Long, Double)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState}
    @transient private var sumState: ValueState[Double] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sumState = getHandle.getValueState[Double]("sum",
        org.apache.spark.sql.Encoders.scalaDouble, TTLConfig.NONE)
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, Double)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Double)] = {
      var acc = if (sumState.exists()) sumState.get() else 0.0
      val out = rows.toSeq.sortBy(_._1).map { case (id, k, v) =>
        acc += v
        (id, k, acc)
      }
      sumState.update(acc)
      out.iterator
    }
  }

  /** Streaming conversion funnel (signup → view → purchase) as a per-user
    * state machine on transformWithState — the unbounded-stream analog of
    * the batch q_funnel: `ValueState` holds the first completion time of
    * each stage (3 longs per user; RocksDB-backed at scale), and a row
    * advances the machine when its predecessor stage is complete and its
    * timestamp is at-or-after that completion. Emits one row per stage
    * advancement: (user_id, stage, ts_us, lag_us).
    *
    * Batch parity assumes in-order delivery per user within the watermark
    * horizon (rows inside a micro-batch are ordered here; late data that
    * would back-date a stage is the trade-off every streaming funnel
    * makes — the batch query remains the reconciliation path). */
  class FunnelProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, String, Long), (Long, Int, Long, Long)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState}
    @transient private var st: ValueState[(Long, Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)]("funnel",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, String, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Int, Long, Long)] = {
      var (t1, t2, t3) = if (st.exists()) st.get() else (-1L, -1L, -1L)
      val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Long)]()
      // secondary sort on stage rank: the batch/oracle formulation uses
      // ts >= t_prev, so a view tied to the microsecond with the signup
      // that enables it still counts — timestamp-only ordering would make
      // that tie resolve by arrival order (ADVICE r10)
      rows.toSeq.sortBy(r => (r._3, FunnelStageRank(r._2))).foreach {
        case (_, tpe, ts) =>
          if (t1 < 0 && tpe == "signup") {
            t1 = ts; out += ((key, 1, ts, 0L))
          } else if (t1 >= 0 && t2 < 0 && tpe == "view" && ts >= t1) {
            t2 = ts; out += ((key, 2, ts, ts - t1))
          } else if (t2 >= 0 && t3 < 0 && tpe == "purchase" && ts >= t2) {
            t3 = ts; out += ((key, 3, ts, ts - t2))
          }
      }
      st.update((t1, t2, t3))
      out.iterator
    }
  }

  /** Watermark-buffered funnel machine (the multi-batch production form
    * of [[FunnelProcessor]]): arrivals pend in ListState until the
    * watermark passes them, then advance the per-user stage machine in
    * (event-time, stage-rank) order. An event-time TIMER at the earliest
    * pending row guarantees the flush happens even when later batches
    * carry no rows for the key — in particular the end-of-input no-data
    * batch after the sentinel advances the final watermark. Pending
    * state per key is bounded by events-per-key-per-delay-horizon. */
  class BufferedFunnelProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, String, Long, java.sql.Timestamp), (Long, Int, Long, Long)] {
    import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode, TTLConfig, ValueState}
    @transient private var st: ValueState[(Long, Long, Long)] = _
    @transient private var pending: ListState[(String, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[(Long, Long, Long)]("funnel",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)
      pending = getHandle.getListState[(String, Long)]("pending",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)
    }
    private def flush(key: Long, wmMs: Long): Iterator[(Long, Int, Long, Long)] = {
      val wmUs = wmMs * 1000L
      val all = scala.collection.mutable.ArrayBuffer[(String, Long)]()
      val it = pending.get()
      while (it.hasNext) all += it.next()
      val (ready, hold) = all.partition(_._2 <= wmUs)
      val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Long)]()
      if (ready.nonEmpty) {
        var (t1, t2, t3) = if (st.exists()) st.get() else (-1L, -1L, -1L)
        ready.sortBy(r => (r._2, FunnelStageRank(r._1))).foreach {
          case (tpe, ts) =>
            if (t1 < 0 && tpe == "signup") {
              t1 = ts; out += ((key, 1, ts, 0L))
            } else if (t1 >= 0 && t2 < 0 && tpe == "view" && ts >= t1) {
              t2 = ts; out += ((key, 2, ts, ts - t1))
            } else if (t2 >= 0 && t3 < 0 && tpe == "purchase" && ts >= t2) {
              t3 = ts; out += ((key, 3, ts, ts - t2))
            }
        }
        st.update((t1, t2, t3))
        pending.clear()
        if (hold.nonEmpty) pending.put(hold.toArray)
      }
      if (hold.nonEmpty)
        getHandle.registerTimer(hold.map(_._2).min / 1000L + 1L)
      out.iterator
    }
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, String, Long, java.sql.Timestamp)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Int, Long, Long)] = {
      rows.foreach(r => pending.appendValue((r._2, r._3)))
      flush(key, timers.getCurrentWatermarkInMs())
    }
    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[(Long, Int, Long, Long)] =
      flush(key, timerValues.getCurrentWatermarkInMs())
  }

  /** [[BufferedFunnelProcessor]] over watermarked
    * (user_id, event_type, ts_us, ts) rows — event-time mode so the
    * flush timers fire off the watermark. */
  def bufferedFunnel(
      ds: org.apache.spark.sql.Dataset[(Long, String, Long, java.sql.Timestamp)])
      : org.apache.spark.sql.Dataset[(Long, Int, Long, Long)] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    ds.groupByKey(_._1)
      .transformWithState(new BufferedFunnelProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Tie-break order for same-timestamp funnel events: a stage's enabling
    * predecessor sorts first, matching the batch `ts >= t_prev` semantics
    * deterministically. */
  private[graft] val FunnelStageRank: Map[String, Int] =
    Map("signup" -> 0, "view" -> 1, "purchase" -> 2).withDefaultValue(3)

  /** [[FunnelProcessor]] over (user_id, event_type, ts_us) rows. */
  def streamingFunnel(ds: org.apache.spark.sql.Dataset[(Long, String, Long)])
      : org.apache.spark.sql.Dataset[(Long, Int, Long, Long)] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    ds.groupByKey(_._1)
      .transformWithState(new FunnelProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** JVM-wide count of postings the streaming LSH bucket cap dropped —
    * the diagnostic mirror of the batch path's `observe` metrics
    * (per-executor in a distributed deployment; the per-bucket WARN is
    * the operational signal a real run ships). */
  val nearDupDroppedPostings = new java.util.concurrent.atomic.AtomicLong

  /** Cluster-correct recall-loss accounting for the streaming LSH cap
    * (r12 verdict item 2 — quantified, not just flagged): Spark
    * accumulators, so executor-side increments aggregate on the driver
    * in a real deployment, unlike the JVM-local AtomicLong above.
    *
    *   - `postings`: every row that reached the processor (the ppm
    *     denominator);
    *   - `dropped`: postings discarded because their bucket sat at the
    *     cap — near-dups against them are MISSED;
    *   - `suppressedPairsUb`: Σ over drops of the bucket's live size at
    *     drop time — an upper bound on the candidate pairs the drops
    *     suppressed (each dropped posting would have paired against at
    *     most the bucket's live members).
    */
  case class NearDupLossAcc(
      postings: org.apache.spark.util.LongAccumulator,
      dropped: org.apache.spark.util.LongAccumulator,
      suppressedPairsUb: org.apache.spark.util.LongAccumulator) {
    // AT-LEAST-ONCE counters (ADVICE r13): these accumulate inside a
    // transformation (handleInputRows), so task retries and speculative
    // execution DOUBLE-COUNT on a real cluster — read every value as an
    // upper bound unless speculation is off and the run had no retries
    // (true of the local gates these instrument). The EMITTED PAIR SET
    // is exactly-once regardless (state commits are transactional); only
    // this diagnostic can over-report.
    def droppedPpm: Long =
      if (postings.value == 0L) 0L
      else dropped.value * 1000000L / postings.value
    /** One parsable stdout line per gate run — same channel as the batch
      * path's `lsh-bucket-stats` line. */
    def report: String =
      s"[graft] stream-lsh-loss postings=${postings.value} " +
        s"dropped=${dropped.value} dropped_ppm=$droppedPpm " +
        s"suppressed_pairs_ub=${suppressedPairsUb.value}"
  }


  /** Band a frame carrying a per-row `sig` array: explode band INDICES
    * first, then derive each band's bucket from the signature AFTER the
    * Generate. Order matters for cost, not correctness: a projection
    * that computes `sig` collapses into any sibling projection that
    * references it (CollapseProject), so banding as
    * `explode(array(<16 element_at(sig,…) refs>))` re-evaluates the
    * whole minhash expression once per reference — measured ~5 s of a
    * 6.4 s micro-batch at sf1 (2.3 ms/doc × 17 copies). A Generate is a
    * collapse barrier, so exploding plain band indices below and
    * extracting `element_at(sig, band·rows+r+1)` above it evaluates the
    * signature exactly once per document. */
  private[graft] def bandBuckets(df: DataFrame, bands: Int, rows: Int): DataFrame =
    df.select(col("*"),
        explode(array((0 until bands).map(b => lit(b)): _*)).as("__band"))
      .withColumn("bucket", concat_ws("_", col("__band") +:
        (0 until rows).map(r =>
          element_at(col("sig"), col("__band") * lit(rows) + lit(r + 1))): _*))

  /** Streaming MinHash near-dup over raw (id, text) rows — the
    * raw-corpus diagnostic gate: band the per-row signature, key by
    * (band, bucket), scan bucket state. Runs [[NearDupTtlProcessor]]
    * with an INFINITE horizon (r12 — the raw and production gates share
    * one state machine, so the hot-bucket cap and any future fix land
    * once). Ids ride the digest slot as zero-padded decimals: the
    * processor's lexicographic (lo, hi) pair ordering then matches the
    * numeric order the batch LSH / DuckDB oracle emit. Ids must be
    * non-negative (fixture doc_ids are). */
  def streamingNearDup(ds: org.apache.spark.sql.Dataset[(Long, String)],
                       bands: Int, rows: Int, simThreshold: Double)
      : org.apache.spark.sql.Dataset[(Long, Long, Double)] =
    streamingNearDupWithLoss(ds, bands, rows, simThreshold)._1

  /** [[streamingNearDup]] with the plan's loss-accumulator handle. */
  def streamingNearDupWithLoss(
      ds: org.apache.spark.sql.Dataset[(Long, String)],
      bands: Int, rows: Int, simThreshold: Double)
      : (org.apache.spark.sql.Dataset[(Long, Long, Double)],
         NearDupLossAcc) = {
    import ds.sparkSession.implicits._
    import graft.functions.TextFunctions
    // Fan out BEFORE the signature projection: a one-file micro-batch is
    // a single input split, so the md5-heavy minhash of the whole batch
    // ran in ONE task — measured at sf1 (r15 verdict item 4) as the
    // gate's largest non-state term (addBatch − state ops ≈ 24 s of the
    // 50 s wall, ~0.75 s/batch single-threaded). The exchange moves only
    // the raw (id, text) rows of one batch (~1 MB) and is stateless, so
    // outputs and replay semantics are unchanged; the sig still
    // evaluates once per document (pinned in PlanAuditSpec).
    val fan = math.max(2, ds.sparkSession.sparkContext.defaultParallelism)
    val banded = bandBuckets(ds.toDF("id", "text")
        .repartition(fan)
        .withColumn("sig", TextFunctions.rowMinhashSig(col("text"))),
        bands, rows)
      .select(col("bucket"), format_string("%019d", col("id")).as("dig"),
        col("sig"), lit(0L).as("ts_us"))
      .as[(String, String, Seq[Long], Long)]
    val (pairs, loss) =
      nearDupTtlOnBandedWithLoss(banded, simThreshold, ttlUs = Long.MaxValue)
    (pairs
      .select(col("_1").cast("long").as("_1"),
        col("_2").cast("long").as("_2"), col("_3"))
      .as[(Long, Long, Double)],
      loss)
  }

  /** One (digest, signature, event-time) posting-list member held in
    * band-bucket state by the PRODUCTION near-dup pipeline. The signature
    * is stored PACKED — 4 bytes per minhash component (values live in
    * [0, P32), P32 < 2³²) — instead of the r14 `Seq[Long]` encoding
    * (~144 B of UnsafeArrayData for 64 B of information): the posting
    * list is re-read once per (key, micro-batch), so member width
    * multiplies directly into the gate's dominant cost term,
    * rocksdb_read_bytes (346 MB/run at sf1 — r14 verdict item 3). The
    * estimator only ever tests component EQUALITY, so any bijective
    * packing is exact. */
  case class TtlMember(dig: String, sig: Array[Byte], tsUs: Long)

  /** Pack minhash components (each < 2³²) into 4 bytes big-endian each. */
  private[graft] def packSig(sig: Seq[Long]): Array[Byte] = {
    val out = new Array[Byte](sig.length * 4)
    var i = 0
    sig.foreach { v =>
      out(i) = (v >>> 24).toByte; out(i + 1) = (v >>> 16).toByte
      out(i + 2) = (v >>> 8).toByte; out(i + 3) = v.toByte
      i += 4
    }
    out
  }

  /** Matching 4-byte components between two packed signatures. */
  private def packedMatches(a: Array[Byte], b: Array[Byte]): Int = {
    var m = 0
    var o = 0
    while (o < a.length) {
      if (a(o) == b(o) && a(o + 1) == b(o + 1) &&
          a(o + 2) == b(o + 2) && a(o + 3) == b(o + 3)) m += 1
      o += 4
    }
    m
  }

  /** The production online near-dup processor: posting lists keyed by
    * (band, bucket) exactly like the batch LSH, with two changes
    * that make the state machine runnable on an unbounded crawl:
    *
    *   1. it runs AFTER content-digest dedup (members are unique texts,
    *      identified by digest), so a corpus with c exact copies of a
    *      document pays O(1) state work for it instead of the ~c² the raw
    *      processor measures (476 s vs 7 s at sf1's 10-copy corpus,
    *      SCALE.md round 10);
    *   2. postings carry their EVENT time and are evicted once they fall
    *      a `ttlUs` horizon behind the arriving row — the same
    *      dedup-horizon knob as [[streamingDedup]]'s watermark, so state
    *      is bounded by unique-texts-per-horizon, not by stream length.
    *
    * Event-time TTL (not TTLConfig's processing-time TTL) keeps the gate
    * and the spec deterministic: eviction depends only on the data. The
    * horizon prune is exact for in-order arrivals and conservative under
    * disorder bounded by the upstream dedup watermark (a posting is only
    * dropped when some arrival is a full TTL ahead of it).
    *
    * Hot-bucket cap (r12 — the streaming counterpart of
    * [[graft.ops.DedupOps]]'s batch cap): once a bucket's live posting
    * list holds `maxBucket` members, further arrivals to it are DROPPED
    * (no pairs, no state growth) until TTL eviction shrinks it — at
    * 100 TB one boilerplate bucket otherwise makes the stage O(bucket)
    * per arrival with unbounded within-horizon state. The SEMANTICS
    * differ from the batch cap exactly when firing, necessarily: batch
    * sees the whole bucket and anti-joins it away (zero pairs from it);
    * a stream cannot retract already-emitted pairs, so it keeps the
    * FIRST `maxBucket` postings (their pairs stand) and drops later
    * arrivals — both bound cost to O(maxBucket) per arrival, they keep
    * different survivors on a degenerate bucket, and neither fires on
    * any measured corpus (caps are invisible at every verified SF).
    * Drops are counted ([[nearDupDroppedPostings]]) and WARN-logged per
    * micro-batch slice, matching the batch path's drop-visibility
    * contract.
    *
    * State I/O is one read + at most one write per (key, micro-batch):
    * the posting list is materialized into memory once per
    * `handleInputRows` call and written back once (ADVICE r11 — the
    * per-arriving-row `members.get()` of the r11 shape re-iterated the
    * RocksDB list per row, O(batchRows × stateSize) read amplification
    * on exactly the hot buckets the cap exists for). */
  class NearDupTtlProcessor(simThreshold: Double, ttlUs: Long,
                            maxBucket: Int = graft.ops.DedupOps.DefaultMaxBucket,
                            loss: Option[NearDupLossAcc] = None)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, String, Seq[Long], Long), (String, String, Double)] {
    import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode, TTLConfig}
    @transient private var members: ListState[TtlMember] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[TtlMember]("members",
        org.apache.spark.sql.Encoders.product[TtlMember], TTLConfig.NONE)
    override def handleInputRows(key: String,
        rows: Iterator[(String, String, Seq[Long], Long)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(String, String, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer[(String, String, Double)]()
      val live = scala.collection.mutable.ArrayBuffer[TtlMember]()
      val it = members.get()
      while (it.hasNext) live += it.next()
      val stateSize0 = live.size
      var evicted = false
      var dropped = 0L
      // oldest live posting: an O(1) per-row eviction check instead of a
      // scan (arrivals are sorted by ts, so the horizon only advances)
      var minTs = if (live.isEmpty) Long.MaxValue else live.map(_.tsUs).min
      var suppressedUb = 0L
      var arrived = 0L
      rows.toSeq.sortBy(r => (r._4, r._2)).foreach { case (_, dig, sig, ts) =>
        arrived += 1
        val horizon = ts - ttlUs
        if (minTs < horizon) {
          live.filterInPlace(_.tsUs >= horizon)
          minTs = if (live.isEmpty) Long.MaxValue else live.map(_.tsUs).min
          evicted = true
        }
        if (live.size >= maxBucket) {
          dropped += 1
          // each dropped posting would have paired against at most the
          // bucket's live members — the suppressed-pair upper bound
          suppressedUb += live.size
        } else {
          val packed = packSig(sig)
          val k = sig.size.toDouble
          live.foreach { m =>
            if (m.dig != dig) {
              val est = packedMatches(m.sig, packed).toDouble / k
              if (est >= simThreshold) {
                val (lo, hi) = if (m.dig < dig) (m.dig, dig) else (dig, m.dig)
                out += ((lo, hi, est))
              }
            }
          }
          live += TtlMember(dig, packed, ts)
          minTs = math.min(minTs, ts)
        }
      }
      if (evicted) members.put(live.toArray)
      else if (live.size > stateSize0)
        members.appendList(live.drop(stateSize0).toArray)
      loss.foreach { l =>
        l.postings.add(arrived)
        if (dropped > 0) { l.dropped.add(dropped); l.suppressedPairsUb.add(suppressedUb) }
      }
      if (dropped > 0) {
        nearDupDroppedPostings.addAndGet(dropped)
        graftLog.warn(s"streaming LSH hot-bucket cap firing: bucket=$key " +
          s"dropped=$dropped postings (cap=$maxBucket) — near-dups against " +
          "dropped postings are missed; audit the bucket before trusting recall")
      }
      out.iterator
    }
  }

  /** [[NearDupTtlProcessor]] over pre-banded (bucket, digest, sig, ts_us)
    * rows — split out so deterministic specs can pin the TTL eviction
    * with exact bucket/signature control. */
  def nearDupTtlOnBanded(
      ds: org.apache.spark.sql.Dataset[(String, String, Seq[Long], Long)],
      simThreshold: Double, ttlUs: Long,
      maxBucket: Int = graft.ops.DedupOps.DefaultMaxBucket)
      : org.apache.spark.sql.Dataset[(String, String, Double)] =
    nearDupTtlOnBandedWithLoss(ds, simThreshold, ttlUs, maxBucket)._1

  /** [[nearDupTtlOnBanded]] returning the plan's loss-accumulator handle
    * alongside the stream, so the driving gate reads the counters of THE
    * plan it drained — threading the handle replaces the former
    * @volatile last-plan global, which mis-attributed counters as soon
    * as two near-dup plans were built in one gate (ADVICE r13). */
  def nearDupTtlOnBandedWithLoss(
      ds: org.apache.spark.sql.Dataset[(String, String, Seq[Long], Long)],
      simThreshold: Double, ttlUs: Long,
      maxBucket: Int = graft.ops.DedupOps.DefaultMaxBucket)
      : (org.apache.spark.sql.Dataset[(String, String, Double)],
         NearDupLossAcc) = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val sc = ds.sparkSession.sparkContext
    val loss = NearDupLossAcc(
      sc.longAccumulator("graft.nearDup.postings"),
      sc.longAccumulator("graft.nearDup.droppedPostings"),
      sc.longAccumulator("graft.nearDup.suppressedPairsUb"))
    (ds.groupByKey(_._1)
      .transformWithState(
        new NearDupTtlProcessor(simThreshold, ttlUs, maxBucket, Some(loss)),
        TimeMode.None(), OutputMode.Append()),
      loss)
  }

  /** Print a drained near-dup plan's loss report — called by the gates
    * after the drain so every run's output carries the quantified recall
    * loss of exactly the plan it ran. */
  def reportNearDupLoss(loss: Option[NearDupLossAcc]): Unit =
    loss.foreach(l => println(l.report))

  /** Band a (dig, text, ts) stream per row and run the TTL'd posting-list
    * processor: the stage-2 plan of [[nearDupProdViaStream]]. */
  def streamingNearDupTtl(df: DataFrame, bands: Int, rows: Int,
                          simThreshold: Double, ttlUs: Long)
      : (org.apache.spark.sql.Dataset[(String, String, Double)],
         NearDupLossAcc) = {
    import df.sparkSession.implicits._
    import graft.functions.TextFunctions
    // fan out before the signature minhash — same single-split
    // micro-batch serialization as streamingNearDupWithLoss (r16)
    val fan = math.max(2, df.sparkSession.sparkContext.defaultParallelism)
    val banded = bandBuckets(df
        .repartition(fan)
        .withColumn("sig", TextFunctions.rowMinhashSig(col("text")))
        .withColumn("ts_us", unix_micros(col("ts"))),
        bands, rows)
      .select(col("bucket"), col("dig"), col("sig"), col("ts_us"))
      .as[(String, String, Seq[Long], Long)]
    nearDupTtlOnBandedWithLoss(banded, simThreshold, ttlUs)
  }

  /** The PRODUCTION streaming near-dup composition (the declared shape a
    * 100 TB crawl runs — r10 verdict item 1), as two chained streaming
    * stages with a durable parquet handoff between them (the Kafka/lake
    * topic of a real deployment):
    *
    *   stage 1 — content-digest compaction: `withWatermark` +
    *     `dropDuplicatesWithinWatermark(md5(text))` through the real
    *     engine, one file per micro-batch, append to a file sink. Only
    *     UNIQUE texts flow on — the copies² state work the raw
    *     [[nearDupViaStream]] gate measures (476 s vs 7 s at sf1) never
    *     reaches the LSH state.
    *   stage 2 — TTL'd posting-list LSH over the uniques: per-row
    *     signatures, state sharded by (band, bucket), each posting
    *     evicted once it falls `ttlUs` behind the arriving row
    *     ([[NearDupTtlProcessor]]) — state bounded by
    *     uniques-per-horizon.
    *
    * Output is (dig_a, dig_b, est_jaccard) at content-DIGEST grain:
    * which physical doc id survives stage 1 is delivery-order-dependent,
    * but the digest pair set is deterministic — exactly what makes the
    * composed gate oracle-checkable (the same reason [[dedupViaStream]]
    * emits key columns only). A pair colliding in several buckets emits
    * once per bucket with the same estimate; `distinct()` downstream. */
  def nearDupProdViaStream(spark: SparkSession, docs: DataFrame,
                           tsCol: String, bands: Int, rows: Int,
                           simThreshold: Double, dedupWatermark: String,
                           ttlUs: Long): DataFrame = {
    val src = docs.select(md5(col("text")).as("dig"), col("text"),
      col(tsCol).as("ts"))
    val t0 = System.nanoTime()
    val uniques = viaStream(spark, Seq(src), dfs =>
        dfs.head.withWatermark("ts", dedupWatermark)
          .dropDuplicatesWithinWatermark(Seq("dig")),
      maxFilesPerTrigger = Some(1), outputMode = "append", fileSink = true)
    val t1 = System.nanoTime()
    var loss: Option[NearDupLossAcc] = None
    // changelog checkpointing now rides in withRocksDbStore itself
    val out = withRocksDbStore(spark) {
      viaStream(spark, Seq(uniques),
        dfs => {
          val (pairs, l) = streamingNearDupTtl(dfs.head, bands, rows,
            simThreshold, ttlUs)
          loss = Some(l)
          pairs.toDF("dig_a", "dig_b", "est_jaccard")
        },
        maxFilesPerTrigger = Some(1), outputMode = "append")
    }
    reportNearDupLoss(loss)
    graftLog.warn(f"nearDupProd: stage1 dedup ${(t1 - t0) / 1e9}%.1f s, " +
      f"stage2 lsh ${(System.nanoTime() - t1) / 1e9}%.1f s")
    out
  }

  /** Streaming sign-LSH (embedding) near-dup CANDIDATES through the real
    * engine — the embedding-cosine analog of [[streamingNearDup]], on the
    * same unified [[NearDupTtlProcessor]]: per-row quantize + banded
    * hyperplane signatures, posting lists sharded by (band, signature),
    * every co-bucket pair emitted as a candidate.
    *
    * Single-evaluation discipline (the r11 minhash lesson — `quantize`
    * is a higher-order `transform`, codegen-fallback with no CSE, and
    * CollapseProject would inline it into all bands·planes dot-product
    * references): the quantized vector rides a single-element `transform`
    * let-binding, the per-band signatures are computed ONCE into an
    * array below a `posexplode` Generate (a collapse barrier), so each
    * row quantizes once and hashes bands·planes times — the irreducible
    * work.
    *
    * Members carry a constant 1-element signature: with threshold 0
    * every co-bucket pair emits, and the candidate SET is
    * arrival-order-independent and — while no bucket exceeds
    * `maxBucket` — equals the batch
    * [[graft.ops.SimilarityOps.bandedNearDupPairs]] candidate set at
    * signature level; the caller applies the exact cosine rerank
    * (idempotent per pair). Cap caveat (the batch banded path carries
    * no cap): sign-LSH has only 2^planesPerBand signatures per band, so
    * uniform buckets grow ~N/2^p — at the default cap that is ~1.3M
    * vectors for p=8. Past it the stream keeps the first `maxBucket`
    * postings per bucket, WARNs, and counts drops
    * ([[nearDupDroppedPostings]]) — bounded state/cost traded for
    * bounded recall loss; every measured SF (≤ sf1) sits far below the
    * cap and the equality is verified exact there. Output: deduplicated
    * (id_a, id_b), id_a < id_b; ids must be non-negative
    * (padded-decimal ordering, as [[streamingNearDup]]). File-sinked:
    * candidate grain is unbounded (~6M pairs at sf1). */
  def embedNearDupCandViaStream(spark: SparkSession, emb: DataFrame,
                                idCol: String, vecCol: String,
                                bands: Int, planesPerBand: Int,
                                dim: Int = 64,
                                maxBucket: Int = graft.ops.DedupOps.DefaultMaxBucket)
      : DataFrame = {
    val src = emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v"))
    withRocksDbStore(spark) {
      var loss: Option[NearDupLossAcc] = None
      val out = viaStream(spark, Seq(src), dfs => {
        import spark.implicits._
        // NO pre-signature fanout here, unlike streamingNearDupWithLoss:
        // tested r16 and REJECTED — the embed signature is bands×planes
        // integer dots (cheap) where the text path is md5 over every
        // shingle (heavy), and the extra per-batch exchange cost more
        // than the parallelism bought (17.2 s → 19.3 s at sf1)
        val banded = embedBandBuckets(dfs.head, bands, planesPerBand, dim)
          .select(col("bucket"), format_string("%019d", col("id")).as("dig"),
            typedLit(Seq(1L)).as("csig"), lit(0L).as("ts_us"))
          .as[(String, String, Seq[Long], Long)]
        val (pairs, l) = nearDupTtlOnBandedWithLoss(banded, 0.0,
          ttlUs = Long.MaxValue, maxBucket)
        loss = Some(l)
        pairs.toDF("a", "b", "est")
          .select(col("a").cast("long").as("id_a"),
            col("b").cast("long").as("id_b"))
      }, maxFilesPerTrigger = Some(1), outputMode = "append",
        fileSink = true)
        .distinct()
      reportNearDupLoss(loss)
      out
    }
  }

  /** Band a frame carrying a `v` embedding column into (band, sig)
    * bucket keys, quantizing ONCE per row: the quantized vector rides a
    * single-element `transform` let-binding and the per-band signatures
    * land in one array below the posexplode Generate (a collapse
    * barrier) — plan-locked in PlanAuditSpec, the [[bandBuckets]]
    * discipline applied to embeddings. */
  private[graft] def embedBandBuckets(df: DataFrame, bands: Int,
                                      planesPerBand: Int, dim: Int)
      : DataFrame = {
    import graft.ops.SimilarityOps
    val sigs = element_at(
      transform(array(SimilarityOps.quantize(col("v"))),
        q => array((0 until bands).map(b =>
          SimilarityOps.bandSig(q, b, planesPerBand, dim)): _*)),
      1)
    df.select(col("*"), posexplode(sigs).as(Seq("band", "sig")))
      .withColumn("bucket", concat_ws("_", col("band"), col("sig")))
  }

  /** [[statefulCumsum]] on the transformWithState API. */
  def statefulCumsumTws(ds: org.apache.spark.sql.Dataset[(Long, Long, Double)])
      : org.apache.spark.sql.Dataset[(Long, Long, Double)] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    ds.groupByKey(_._2)
      .transformWithState(new RunningSumProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Batch-scale running sum with the same (id, key, value) → running-sum
    * contract as [[statefulCumsum]]: shuffle by key, external-sort within
    * partitions, then a single streaming pass with one accumulator — rows
    * are never collected into memory per group, so group size is unbounded
    * (the WindowExec-style shape, expressed imperatively for reuse as a
    * mapPartitions pattern). */
  def batchCumsum(ds: org.apache.spark.sql.Dataset[(Long, Long, Double)])
      : org.apache.spark.sql.Dataset[(Long, Long, Double)] = {
    import ds.sparkSession.implicits._
    ds.repartition(col("_2")).sortWithinPartitions(col("_2"), col("_1"))
      .mapPartitions { rows =>
        var curKey = Long.MinValue
        var first  = true
        var acc    = 0.0
        rows.map { case (id, k, v) =>
          if (first || k != curKey) { curKey = k; acc = 0.0; first = false }
          acc += v
          (id, k, acc)
        }
      }
  }

  /** Stream-static enrichment join: every micro-batch joins the static dim
    * side, re-planned per batch (so a refreshed dim file is picked up at
    * the next batch). The broadcast hint keeps the stream side shuffle-free
    * — the canonical shape for dim lookup at any stream rate. */
  def enrichWithStatic(stream: DataFrame, static: DataFrame,
                       keys: Seq[String]): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(static), keys)

  /** Test-only crash injection for [[upsertSnapshot]]'s two commit
    * windows (r12 verdict item 3 — the crash-consistency specs): set to
    * `"before_commit"` (after the bucket/manifest writes, before the
    * `_CURRENT` rename — a crash here must leave readers on the previous
    * generation and replay must converge) or `"before_gc"` (after the
    * rename, before retention pruning — a crash here is already
    * committed; replay must no-op and the next commit must prune). */
  @volatile private[graft] var upsertFailpoint: Option[String] = None
  private def maybeFail(point: String): Unit =
    if (upsertFailpoint.contains(point))
      throw new RuntimeException(s"graft test failpoint: $point")

  /** Number of hash buckets [[upsertSnapshot]] shards a snapshot into.
    * Sizing knob: per-batch rewrite cost is (touched buckets) ×
    * (snapshot / buckets); more buckets → finer rewrites but more files
    * per full-snapshot scan. */
  val DefaultSnapshotBuckets = 64

  /** Deterministic bucket of a key tuple (Murmur3 via `hash()`, stable
    * across runs/partitionings — the property the manifest relies on). */
  private def bucketOf(keys: Seq[String], numBuckets: Int): Column =
    pmod(hash(keys.map(col): _*), lit(numBuckets))

  /** Manifest = the commit record of a bucketed snapshot: the committed
    * batch id, the committing WRITER'S EPOCH (the zombie fence, r13
    * verdict item 2), plus, per bucket, the batch directory holding that
    * bucket's CURRENT version. Serialized as one line per entry; a
    * pre-epoch manifest (no `epoch=` line) parses as epoch 0, so any
    * newly-started writer (epoch ≥ 1) takes over an old root. */
  private case class SnapshotManifest(committed: Long, epoch: Long,
                                      refs: Map[Int, String],
                                      writer: String = "") {
    def serialize: String =
      (Seq(s"committed=$committed", s"epoch=$epoch") ++
        (if (writer.nonEmpty) Seq(s"writer=$writer") else Nil) ++
        refs.toSeq.sortBy(_._1).map { case (b, dir) => s"$b=$dir" })
        .mkString("\n")
  }
  private def parseManifest(s: String): SnapshotManifest = {
    val lines = s.split("\n").map(_.trim).filter(_.nonEmpty)
    // A pre-manifest `_CURRENT` (the old single-directory layout wrote a
    // bare `batch-<id>` pointer) cannot be migrated in place — the old
    // layout is unbucketed, so no per-bucket refs can be reconstructed.
    // Fail with the remedy instead of a bare NumberFormatException
    // (ADVICE r12).
    require(lines.nonEmpty && lines.head.startsWith("committed="),
      s"legacy/corrupt snapshot pointer (expected 'committed=<id>', got " +
        s"'${lines.headOption.getOrElse("")}'): this snapshot root predates " +
        "the bucketed manifest layout — re-seed it under a new root")
    val committed = lines.head.stripPrefix("committed=").toLong
    val epoch = lines.tail.find(_.startsWith("epoch="))
      .map(_.stripPrefix("epoch=").toLong).getOrElse(0L)
    val writer = lines.tail.find(_.startsWith("writer="))
      .map(_.stripPrefix("writer=")).getOrElse("")
    val refs = lines.tail
      .filterNot(l => l.startsWith("epoch=") || l.startsWith("writer="))
      .map { l =>
        val Array(b, ref) = l.split("=", 2)
        // a pre-epoch manifest stored the bare batchId; those roots named
        // their dirs `batch-<id>` — normalize to the directory NAME, which
        // is what refs mean now (epoch-namespaced dirs: `batch-<e>-<id>`)
        b.toInt -> (if (ref.forall(_.isDigit)) s"batch-$ref" else ref)
      }.toMap
    SnapshotManifest(committed, epoch, refs, writer)
  }

  /** A claimed writer epoch plus the claimant's unique nonce — the nonce
    * is what makes a double-claim on a non-atomic store DETECTABLE (see
    * [[claimEpoch]]): it rides in every manifest this writer commits, so
    * two writers that somehow share an epoch fence each other at the
    * next commit instead of silently interleaving. */
  private[graft] case class EpochClaim(epoch: Long, nonce: String)

  /** Claim the next writer epoch for a snapshot root: atomic
    * create-if-absent of `epoch-<n>` (HDFS `create(overwrite=false)` is
    * the lease primitive — two claimants can never both own n). Epochs
    * only grow, so a claimed epoch strictly exceeds every earlier
    * writer's; one marker file is made per writer START, so they never
    * accumulate faster than operator actions.
    *
    * OBJECT-STORE HARDENING (r15 verdict item 7): stores without atomic
    * create-if-absent (S3A-style HEAD-then-PUT) can let two claimants
    * "create" the same marker. The marker therefore carries the
    * claimant's NONCE as content, and the claim is verified by READING
    * IT BACK: a claimant whose read-back shows a foreign nonce lost a
    * PUT race it could not see at create time and moves on to the next
    * epoch. On strongly-consistent stores (HDFS, POSIX, today's S3)
    * this detects every race except a foreign PUT landing AFTER the
    * read-back — one round-trip wide, vs. unbounded silent dual
    * ownership before — and THAT residue is caught at commit time by
    * the manifest nonce check ([[EpochClaim]]): the fence is
    * detect-eventually on non-atomic stores, atomic-by-construction on
    * HDFS/POSIX. */
  private[graft] def claimEpoch(fs: org.apache.hadoop.fs.FileSystem,
                                root: org.apache.hadoop.fs.Path): EpochClaim = {
    val nonce = java.util.UUID.randomUUID().toString
    val base = fs.listStatus(root)
      .map(_.getPath.getName)
      .filter(_.startsWith("epoch-"))
      .map(_.stripPrefix("epoch-").toLong)
      .foldLeft(0L)(math.max)
    var n = base
    var attempts = 0
    while (attempts < 1000) {
      n += 1; attempts += 1
      val marker = new org.apache.hadoop.fs.Path(root, s"epoch-$n")
      val created =
        try {
          val out = fs.create(marker, false)
          try out.write(nonce.getBytes("UTF-8")) finally out.close()
          true
        } catch {
          // ONLY contention is retried; any other I/O failure
          // (permissions, connectivity) must surface with its real cause,
          // not spin 1000 times into a misleading "could not claim" error
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.nio.file.FileAlreadyExistsException        => false
        }
      if (created) {
        claimEpochRaceFailpoint.foreach(_.apply(marker))
        // ownership verify: on a non-atomic store a concurrent PUT may
        // have overwritten the marker between our write and now
        val in = fs.open(marker)
        val seen = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        if (seen == nonce) return EpochClaim(n, nonce)
        graftLog.warn(s"claimEpoch: lost a non-atomic create race for " +
          s"epoch-$n under $root (marker now owned by another writer) — " +
          "trying the next epoch")
      }
    }
    throw new IllegalStateException(
      s"claimEpoch: could not claim a writer epoch under $root " +
        "after 1000 attempts")
  }

  /** Test failpoint: runs between the epoch marker create and its
    * read-back verify — a spec injects the "concurrent PUT overwrote the
    * marker" interleaving a non-atomic store can produce. */
  @volatile private[graft] var claimEpochRaceFailpoint
      : Option[org.apache.hadoop.fs.Path => Unit] = None
  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
                           p: org.apache.hadoop.fs.Path)
      : Option[SnapshotManifest] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      Some(parseManifest(s))
    }

  /** Idempotent HASH-BUCKETED compact-and-swap snapshot upsert — the
    * exactly-once `foreachBatch` sink pattern for stores without MERGE
    * transactions, with per-batch cost proportional to the TOUCHED
    * buckets, not the snapshot (r11 verdict item 6: the previous shape
    * rewrote the full snapshot every trigger — a full-table rewrite per
    * batch at a 100 TB dim).
    *
    * Layout: the snapshot is sharded into [[DefaultSnapshotBuckets]]
    * key-hash buckets; each micro-batch writes ONLY the buckets its
    * update keys hash into, as one Hive-partitioned directory
    * `batch-<id>/_bkt=<k>/`, and commits a MANIFEST mapping every bucket
    * to the batch directory holding its current version. Untouched
    * buckets keep pointing at their old directories — their files are
    * never rewritten (byte-identical across disjoint-key batches, pinned
    * in StreamingSpec). The `_CURRENT` pointer (atomic rename) holds the
    * manifest; a REPLAYED batch (same batchId after failure recovery)
    * finds `committed >= batchId` and becomes a no-op — the exactly-once
    * contract, unchanged. All heavy work is distributed (one shuffle
    * over touched data per batch); the only driver work is the manifest
    * and the (≤ numBuckets) touched-bucket id list.
    * Wire as: `stream.writeStream.foreachBatch(upsertSnapshot(dir, keys,
    * ver))` — one call builds ONE writer (the returned closure carries
    * the writer's fencing epoch; see below).
    *
    * WRITER EPOCH FENCE (r13 verdict item 2 — replaces the pinned
    * last-committer-wins-by-batchId contract): each call to this method
    * builds one WRITER, which claims a monotonically-increasing epoch
    * (atomic `epoch-<n>` create) AT CONSTRUCTION — epochs must follow
    * writer START order: claiming lazily at first commit would let an
    * abandoned writer that never committed wake up, claim a HIGHER epoch
    * than the live writer's, and fence the live writer out (the inverted
    * failure) — and stamps it into every manifest. A writer that finds a
    * HIGHER epoch in `_CURRENT`
    * is a zombie — an abandoned predecessor that woke up after failover
    * — and FAILS LOUDLY (`IllegalStateException`) instead of clobbering
    * the live writer's snapshot; its stream dies, which is the correct
    * outcome for a process that lost the root. The batchId replay guard
    * is scoped WITHIN an epoch: same-epoch redelivery (failure recovery
    * re-running a committed batch) is the exactly-once no-op, while a
    * NEW writer (new epoch — failover from the same checkpoint, or a
    * re-seeded fresh checkpoint) takes over at whatever batchId it
    * carries and re-applies — safe because the per-key `verCol` argmax
    * makes re-upserting deterministic replayed batches content-idempotent.
    * The one unfenced window is a zombie whose read-check and pointer
    * rename straddle the live writer's FIRST commit (rename is
    * last-write-wins); the epoch stamp converts even that into a
    * self-healing state: the live writer's next commit sees the lower
    * epoch and re-commits (no silent skip), and the zombie's next commit
    * throws. GC is safe inside that window too (ADVICE r14): the pruning
    * pass never classifies the committing writer's own generation as old
    * and re-reads `_CURRENT` after the rename, unioning its refs into the
    * live set — so the pointer can never reference a deleted directory
    * regardless of epoch ordering.
    *
    * FILESYSTEM CONTRACT: the fence's lease primitive is
    * `FileSystem.create(path, overwrite = false)` being an atomic
    * create-if-absent, and the commit is an atomic `rename` — both hold
    * on HDFS and local POSIX filesystems. Object stores without atomic
    * create-if-absent (e.g. S3A's HEAD-then-PUT) can let two writers
    * claim the SAME epoch. Since r16 that double-claim is DETECTED, not
    * silent: [[claimEpoch]] writes the claimant's nonce into the marker
    * and verifies it by read-back (the loser of a PUT race moves to the
    * next epoch), and the nonce rides in every committed manifest, so a
    * double-claim that slips through the one-round-trip verify window
    * fails loudly at the offending writer's NEXT commit (equal epoch,
    * foreign nonce ⇒ IllegalStateException). The fence is thus
    * atomic-by-construction on HDFS/POSIX and detect-eventually on
    * eventually-created stores; for hard exclusion on such stores run
    * this sink through a layer that restores atomic create (a
    * metadata/lock layer, or a table format's commit service). */
  def upsertSnapshot(snapshotRoot: String, keys: Seq[String], verCol: String,
                     retainSnapshots: Int = 2,
                     numBuckets: Int = DefaultSnapshotBuckets)
      : (DataFrame, Long) => Unit = {
    // per-writer fencing epoch, claimed EAGERLY so epochs follow writer
    // start order (see the scaladoc's inverted-failure note); the one
    // filesystem touch here is the same mkdirs+create the first commit
    // would pay anyway
    val root = new org.apache.hadoop.fs.Path(snapshotRoot)
    val fs = root.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sparkContext
        .hadoopConfiguration)
    fs.mkdirs(root)
    val myClaim = claimEpoch(fs, root)
    (updates: DataFrame, batchId: Long) =>
      upsertBatch(snapshotRoot, keys, verCol, retainSnapshots, numBuckets,
        updates, batchId, myClaim)
  }

  private def upsertBatch(snapshotRoot: String, keys: Seq[String],
                          verCol: String, retainSnapshots: Int,
                          numBuckets: Int, updates: DataFrame, batchId: Long,
                          myClaim: EpochClaim): Unit = {
    val myEpoch = myClaim.epoch
    import org.apache.spark.sql.expressions.Window
    import org.apache.hadoop.fs.{Options, Path}
    val spark   = updates.sparkSession
    val conf    = spark.sparkContext.hadoopConfiguration
    val root    = new Path(snapshotRoot)
    val fs      = root.getFileSystem(conf)
    fs.mkdirs(root)
    val pointer = new Path(root, "_CURRENT")
    // The POINTER is the commit record, not the target directory: a crash
    // after a partial target write leaves the pointer untouched, and the
    // replay (same batchId) overwrites the partial output and swaps the
    // pointer — skipping on target-dir existence would lose the batch.
    val committed = readManifest(fs, pointer)
    committed.filter(_.epoch > myEpoch).foreach { m =>
      throw new IllegalStateException(
        s"upsertSnapshot: writer fenced at $snapshotRoot — a newer writer " +
          s"(epoch ${m.epoch}, committed through batch ${m.committed}) owns " +
          s"this root; this writer (epoch $myEpoch) is a zombie from an " +
          "abandoned run and must shut down")
    }
    // Same epoch but a FOREIGN writer nonce: two writers claimed one
    // epoch — only possible on a store whose create-if-absent is not
    // atomic, in the one-round-trip window claimEpoch's read-back verify
    // cannot see. The epoch comparisons above are blind to it (equal
    // epochs pass); the nonce makes it loud at the next commit instead
    // of letting the two writers interleave commits forever.
    committed.filter(m => m.epoch == myEpoch && m.writer.nonEmpty &&
        m.writer != myClaim.nonce).foreach { m =>
      throw new IllegalStateException(
        s"upsertSnapshot: DOUBLE-CLAIMED epoch $myEpoch at $snapshotRoot — " +
          s"manifest carries writer ${m.writer}, this writer is " +
          s"${myClaim.nonce}. The store's create-if-absent is not atomic " +
          "(see the FILESYSTEM CONTRACT scaladoc); this writer must shut " +
          "down and restart to claim a fresh epoch")
    }
    // In-epoch replay of the committed batch (same id after failure
    // recovery) is the expected exactly-once no-op; an id strictly below
    // is a stale redelivery — skip both. A DIFFERENT (lower) epoch with a
    // higher committed id is NOT a skip: it means this writer just took
    // over the root (failover, or a fresh-checkpoint re-seed) — it
    // re-applies, and the verCol argmax keeps the content deterministic.
    if (committed.exists(m => m.epoch == myEpoch && m.committed >= batchId)) {
      if (committed.exists(_.committed > batchId))
        graftLog.warn(
          s"upsertSnapshot: skipping batch $batchId at $snapshotRoot — " +
            s"this writer (epoch $myEpoch) already committed through batch " +
            s"${committed.get.committed}; stale in-epoch redelivery.")
      return
    }
    committed.filter(_.epoch < myEpoch).foreach { m =>
      graftLog.info(
        s"upsertSnapshot: writer epoch $myEpoch taking over $snapshotRoot " +
          s"from epoch ${m.epoch} (committed through batch ${m.committed}) " +
          s"at batch $batchId")
    }
    val refs = committed.map(_.refs).getOrElse(Map.empty[Int, String])
    // Batch dirs and generation manifests are namespaced by EPOCH: after
    // a takeover the new writer's batchIds can collide with the dead
    // epoch's (fresh checkpoint restarts at 0), and an un-namespaced
    // `batch-0` overwrite would destroy bucket files the manifest still
    // references. Same-epoch replay still lands on the SAME dir — the
    // overwrite-the-partials crash contract.
    val dirName = s"batch-$myEpoch-$batchId"
    val upd = updates.withColumn("_bkt", bucketOf(keys, numBuckets))
    // the touched-bucket list is ≤ numBuckets ints — the one driver-side
    // collection, bounded by the layout, not the data
    val touched = upd.select("_bkt").distinct()
      .collect().map(_.getInt(0)).toSet
    val newRefs =
      if (touched.isEmpty && refs.nonEmpty) refs // empty batch: commit id only
      else if (touched.isEmpty) {
        // empty batch on an EMPTY snapshot: write one schema-only bucket
        // so readSnapshot returns an empty frame with the right schema
        // (the pre-bucketed layout's behavior) instead of failing on a
        // committed manifest that references no data
        val target = new Path(root, dirName)
        upd.limit(0).write.mode("overwrite").parquet(target.toString)
        Map(0 -> dirName)
      } else {
        // current rows of the touched buckets only: group by the batch
        // dir holding them, partition-prune `_bkt in touched ∩ assigned`
        val currentTouched = refs.filter { case (b, _) => touched(b) }.toSeq
          .groupBy(_._2).map { case (dir, entries) =>
            spark.read.parquet(new Path(root, dir).toString)
              .where(col("_bkt").isin(entries.map(_._1): _*))
          }.reduceOption(_ unionByName _)
        val unioned = currentTouched match {
          case Some(snap) => snap.withColumn("_upd", lit(0))
            .unionByName(upd.withColumn("_upd", lit(1)))
          case None => upd.withColumn("_upd", lit(1))
        }
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col(verCol).desc, col("_upd").desc)
        val target = new Path(root, dirName)
        unioned.withColumn("_rn", row_number().over(w))
          .where(col("_rn") === 1).drop("_rn", "_upd")
          .write.mode("overwrite").partitionBy("_bkt")
          .parquet(target.toString)
        refs ++ touched.map(_ -> dirName)
      }
    val manifest = SnapshotManifest(batchId, myEpoch, newRefs,
      myClaim.nonce)
    // persist this generation's manifest (retention works by reference:
    // a batch dir lives while any of the newest `retainSnapshots`
    // manifests still points at it), then atomically swap the pointer —
    // the rename is the commit (atomic on HDFS-like filesystems)
    val gen = new Path(root, s"manifest-$myEpoch-$batchId")
    val genOut = fs.create(gen, true)
    try genOut.write(manifest.serialize.getBytes("UTF-8"))
    finally genOut.close()
    // tmp is epoch-namespaced like the batch dirs: during a failover both
    // the zombie and the live writer can replay the SAME batchId inside
    // the documented fence window, and a shared tmp name would let one
    // writer's rename consume the other's file (killing the LIVE stream
    // with a FileNotFoundException on its rename)
    val tmp = new Path(root, s"_CURRENT.$myEpoch.$batchId.tmp")
    val out = fs.create(tmp, true)
    try out.write(manifest.serialize.getBytes("UTF-8")) finally out.close()
    maybeFail("before_commit")
    org.apache.hadoop.fs.FileContext.getFileContext(root.toUri, conf)
      .rename(tmp, pointer, Options.Rename.OVERWRITE)
    maybeFail("before_gc")
    // Prune: keep every batch dir referenced by the newest
    // `retainSnapshots` manifests — NOT just the current one: a reader
    // that resolved _CURRENT a moment ago may still be scanning the
    // previous generation's directories (resolution and the scan are not
    // one atomic step); retaining the previous generation gives
    // in-flight readers one full commit interval to finish (see
    // [[readSnapshot]]). Storage stays bounded by the live snapshot plus
    // the superseded buckets of the retained generations.
    // Generation order is (epoch, committed) read from CONTENTS, not the
    // filename number: after an epoch takeover the new writer's batchIds
    // can restart below the old writer's, and filename-order GC would
    // prune the CURRENT generation while retaining the dead epoch's.
    // A generation manifest that fails to PARSE (a crash mid-write left a
    // truncated file under an epoch-namespaced name no replay will ever
    // overwrite) is deleted with a WARN instead of throwing: its commit
    // never happened (the pointer is the commit record) so its refs guard
    // nothing, and letting it throw would crash-loop every future commit's
    // GC against a file only an operator could remove. ONLY parse
    // failures get that treatment — a transient I/O error while reading a
    // manifest aborts THIS GC pass instead (deleting on I/O error could
    // drop the just-committed generation's refs and then sweep batch dirs
    // `_CURRENT` still references); the commit above already stands, and
    // the next commit retries the pruning.
    try {
      val keepGens = fs.listStatus(root)
        .filter(st => st.getPath.getName.startsWith("manifest-"))
        .toSeq
        .flatMap { st =>
          try Seq(st -> readManifest(fs, st.getPath))
          catch {
            case e @ (_: IllegalArgumentException | _: NumberFormatException) =>
              graftLog.warn(
                s"upsertSnapshot: deleting unparseable generation manifest " +
                  s"${st.getPath} (crashed partial write?): ${e.getMessage}")
              fs.delete(st.getPath, false)
              Nil
          }
        }
        .sortBy { case (_, m) => m.map(x => (x.epoch, x.committed))
          .getOrElse((-1L, -1L)) }
      val (old0, kept0) = keepGens.splitAt(
        math.max(keepGens.size - math.max(retainSnapshots, 1), 0))
      // Two hard floors under the retention sort (ADVICE r14): in the
      // unfenced zombie window, a lower-epoch writer that just renamed
      // _CURRENT sorts its OWN generation below the live writer's and
      // would GC the dirs the pointer it just swung still references —
      // persistent unavailability, not self-healing. So (a) the
      // committing writer's own just-written manifest is never `old`,
      // and (b) _CURRENT is re-read AFTER the rename and its refs are
      // unioned into `live`, so whatever the pointer references at GC
      // time can never be swept regardless of epoch ordering.
      val ownGen = gen.getName
      val old  = old0.filterNot(_._1.getPath.getName == ownGen)
      val kept = kept0 ++ old0.filter(_._1.getPath.getName == ownGen)
      val pointerRefs: Set[String] =
        try readManifest(fs, pointer).map(_.refs.values.toSet)
          .getOrElse(Set.empty)
        catch { case scala.util.control.NonFatal(e) =>
          // can't establish what the pointer references → defer ALL
          // pruning to the next commit (the commit above already stands)
          graftLog.warn(s"upsertSnapshot: GC deferred — could not re-read " +
            s"_CURRENT at $snapshotRoot: ${e.getMessage}")
          return
        }
      val live: Set[String] = kept
        .flatMap(_._2)
        .flatMap(m => m.refs.values).toSet ++ pointerRefs
      fs.listStatus(root)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch-"))
        .filterNot(st => live(st.getPath.getName))
        .foreach(st => fs.delete(st.getPath, true))
      old.foreach { case (st, _) => fs.delete(st.getPath, false) }
    } catch { case e: java.io.IOException =>
      graftLog.warn(
        s"upsertSnapshot: batch $batchId committed but GC deferred to the " +
          s"next commit ($snapshotRoot): ${e.getMessage}")
    }
  }

  /** Read the current snapshot written by [[upsertSnapshot]]: resolve the
    * manifest, scan each referenced batch directory pruned to the buckets
    * it currently owns, union.
    *
    * Staleness/retention contract: the returned DataFrame is pinned to
    * the manifest resolved AT CALL TIME — later commits are not picked up
    * (re-call to refresh), and the referenced directories remain on disk
    * for at least `retainSnapshots − 1` further commits (default: one).
    * A scan that outlives that window can hit deleted files; raise
    * `retainSnapshots` (or snapshot less often) if readers run longer
    * than a commit interval. */
  def readSnapshot(spark: SparkSession, snapshotRoot: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(snapshotRoot)
    val fs   = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = readManifest(fs, new Path(root, "_CURRENT")).getOrElse(
      throw new java.io.FileNotFoundException(
        s"$snapshotRoot/_CURRENT: no committed snapshot"))
    m.refs.toSeq.groupBy(_._2).map { case (dir, entries) =>
      spark.read.parquet(new Path(root, dir).toString)
        .where(col("_bkt").isin(entries.map(_._1): _*))
    }.reduceOption(_ unionByName _)
      .map(_.drop("_bkt"))
      .getOrElse(throw new java.io.FileNotFoundException(
        s"$snapshotRoot: committed manifest references no data"))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture table loaders (see FIXTURES.md).
  *
  * All loads are plain `spark.read.parquet` so Catalyst keeps pushdown /
  * pruning; the only special case is `events`, whose `ts` column has shipped
  * in two driver layouts: INT64 TIMESTAMP(NANOS) (which Spark cannot read
  * natively — we read it as a raw long via `spark.sql.legacy.parquet.
  * nanosAsLong=true` and truncate to microseconds with integer division,
  * matching DuckDB's own ns→µs truncation on read) and plain
  * TIMESTAMP(MICROS), which loads directly. [[events]] dispatches on the
  * loaded dtype so both layouts produce the identical TimestampType column.
  *
  * All timestamp columns load as TimestampType (not TIMESTAMP_NTZ): the
  * fixtures are written `isAdjustedToUTC=false`, so [[GraftSession]] sets
  * `spark.sql.parquet.inferTimestampNTZ.enabled=false` and the UTC session
  * timezone makes the instant values identical either way — this keeps one
  * timestamp type throughout the engine and the differential gate.
  */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(path(dir, name))

  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** events with `ts` normalized to µs TimestampType whichever layout the
    * driver wrote (ns-long → truncating DIV, like DuckDB; µs timestamp /
    * NTZ → direct cast). Column order preserved. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(dir, "events"))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => // TIMESTAMP_NTZ (session without GraftSession defaults)
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}

/** Session defaults shared by Verify / Bench / tests. */
object GraftSession {
  /** One warehouse per JVM (static conf — can't change after the first
    * session): process-unique path under tmpdir, deleted on JVM exit so
    * repeated Verify/Bench invocations don't accrete empty dirs (the
    * table-staging gates drop their tables, so the dir is empty or
    * near-empty at exit; recursive best-effort delete either way). */
  private lazy val warehouseDir: String = {
    val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      s"/graft-warehouse-${java.util.UUID.randomUUID().toString.take(8)}"
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

  /** Shuffle partition count: the caller's value (CPU count for the
    * local harnesses), overridable with SPARK_GRAFT_SHUFFLE. Partition
    * count is a DEPLOYMENT setting that scales with data, not a plan
    * property — at sf0.1–sf10 the 32-way shuffle is right (and 256 was
    * measured WORSE, see the rejected-tuning note below), but the sf100
    * window-sort probes (q_cumsum: 3.1M rows × ~100 B per task, ×32
    * concurrent sorts) exceed the execution-memory budget and
    * spill+GC-thrash at 32 — the same query at 128 partitions fits
    * (measured r17: first-execution samples 56–100 s at 32 vs a tight
    * 9–15 s band at 128, same ~9.3–10.3 s steady-state best either way
    * — SCALE.md "r17: q_cumsum at sf100"). The env var is how a scale
    * run states its deployment setting without changing the default any
    * benched number depends on. */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder = {
    // The override must be LOUD (ADVICE r16): a leaked env var silently
    // changing the shuffle width invalidates every benched number, so an
    // active override is announced on stderr where bench/test logs
    // record the effective deployment setting.
    val effectiveShuffle = sys.env.get("SPARK_GRAFT_SHUFFLE") match {
      case Some(v) =>
        System.err.println(s"[graft] SPARK_GRAFT_SHUFFLE=$v overrides the " +
          s"caller's shuffle-partition default ($shufflePartitions) — " +
          "benched numbers depend on this setting")
        v
      case None => shufflePartitions.toString
    }
    // Scan-split sizing is a DEPLOYMENT setting like the shuffle width
    // (r17, guide §6): 16m keeps the MB-scale fixture scans from
    // collapsing to one task wherever the files carry several row groups,
    // but on cluster-scale inputs small splits multiply the map-task
    // count feeding every shuffle (guide §2.2) — a 100 TB deployment
    // wants 128m-1g. Same loud-override contract as SPARK_GRAFT_SHUFFLE.
    val effectiveSplit = sys.env.get("SPARK_GRAFT_MAX_PARTITION_BYTES") match {
      case Some(v) =>
        System.err.println(s"[graft] SPARK_GRAFT_MAX_PARTITION_BYTES=$v " +
          "overrides the 16m local scan-split default — benched numbers " +
          "depend on this setting")
        v
      case None => "16m"
    }
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", effectiveShuffle)
      .config("spark.sql.adaptive.enabled", "true")
      // Local-mode tuning: AQE's default 64 MB advisory size coalesces the
      // fixture-scale shuffles to 1–8 partitions, serializing CPU-heavy
      // stages (md5 shingling, 16-way minhash agg: 26s → 3s with this).
      // On a real cluster at 100 TB the partitions are already ≥64 MB and
      // these values are equivalent to the defaults in effect.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      // Tested and REJECTED (r15): coalescePartitions.initialPartitionNum
      // = 256 ("start wide, let AQE coalesce") read q_join_agg at sf100
      // 47 → 111 s and the sf0.1 bench batch +0.5 s — on local[32] the
      // 32-bucket shuffle with ~100 MB partitions beats 8× more tasks
      // (per-task hash-build and shuffle-file overhead dominate; nothing
      // was spilling at 32). On a real cluster shuffle.partitions is a
      // deployment-level setting; the plans themselves are
      // partition-count-agnostic.
      .config("spark.sql.files.maxPartitionBytes", effectiveSplit)
      .config("spark.sql.session.timeZone", "UTC")
      // keep managed-table data (bucketed-join tests) out of the repo cwd,
      // unique per JVM so concurrent test runs don't collide on table paths
      .config("spark.sql.warehouse.dir", warehouseDir)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Fixture timestamps are parquet isAdjustedToUTC=false; read them as
      // TimestampType (not NTZ) — with the UTC session timezone the instant
      // is identical and the engine keeps a single timestamp type.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // TypedImperativeAggregate (topk_agg, minhash) plans as
      // ObjectHashAggregate, which abandons the hash map for a sort-based
      // fallback after 128 distinct keys by default — turning the ANN
      // top-k's k-sized-heap design back into a full map-side sort of the
      // scored pairs once |queries| > 128. The buffers are bounded (k
      // entries each), so a 6-figure group count is a few MB of heaps:
      // raise the fallback far above any realistic per-task group count.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1048576")
      // The tiled rerank (SimilarityOps.rerankOnQuantized, tiles > 1)
      // co-partitions pair rows by their grid CELL — a strict subset of
      // the (cell, id) join keys — so the wide post-join rows are never
      // re-exchanged. Spark 3.3+ rejects subset co-partitioning by
      // default (a skew heuristic: fewer distinct partition keys can
      // under-parallelize); here the cell key is engineered to have
      // ≥ 2·tiles² values against as many partitions, and accepting the
      // subset is the difference between shuffling 16-byte pair rows
      // once and shuffling every pair with a 512-byte vector attached
      // (the measured-fatal sf10 shape). Correctness-neutral: equal full
      // keys always imply equal subset keys.
      //
      // SCOPE DECISION (VERDICT r16 what's-wrong #3): kept SESSION-WIDE
      // deliberately, not scoped to the rerank. A set/restore around the
      // tiled join's CONSTRUCTION would be a no-op theater — SQLConf is
      // read at planning/execution time, long after rerankOnQuantized
      // returns its lazy DataFrame — and a thread-local withSQLConf can't
      // cover AQE re-planning on executor-side threads. The behavior
      // change for non-rerank joins (a join whose children are already
      // partitioned on a SUBSET of its keys skips the re-exchange) is
      // therefore accepted engine-wide and PINNED: PlanAuditSpec's
      // "subset co-partitioning" case locks the exchange count of a
      // representative non-rerank co-partitioned join, so a Spark default
      // change or an accidental conf removal surfaces as a failing plan
      // shape instead of silent extra (or missing) shuffles.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
    // State-store provider: a DEPLOYMENT setting, like the shuffle width
    // above. Measured head-to-head at sf100 (q_stream_dedup, 100M rows →
    // 40M state rows / 9.2 GB, SCALE.md "r17: q_stream_dedup at sf100"):
    // the HDFS-backed in-heap default ran 465 s vs RocksDB+changelog
    // 666 s on calm-box best-of-3 — while state FITS executor memory the
    // in-heap map wins (~1.4×; RocksDB pays JNI + SST churn on every
    // update, and its watermark eviction scans just like the default's).
    // RocksDB is the CAPACITY knob, not a speed knob: state beyond the
    // heap (the crawl-scale regime) only runs at all off-heap, which is
    // why production deployments still choose it. Gates that REQUIRE
    // RocksDB (transformWithState) scope it themselves regardless.
    val b2 = sys.env.get("SPARK_GRAFT_STATE_STORE") match {
      case Some("rocksdb") =>
        System.err.println("[graft] SPARK_GRAFT_STATE_STORE=rocksdb " +
          "overrides the HDFS-backed state-store default — streaming gate " +
          "numbers depend on this setting")
        b.config("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state" +
              ".RocksDBStateStoreProvider")
          .config("spark.sql.streaming.stateStore.rocksdb" +
            ".changelogCheckpointing.enabled", "true")
      case Some(other) =>
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_STATE_STORE=$other: only 'rocksdb' is supported")
      case None => b
    }
    b2
  }
}

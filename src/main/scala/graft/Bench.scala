package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark harness (driver-run per round → BENCH_r{N}.json).
  *
  * Times a headline subset of SparkEntry.queries at the SF in
  * SPARK_GRAFT_SF_DIR, plus the reference's canonical grouped-sum
  * micro-bench shape (10M rows × 200 groups,
  * `/root/reference/benches/groupby.rs:10-17`). Results are forced through
  * the `noop` sink so Catalyst cannot prune away the measured work (a
  * `count()` would let column pruning drop window/projection columns).
  * Prints ONE JSON line.
  *
  * SELF-ADJUDICATION (VERDICT r16 item 1): the JSON carries a `control`
  * object with same-moment, code-independent work — a pure-JVM xorshift
  * spin (single-thread best-of-3, bracketing the run) and the frozen
  * DuckDB yardstick (`tools/duck_yardstick.py`, subprocess, run the
  * minute the batch set finishes). A regression that also inflates the
  * controls is box weather; one that doesn't is code.
  */
object Bench {

  /** Representative spread: scan+hash-agg, moments, sort-based quantile,
    * running windows, rank, star join, as-of, LSH dedup, embedding top-k,
    * event-time windows, plus one real-engine streaming gate and one
    * codec pipeline so the two newest subsystem families are tracked
    * round over round (r10 verdict item 7). */
  val headline: Seq[String] = Seq(
    "q1_flagship", "q_moments", "q_quantile", "q_cumsum", "q_rank",
    "q_join_agg", "q_asof", "q_neardup_lsh", "q_embed_topk",
    "q_window_tumbling", "q_session_window", "q_stream_dedup",
    "q_image_resize")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // optional positional args restrict the run to the named headline
    // queries (dev loop / targeted scale points); no args = full set
    val selected = if (args.nonEmpty) headline.filter(args.contains) else headline
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- same-moment controls (VERDICT r16 item 1) ----
    // BENCH_r16 inflated ~1.8x across every query INCLUDING the untouched
    // micro control, and the exculpatory pinned-binary replay was timed at
    // a DIFFERENT moment — the artifact could not adjudicate itself.
    // Every bench now ships its own weather report: (a) a deterministic
    // pure-JVM xorshift spin (single-thread and 32-thread), independent of
    // graft code, Spark, and the data — a fixed constant of the box; (b)
    // the frozen DuckDB yardstick (tools/duck_yardstick.py) run in a
    // subprocess right after the batch set — same minute, same box,
    // second engine. Engine numbers inflating TOGETHER with the controls
    // = box weather; the engine inflating ALONE = a code regression.
    def spin(iters: Long): Double = {
      var x = 0x9E3779B97F4A7C15L
      var acc = 0L
      var i = 0L
      val t0 = System.nanoTime()
      while (i < iters) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; acc += x; i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      if (acc == 42L) System.err.println("") // defeat dead-code elimination
      dt
    }
    def spinMt(threads: Int, iters: Long): Double = {
      val t0 = System.nanoTime()
      val ts = (1 to threads).map(_ => new Thread(() => { spin(iters); () }))
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    def duckYardstick(): Option[String] = {
      val script = Seq("tools/duck_yardstick.py",
        "/root/repo/tools/duck_yardstick.py")
        .find(p => new java.io.File(p).exists())
      script.flatMap { s =>
        try {
          // stderr merged into stdout (an undrained stderr pipe fills and
          // deadlocks the child) and the read runs on its OWN thread so
          // the 300 s deadline is enforceable — a blocking readAllBytes
          // before waitFor would make the timeout unreachable and hang
          // the whole bench on a stuck child (r17 review finding)
          val p = new ProcessBuilder("python3", s, sfDir)
            .redirectErrorStream(true).start()
          val buf = new java.util.concurrent.atomic.AtomicReference[String]("")
          val reader = new Thread(() => {
            try buf.set(new String(p.getInputStream.readAllBytes(), "UTF-8"))
            catch { case _: Throwable => }
          })
          reader.setDaemon(true)
          reader.start()
          val done = p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
          if (!done) {
            System.err.println("[graft] duck yardstick timed out (300 s); " +
              "killing it — control omitted from this bench line")
            p.destroyForcibly()
            None
          } else {
            reader.join(10000)
            val line = buf.get.trim.linesIterator.toSeq
              .filter(_.startsWith("{")).lastOption.getOrElse("")
            if (p.exitValue() == 0 && line.nonEmpty) Some(line) else None
          }
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft] duck yardstick unavailable: $e")
          None
        }
      }
    }
    val spinStPre = (1 to 3).map(_ => spin(500000000L)).min
    val spinMtPre = (1 to 3).map(_ => spinMt(32, 100000000L)).min

    val queries = SparkEntry.queries
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    // All raw samples per query, so a round-over-round delta can be
    // attributed to run-to-run variance vs a genuine plan/code drift
    // without rerunning (the box shows documented 2-3x co-tenant noise).
    val samples = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    // Per-phase wall times for the multi-phase LSH pipeline (verdict r9
    // item 6): each labeled Phase.cut reports its eager-materialization
    // time; the LAST timed run's labels are kept (steady-state, after the
    // C2 warm runs), and the un-cut remainder (band join + estimate filter
    // + exact rerank, executed by the final job) is derived from that
    // run's total so the map accounts for the whole query.
    val phases = scala.collection.mutable.LinkedHashMap[String, Double]()
    // The streaming/codec gates warm up and time AFTER the 11-query batch
    // set completes (r11 verdict item 3): their warmups stage temp
    // parquet, open RocksDB state stores, and run JVM codecs — native
    // allocations + page-cache churn that r11 charged to the batch set by
    // warming everything up front (BENCH_r11's near-uniform +24-37% drift
    // on plans PlanAuditSpec locks as unchanged). Grouping restores the
    // r10 measurement conditions for the batch aggregate while keeping
    // both families tracked in one artifact.
    val gateQueries = Set("q_stream_dedup", "q_image_resize")
    val warmupDir = "/root/testdata/sf0.001"
    def runGroup(group: Seq[String]): Unit = {
      // Steady-state measurement: run each group's queries once at the
      // smallest SF so JIT/codegen compilation of each plan's generated
      // code isn't charged to the timed run (cold md5/explode paths alone
      // cost ~10 s of C2 compilation on first use).
      group.foreach { name =>
        try noop(queries(name)(spark, warmupDir)) catch { case _: Throwable => }
      }
      System.gc() // drop warmup garbage so timed runs don't pay its GC debt
      group.foreach { name =>
        // best-of-3 with a GC fence per query: the heavy text pipelines
        // (md5 shingling + 16-way minhash) take 2-3 executions of the
        // full-SF plan before C2 reaches steady state, and accumulated
        // checkpoint blocks from a previous query can charge their cleanup
        // to the next one — best-of-2 measured that noise, not the engine
        // (observed: 4.9/5.6/1.5/1.5 s for the same LSH plan back-to-back)
        results(name) =
          try {
            System.gc()
            val collectPhases = name == "q_neardup_lsh"
            val runs = (1 to 3).map { _ =>
              if (collectPhases) graft.ops.Phase.startTimings()
              time(noop(queries(name)(spark, sfDir)))
            }
            if (collectPhases) {
              val cuts = graft.ops.Phase.drainTimings()
              cuts.foreach { case (l, s) => phases(l) = s }
              phases("rerank_and_rest") = runs.last - cuts.map(_._2).sum
            }
            samples(name) = runs
            runs.min
          } catch { case _: Throwable => -1.0 }
      }
    }
    runGroup(selected.filterNot(gateQueries))
    // the DuckDB yardstick runs the MINUTE the batch set finishes — the
    // adjudication pairing that matters most (the gates have their own
    // stateful noise sources and are judged against their SCALE.md rows)
    val duckJson = duckYardstick()
    runGroup(selected.filter(gateQueries))

    // Reference micro-bench: grouped sum, 10M rows × 200 groups
    // (`benches/groupby.rs` / README.md:115-140 shape). Same best-of-3 +
    // GC fence as the headline queries (observed 0.6–1.3 s spread when
    // timed once, steady ~0.6 s).
    def microRun(): Unit =
      noop(spark.range(10000000L)
        .select((col("id") % 200).as("k"), (col("id") % 1000).cast("double").as("v"))
        .groupBy("k")
        .agg(sum("v").as("sum_v"), avg("v").as("avg_v"), count(lit(1)).as("n")))
    System.gc()
    val microRuns = (1 to 3).map(_ => time(microRun()))
    samples("micro_group_sum_10m_200") = microRuns
    results("micro_group_sum_10m_200") = microRuns.min

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val ss = samples.map { case (k, vs) =>
      "\"" + k + "\":" + vs.map(v => f"$v%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val ph = phases.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("""{"q_neardup_lsh":{""", ",", "}}")
    val spinStPost = (1 to 3).map(_ => spin(500000000L)).min
    val control = {
      val duck = duckJson.getOrElse("null")
      val shuffle = spark.conf.get("spark.sql.shuffle.partitions")
      val utc = java.time.Instant.now().toString
      f"""{"jvm_spin_st_pre":$spinStPre%.3f,"jvm_spin_mt32_pre":$spinMtPre%.3f,"jvm_spin_st_post":$spinStPost%.3f,"duck_yardstick":$duck,"shuffle_partitions":$shuffle,"utc":"$utc"}"""
    }
    val total = results.values.filter(_ >= 0).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"samples":$ss,"phases":$ph,"control":$control,"sf":"$sfDir"}"""
    println(line)
    // Belt-and-suspenders for the driver's `parsed` field: even if a log
    // wrapper prefixes stdout, the bare JSON line is always on disk.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_last.json"),
      (line + "\n").getBytes("UTF-8"))
    catch {
      // NonFatal only — an OOM/VM error must not be masked here — and a
      // visible one-liner so a missing file is diagnosable (ADVICE r9)
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] bench_last.json write failed: $e")
    }
    spark.stop()
  }
}

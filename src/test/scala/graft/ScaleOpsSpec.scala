package graft

import graft.ops.{RelOps, TakeOps}
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** Scale helpers: salted aggregation equals plain aggregation; positional
  * column gather; stateful streaming cumsum equals the batch window cumsum. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    import spark.implicits._
    // 95% of left rows share one key; thresholds forced tiny so local
    // data sizes trigger the same OptimizeSkewedJoin path a 100 TB hot
    // key would.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.shuffle.partitions" -> "8")
    val saved = confs.map { case (key, _) => key -> spark.conf.getOption(key) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(200000L)
        .select(when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          concat(lit("payload_"), col("id")).as("s"))
      val right = spark.range(1000L).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // 190000 rows on the hot key 7 + the 50 distinct keys < 1000
      assert(joined.count() == 190050L)
      // run THIS dataframe's own physical plan so its adaptive plan
      // finalizes (count()/foreach() above plan separate executions)
      val qe = joined.queryExecution
      qe.executedPlan.execute().count()
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected a skew-split join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("saltedAgg(sum, count) equals direct groupBy on a skewed key") {
    // 90% of rows share one key — the pattern that hot-spots one reducer
    val rows = (0 until 20000).map { i =>
      val k = if (i % 10 == 0) (i % 7).toLong else 999L
      (k, (i % 100).toLong)
    }
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = RelOps.saltedAgg(df, Seq("k"), buckets = 16,
        partial = Seq("s" -> sum(col("v")), "n" -> count(lit(1))),
        finalAgg = Seq("s" -> sum(col("s")), "n" -> sum(col("n"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("saltedJoin equals the plain join on a skewed key, inner and left") {
    // 90% of probe rows share one key; build has matched and unmatched keys
    val probe = (0 until 20000).map { i =>
      val k = if (i % 10 == 0) (i % 7).toLong else 999L
      (k, i.toLong)
    }.toDF("k", "pv")
    val build = (0L to 7L).map(k => (k, s"b$k")).toDF("k", "bv") // 999 unmatched
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSeq.sorted(
        Ordering.Tuple3[Long, Long, Option[String]])
    assert(rows(RelOps.saltedJoin(probe, build, Seq("k"), 16)) ==
      rows(probe.join(build, Seq("k"))))
    assert(rows(RelOps.saltedJoin(probe, build, Seq("k"), 16, "left")) ==
      rows(probe.join(build, Seq("k"), "left")))
    // the salted plan is still an equi-join — build replication is a
    // generator, never a cartesian
    val plan = RelOps.saltedJoin(probe, build, Seq("k"), 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Generate"), plan)
  }

  test("saltedJoin default salt skips NESTED map columns (array<map>, struct with map)") {
    // xxhash64 rejects MapType anywhere in the type tree at analysis, not
    // just top-level — the default salt must filter recursively (ADVICE r9)
    val probe = Seq((1L, 10L)).toDF("k", "pv")
      .withColumn("am", array(map(lit("a"), lit(1))))
      .withColumn("sm", struct(map(lit("b"), lit(2)).as("m")))
    val build = Seq((1L, "b")).toDF("k", "bv")
    val out = RelOps.saltedJoin(probe, build, Seq("k"), 4).collect()
    assert(out.length == 1 && out.head.getAs[String]("bv") == "b")
  }

  test("saltedJoin rejects buckets < 1 instead of silently returning empty") {
    // buckets=0 used to make pmod(x, 0) = NULL probe salts: inner join
    // silently empty, left join all-NULL build columns
    val probe = Seq((1L, 2L)).toDF("k", "pv")
    val build = Seq((1L, "b")).toDF("k", "bv")
    intercept[IllegalArgumentException] {
      RelOps.saltedJoin(probe, build, Seq("k"), 0)
    }
  }

  test("saltedJoin runs on streaming inputs (deterministic salt)") {
    // the salt is a hash of the probe row, not monotonically_increasing_id
    // (which the UnsupportedOperationChecker rejects on streams) — so the
    // advertised stream-stream use actually starts and matches the batch
    // join
    val probe = (0 until 200).map(i => ((i % 5).toLong, i.toLong)).toDF("k", "pv")
    val build = (0L to 5L).map(k => (k, s"b$k")).toDF("k", "bv")
    probe.write.mode("overwrite").parquet(tmpPath("salt_probe_in"))
    build.write.mode("overwrite").parquet(tmpPath("salt_build_in"))
    val sp = spark.readStream.schema(probe.schema).parquet(tmpPath("salt_probe_in"))
    val sb = spark.readStream.schema(build.schema).parquet(tmpPath("salt_build_in"))
    val q = RelOps.saltedJoin(sp, sb, Seq("k"), 8)
      .writeStream.outputMode("append").format("memory")
      .queryName("salt_join_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("salt_join_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted
      val want = probe.join(build, Seq("k")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted
      assert(got == want)
    } finally q.stop()
  }

  test("take2dAxis1 projects columns by position") {
    val df  = Seq((1, "a", 2.0)).toDF("c0", "c1", "c2")
    val got = TakeOps.take2dAxis1(df, Seq(2, 0))
    assert(got.columns.toSeq == Seq("c2", "c0"))
    assert(got.head() == org.apache.spark.sql.Row(2.0, 1))
  }

  test("stateful streaming cumsum == batch window cumsum") {
    // (event_id, user_id, value) tuples through flatMapGroupsWithState
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"),
        round(col("value") * 100).cast("long").cast("double").as("v"))
      .as[(Long, Long, Double)]
    val batch = ev.toDF("event_id", "user_id", "v")
      .select(col("event_id"),
        sum("v").over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
          .as("cs"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    ev.write.mode("overwrite").parquet(tmpPath("graft_state_in"))
    val stream = spark.readStream.schema(ev.schema).parquet(tmpPath("graft_state_in"))
      .as[(Long, Long, Double)]
    val q = StreamOps.statefulCumsum(stream)
      .toDF("event_id", "user_id", "cs")
      .writeStream.outputMode("append").format("memory")
      .queryName("state_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("state_out").collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(got.size == batch.size)
      // integer-cents values -> exact equality batch vs stream
      batch.foreach { case (id, cs) => assert(got(id) == cs, s"event $id") }
    } finally q.stop()
  }

  test("transformWithState running sum (RocksDB state) matches the window cumsum") {
    import spark.implicits._
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"),
        round(col("value") * 100).cast("long").cast("double").as("v"))
      .as[(Long, Long, Double)]
    val batch = ev.toDF("event_id", "user_id", "v")
      .select(col("event_id"),
        sum("v").over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
          .as("cs"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    ev.write.mode("overwrite").parquet(tmpPath("graft_tws_in"))
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = spark.readStream.schema(ev.schema).parquet(tmpPath("graft_tws_in"))
      .as[(Long, Long, Double)]
    val q = StreamOps.statefulCumsumTws(stream)
      .toDF("event_id", "user_id", "cs")
      .writeStream.outputMode("append").format("memory")
      .queryName("tws_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("tws_out").collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(got.size == batch.size)
      batch.foreach { case (id, cs) => assert(got(id) == cs, s"event $id") }
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("batchCumsum: streaming-pass batch variant matches the window cumsum") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (0L until 5000L).map(i => (i, (rnd.nextInt(7)).toLong,
      rnd.nextInt(1000).toDouble))
    val ds = rows.toDF("id", "k", "v").as[(Long, Long, Double)]
    val expected = ds.toDF("id", "k", "v")
      .select(col("id"),
        sum("v").over(org.apache.spark.sql.expressions.Window
          .partitionBy("k").orderBy("id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
          .as("cs"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = StreamOps.batchCumsum(ds).collect()
      .map { case (id, _, cs) => id -> cs }.toMap
    assert(got.size == expected.size)
    // integral values, per-key ordered accumulation -> exact equality
    expected.foreach { case (id, cs) => assert(got(id) == cs, s"row $id") }
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // At 100 TB a selective dim filter should reach the fact scan as a
    // runtime bloom filter (row-level runtime filtering), cutting shuffle
    // input before the join. Default thresholds (10 MB creation side /
    // 10 GB application side) are sized for clusters, so lower them to
    // fixture scale and pin the injection itself.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = "/root/testdata/sf0.001"
      val part = Tables.part(spark, dir).where(col("p_size") === 1)
      val li = Tables.lineitem(spark, dir)
      val joined = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(sum("l_quantity").as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter"),
        s"expected a runtime bloom filter on the fact side:\n$plan")
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** SparkSessionExtensions registration: custom functions resolve in plain
  * SQL on a session built with GraftExtensions. */
class ExtensionsSpec extends SparkSpec {

  test("kahan_sum and dotq resolve via withExtensions") {
    spark.sparkContext // ensure the shared context exists first
    // getOrCreate returns any active session verbatim (extensions would be
    // silently skipped) — clear session state so a NEW session is built on
    // the same SparkContext with the extensions applied; restore after.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val k = s2.sql("SELECT kahan_sum(x) FROM VALUES (1.5), (2.5), (CAST(NULL AS DOUBLE)) t(x)")
        .head().getDouble(0)
      assert(k == 4.0)
      val d = s2.sql(
        "SELECT dotq(array(1L, 2L, 3L), array(4L, 5L, 6L))").head().getLong(0)
      assert(d == 32L)
      // do NOT s2.stop(): it shares the JVM-wide SparkContext
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("quantile_agg and minhash_agg resolve via withExtensions") {
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // quantile_agg: all 5 interpolation modes == the DataFrame kernel
      // (QuantileOps.groupedQuantiles) on the same grouped data
      import s2.implicits._
      val df = kernelData(2000, 7, 0.1).toDF("id", "g", "v")
        .select($"g", $"v".cast("double").as("v"))
      df.createOrReplaceTempView("qa_in")
      val modes = Seq("linear", "lower", "higher", "nearest", "midpoint")
      val got = s2.sql(
        "SELECT g, " + modes.map(m =>
          s"quantile_agg(v, 0.35D, '$m') AS $m").mkString(", ") +
        " FROM qa_in GROUP BY g").collect()
        .map(r => r.getLong(0) -> modes.indices.map(i => r.getDouble(i + 1))).toMap
      val want = graft.ops.QuantileOps
        .groupedQuantiles(df, Seq("g"), "v", Seq(0.35)).collect()
        .map(r => r.getLong(0) -> modes.indices.map(i => r.getDouble(i + 2))).toMap
      assert(got == want, s"quantile_agg diverged from QuantileOps: $got vs $want")
      // all-null group -> NULL (reference all-NA contract)
      val nullRow = s2.sql(
        "SELECT quantile_agg(v, 0.5D, 'linear') FROM VALUES (CAST(NULL AS DOUBLE)) t(v)")
        .head()
      assert(nullRow.isNullAt(0))

      // minhash_agg: identical values AND identical plan vs the DataFrame
      // path (the injected function builds the same expression tree)
      val docs = Seq((0L, "the quick brown fox jumps over the lazy dog"),
        (1L, "completely different content here")).toDF("doc_id", "text")
      val sh = graft.ops.DedupOps.wordShingleHashes(docs, "doc_id", "text")
      sh.createOrReplaceTempView("mh_in")
      val sqlDf = s2.sql(
        "SELECT id, minhash_agg(h, 0) mh0, minhash_agg(h, 3) mh3 FROM mh_in GROUP BY id")
      val dfDf = sh.groupBy($"id").agg(
        graft.functions.TextFunctions.minhashAgg($"h", 0).as("mh0"),
        graft.functions.TextFunctions.minhashAgg($"h", 3).as("mh3"))
      assert(sqlDf.orderBy("id").collect().toSeq ==
        dfDf.orderBy("id").collect().toSeq)
      assert(sqlDf.queryExecution.optimizedPlan.canonicalized ==
        dfDf.queryExecution.optimizedPlan.canonicalized,
        "SQL and DataFrame minhash plans should be identical")
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("RangeJoinBinRule: pure range join becomes a binned equi-join when enabled") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      Seq((1L, 5L), (2L, 25L), (3L, -7L), (4L, 11L)).toDF("pid", "t")
        .createOrReplaceTempView("rj_points")
      Seq((100L, 0L, 10L), (101L, -10L, -1L), (102L, 20L, 30L), (103L, 11L, 11L))
        .toDF("rid", "lo", "hi").createOrReplaceTempView("rj_ranges")
      val sql = """SELECT pid, rid FROM rj_points p JOIN rj_ranges r
                   ON p.t >= r.lo AND p.t <= r.hi"""
      val expected = Set((1L, 100L), (2L, 102L), (3L, 101L), (4L, 103L))

      // rule off (conf unset): correct, but a nested-loop plan
      val off = s2.sql(sql)
      assert(off.collect().map(x => (x.getLong(0), x.getLong(1))).toSet == expected)
      assert(off.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))

      // rule on: same rows, equality join on the bin, no nested loop
      s2.conf.set("spark.graft.rangeJoin.binWidth", "8")
      try {
        val on = s2.sql(sql)
        assert(on.collect().map(x => (x.getLong(0), x.getLong(1))).toSet == expected)
        val p = on.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin"), p)
        assert(!p.contains("CartesianProduct"), p)
        assert(p.contains("__pbin") && p.contains("__rbin"), p)

        // inverted/dirty interval (lo > hi): no runtime Sequence failure,
        // the row simply matches nothing (clamped bin range + residual)
        Seq((200L, 30L, 20L), (201L, 0L, 10L))
          .toDF("rid", "lo", "hi").createOrReplaceTempView("rj_dirty")
        val dirty = s2.sql("""SELECT pid, rid FROM rj_points p JOIN rj_dirty r
                              ON p.t >= r.lo AND p.t <= r.hi""")
        assert(dirty.collect().map(x => (x.getLong(0), x.getLong(1))).toSet ==
          Set((1L, 201L)))

        // ordinates beyond 2^53 (epoch-ns scale): integral bin math stays
        // exact where a double round-trip would mis-bin
        val big = 1L << 60
        Seq((1L, big + 3L), (2L, big + 13L)).toDF("pid", "t")
          .createOrReplaceTempView("rj_big_p")
        Seq((300L, big, big + 7L)).toDF("rid", "lo", "hi")
          .createOrReplaceTempView("rj_big_r")
        val bigRows = s2.sql("""SELECT pid, rid FROM rj_big_p p JOIN rj_big_r r
                                ON p.t >= r.lo AND p.t <= r.hi""")
        assert(bigRows.collect().map(x => (x.getLong(0), x.getLong(1))).toSet ==
          Set((1L, 300L)))
      } finally s2.conf.unset("spark.graft.rangeJoin.binWidth")

      // malformed conf: the rule logs and no-ops instead of throwing for
      // every query in the session
      s2.conf.set("spark.graft.rangeJoin.binWidth", "not-a-number")
      try {
        val off2 = s2.sql(sql)
        assert(off2.collect().map(x => (x.getLong(0), x.getLong(1))).toSet == expected)
      } finally s2.conf.unset("spark.graft.rangeJoin.binWidth")
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}

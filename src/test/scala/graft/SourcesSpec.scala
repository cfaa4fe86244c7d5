package graft

import org.apache.spark.sql.functions._

/** Source/sink coverage (SURVEY.md §2.5: the reference's caller reads the
  * data; our engine exposes Spark's sources directly): parquet→csv→json
  * round-trips preserve values, with explicit schemas on schemaless
  * formats. */
class SourcesSpec extends SparkSpec {

  private val base = tmpPath("graft_sources")

  test("csv round-trip preserves lineitem values") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    li.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    val back = spark.read.option("header", "true").schema(li.schema).csv(s"$base/csv")
    assert(back.count() == li.count())
    val a = li.agg(sum("l_quantity")).head.getDouble(0)
    val b = back.agg(sum("l_quantity")).head.getDouble(0)
    assert(a == b)
  }

  test("json round-trip preserves nested-free rows and nulls") {
    import spark.implicits._
    val df = Seq((1L, Some("x"), Some(1.5)), (2L, None, None))
      .toDF("id", "s", "v")
    df.write.mode("overwrite").json(s"$base/json")
    val back = spark.read.schema(df.schema).json(s"$base/json")
    val rows = back.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(0).getString(1) == "x" && rows(0).getDouble(2) == 1.5)
  }

  test("text source reads raw lines (one string column)") {
    val dir = s"$base/text"
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").limit(50)
      .write.mode("overwrite").text(dir)
    val back = spark.read.text(dir)
    assert(back.schema.fieldNames.toSeq == Seq("value"))
    assert(back.count() == 50)
  }

  test("orc round-trip preserves values and types") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
    li.write.mode("overwrite").orc(s"$base/orc")
    val back = spark.read.orc(s"$base/orc")
    assert(back.schema == li.schema)
    assert(back.count() == li.count())
    val a = li.agg(sum("l_quantity"), max("l_shipdate")).head
    val b = back.agg(sum("l_quantity"), max("l_shipdate")).head
    assert(a == b)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    // bucketBy pre-partitions both sides on the join key at write time —
    // the 100 TB co-located-join path (one-time shuffle amortized across
    // every later join on that key).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
        .select("l_orderkey", "l_quantity")
      val o = Tables.orders(spark, "/root/testdata/sf0.001")
        .select("o_orderkey", "o_custkey")
      li.write.mode("overwrite").bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bkt")
      o.write.mode("overwrite").bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("o_bkt")
      val joined = spark.table("li_bkt")
        .join(spark.table("o_bkt"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() == li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("partitioned parquet write prunes partitions on read") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(s"$base/part")
    val pruned = spark.read.parquet(s"$base/part").where(col("l_returnflag") === "A")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == li.where(col("l_returnflag") === "A").count())
    assert(plan.contains("PartitionFilters") || plan.contains("partitionFilters"))
  }
}

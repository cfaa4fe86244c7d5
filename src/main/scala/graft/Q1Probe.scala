package graft

import org.apache.spark.sql.functions._

/** Dev tool: stage-attribution for q1_flagship's sf100 gap (r15 — the
  * sf100 probe, VERDICT r14 item 1, read 7.9× vs DuckDB where the
  * per-decade trend predicted ≤2×). Times the pipeline cumulatively
  * (scan, +filter, +cents arithmetic, +simple aggs, +decimal product
  * accumulators) and accumulator variants, so the gap can be pinned to
  * parquet decode vs hash-agg vs decimal arithmetic width.
  */
object Q1Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf100")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def best3(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }.min match { case t => println(f"$name%-28s $t%.3f s") }
    }
    def cents(c: String) = round(col(c) * 100).cast("long")

    def li = Tables.lineitem(spark, sfDir)
    val cut = lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00"))
    def cols = li.select("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
    def filtered = cols.where(col("l_shipdate") <= cut)
    def projected = filtered.select(col("l_returnflag"), col("l_linestatus"),
      col("l_quantity"), cents("l_extendedprice").as("pc"),
      cents("l_discount").as("dc"), cents("l_tax").as("tc"))

    best3("scan_7cols")(cols)
    best3("+filter")(filtered)
    best3("+cents_arith")(projected)
    best3("+agg_qty_count")(projected.groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n")))
    best3("+agg_long_sums")(projected.groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"), sum("pc").as("spc"),
        sum("dc").as("sdc"), count(lit(1)).as("n")))
    // the two decimal(38,0) product accumulators, alone
    best3("+agg_dec38_products")(projected
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum((col("pc") * (lit(100L) - col("dc"))).cast("decimal(38,0)"))
          .as("sdp"),
        sum((col("pc") * (lit(100L) - col("dc")) * (lit(100L) + col("tc")))
          .cast("decimal(38,0)")).as("sch")))
    // narrower declared precision — does Spark's Decimal stay compact?
    best3("+agg_dec19_products")(projected
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum((col("pc") * (lit(100L) - col("dc"))).cast("decimal(19,0)"))
          .as("sdp"),
        sum((col("pc") * (lit(100L) - col("dc")) * (lit(100L) + col("tc")))
          .cast("decimal(19,0)")).as("sch")))
    // double-sum ceiling (INEXACT — diagnostic only)
    best3("+agg_double_products")(projected
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum((col("pc") * (lit(100L) - col("dc"))).cast("double")).as("sdp"),
        sum((col("pc") * (lit(100L) - col("dc")) * (lit(100L) + col("tc")))
          .cast("double")).as("sch")))
    // long-sum products (wraps at scale — diagnostic only)
    best3("+agg_long_products")(projected
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("pc") * (lit(100L) - col("dc"))).as("sdp"),
        sum(col("pc") * (lit(100L) - col("dc")) * (lit(100L) + col("tc")))
          .as("sch")))
    best3("full_q1")(SparkEntry.queries("q1_flagship")(spark, sfDir))
    spark.stop()
  }
}

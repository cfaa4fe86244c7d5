package graft
import graft.ops.Money

import org.apache.spark.sql.functions._

/** Dev tool: stage-attribution for q_join_agg's sf1 gap (VERDICT r7 item
  * 3) — times the pipeline cumulatively (scan+rev arithmetic, per-order
  * pre-agg, orders join, + per-customer pre-agg variant) so the 1.3 s gap
  * can be pinned to arithmetic vs agg vs join shuffle. */
object JoinAggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf1")
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

    def li = Tables.lineitem(spark, sfDir)
    def rev = li.select(col("l_orderkey"),
      (Money.cents(col("l_extendedprice"))
        * (lit(100L) - Money.cents(col("l_discount")))).as("rev_c"))
    def perOrder = rev.groupBy("l_orderkey")
      .agg(sum(col("rev_c")).as("rev_c"), count(lit(1)).as("nl"))
    def o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    def c = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")

    best3("scan_only")(li.select("l_orderkey", "l_extendedprice", "l_discount"))
    best3("scan+rev_arith")(rev)
    best3("rev+perorder_agg")(perOrder)
    best3("..+orders_join")(perOrder.join(o, col("l_orderkey") === col("o_orderkey")))
    best3("..+percust_agg")(perOrder.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum("rev_c").as("rev_c"), count(lit(1)).as("n_orders"), sum("nl").as("nl")))
    best3("full_current")(SparkEntry.queries("q_join_agg")(spark, sfDir))

    // variant: shuffle-hash the orders join (no 1.5M-row sorts)
    best3("shj_orders_join")(perOrder.join(o.hint("shuffle_hash"),
      col("l_orderkey") === col("o_orderkey")))
    // variant: full query with SHJ orders join + per-customer pre-agg
    def nat = Tables.nation(spark, sfDir)
    def reg = Tables.region(spark, sfDir)
    def fullV2 = {
      val perCust = perOrder
        .join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum("rev_c").as("rev_c"), count(lit(1)).as("n_orders"),
          sum("nl").as("nl"))
      perCust.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg((sum(col("rev_c")).cast("double") / 10000.0).as("revenue"),
          sum(col("n_orders")).as("n_orders"), sum(col("nl")).as("n_lines"))
        .orderBy("r_name", "n_name")
    }
    best3("full_v2_shj_percust")(fullV2)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    best3("v2_advisory16m")(fullV2)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    best3("v2_advisory1m")(fullV2)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    best3("v2_shufpart64")(fullV2)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.ExactAgg

/** Dev tool: A/B attribution for q_moments' sf100 anomaly (r15) — times
  * single-aggregate variants over lineitem so the 35 s reading can be
  * pinned to one accumulator kind (double sum vs sum_i128 vs the
  * double→long casts vs the 5-aggregate combination).
  */
object MomentsProbe {
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
    def li = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_linestatus", "l_quantity")
    val v = col("l_quantity")
    def g = li.groupBy("l_returnflag", "l_linestatus")

    best3("count_only")(g.agg(count(v).as("n")))
    best3("sum_double")(g.agg(sum(v).as("s")))
    best3("sum_long_cast")(g.agg(sum(v.cast("long")).as("s")))
    best3("sumi128_longcast")(g.agg(ExactAgg.sumI128(v.cast("long")).as("s")))
    best3("sumi128_x2")(g.agg(ExactAgg.sumI128((v * v).cast("long")).as("s")))
    best3("sumi128_s123")(g.agg(
      ExactAgg.sumI128(v.cast("long")).as("s1"),
      ExactAgg.sumI128((v * v).cast("long")).as("s2"),
      ExactAgg.sumI128((v * v * v).cast("long")).as("s3")))
    best3("full_q_moments")(SparkEntry.queries("q_moments")(spark, sfDir))
    spark.stop()
  }
}

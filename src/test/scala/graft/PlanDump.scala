package graft

/** Dev utility: print the executed physical plan of named queries over the
  * sf0.001 fixture (`Test/runMain graft.PlanDump q_a q_b …`). Mirrors
  * PlanAuditSpec's view of the plan so audit assertions can be drafted
  * against exactly the text they will match. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      println(s"===== $q")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}

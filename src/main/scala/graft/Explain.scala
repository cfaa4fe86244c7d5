package graft

/** Dev tool: print the formatted plan (and, with `exec`, the final adaptive
  * executed plan) of named SparkEntry queries — the feedback loop for the
  * "is this the plan you'd want at 100 TB" audit. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val exec  = args.contains("exec")
    val names = args.filterNot(_ == "exec")
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      df.explain("formatted")
      if (exec) {
        df.write.format("noop").mode("overwrite").save()
        println(s"----- $name executed (final adaptive) -----")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}

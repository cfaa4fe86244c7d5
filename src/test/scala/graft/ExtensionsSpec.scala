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
}

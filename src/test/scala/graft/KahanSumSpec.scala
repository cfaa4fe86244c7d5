package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Kahan sum: compensated accumulation beats naive double summation on
  * adversarial inputs and ignores nulls like SQL sum. */
class KahanSumSpec extends SparkSpec {
  import spark.implicits._

  test("kahan_sum recovers bits naive sum loses") {
    GraftFunctions.register(spark)
    // alternating huge/tiny values: naive partial sums lose the tiny ones
    val rows = (0 until 20000).map { i =>
      if (i % 2 == 0) 1e16 else 1.0
    } ++ Seq(-1e16 * 10000)
    val df = rows.toDF("v").repartition(8)
    val got = df.agg(expr("kahan_sum(v)").as("k"), sum($"v").as("naive"))
      .collect().head
    val exact = BigDecimal(10000) // 10000 ones survive after the big terms cancel
    val kahanErr = (BigDecimal(got.getDouble(0)) - exact).abs
    val naiveErr = (BigDecimal(got.getDouble(1)) - exact).abs
    assert(kahanErr == 0, s"kahan ${got.getDouble(0)}")
    assert(kahanErr <= naiveErr)
  }

  test("kahan_sum: nulls skipped, all-null group -> null") {
    GraftFunctions.register(spark)
    val df = Seq((0L, Some(1.5)), (0L, None), (1L, Option.empty[Double]))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(expr("kahan_sum(v)").as("k"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(0L).contains(1.5) && got(1L).isEmpty)
  }
}

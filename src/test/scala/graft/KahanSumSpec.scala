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

  test("cumsumKahan: compensated running sums where the naive window sum drifts") {
    // per-group sequence big, 1, 1, ... : every naive prefix sum after the
    // big term rounds the ones away; the compensated frame recovers them
    val rows = (0L until 2000L).map { i =>
      val g = i % 2
      val v = if (i < 2) 1e16 else 1.0
      (i, g, v)
    }
    val df  = rows.toDF("id", "g", "v").repartition(4)
    val ord = Seq(col("id"))
    val got = df.select(col("id"), col("g"), col("v"),
        graft.ops.WindowOps.cumsumKahan(col("v"), Seq(col("g")), ord).as("ck"),
        sum(col("v")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)).as("naive"))
      .orderBy("g", "id").collect()
    // exact prefix sums per group via BigDecimal
    val acc = scala.collection.mutable.Map[Long, BigDecimal]().withDefaultValue(BigDecimal(0))
    var kahanExact = 0
    var naiveExact = 0
    got.foreach { r =>
      val g = r.getLong(1)
      acc(g) = acc(g) + BigDecimal(r.getDouble(2))
      val exactD = acc(g).toDouble // correctly-rounded exact prefix
      if (r.getDouble(3) == exactD) kahanExact += 1
      if (r.getDouble(4) == exactD) naiveExact += 1
    }
    assert(kahanExact == got.length, s"kahan exact on $kahanExact/${got.length}")
    assert(naiveExact < got.length, "naive window sum unexpectedly exact — bad fixture")
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

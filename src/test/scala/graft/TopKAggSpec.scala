package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Edge cases for the heap-based top-k aggregate (TopKByValue): k larger
  * than the group, value ties resolving to the smaller id, null
  * skipping, and merge correctness under forced multi-partition
  * partials. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def run(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g").agg(expr(s"topk_agg(v, id, $k)").as("top"))
      .select(col("g"), col("top"))
      .as[(String, Seq[(Long, Long)])].collect().toMap

  test("k exceeding the group size returns the whole group, ordered") {
    val got = run(Seq(("a", 5L, 1L), ("a", 9L, 2L)).toDF("g", "v", "id"), 10)
    assert(got("a") == Seq((9L, 2L), (5L, 1L)))
  }

  test("value ties keep the smallest id; nulls skipped") {
    val df = Seq(("a", Some(7L), 3L), ("a", Some(7L), 1L), ("a", Some(7L), 2L),
        ("a", None, 0L), ("a", Some(9L), 9L))
      .toDF("g", "v", "id")
    val got = run(df, 2)
    assert(got("a") == Seq((9L, 9L), (7L, 1L)))
  }

  test("bad inputs are rejected at analysis time, not at runtime") {
    val df = Seq(("a", 5L, 1L)).toDF("g", "v", "id")
    // k = 0: plan-time failure instead of an empty-heap dequeue mid-task
    val e0 = intercept[Exception] {
      df.groupBy("g").agg(expr("topk_agg(v, id, 0)")).collect()
    }
    assert(e0.getMessage.contains("k must be >= 1"))
    // int-typed value column: plan-time type error instead of a
    // ClassCastException inside update()
    val di = Seq(("a", 5, 1L)).toDF("g", "v", "id")
    val e1 = intercept[Exception] {
      di.groupBy("g").agg(expr("topk_agg(v, id, 3)")).collect()
    }
    assert(e1.getMessage.toLowerCase.contains("bigint"))
  }

  test("double values: bit-exact round-trip, SQL descending order, extremes") {
    // extremes stress the sortable-bits encoding: the sign-fold maps the
    // double range onto nearly the full long range, where a negation-based
    // comparator would overflow
    val vals = Seq(Double.NegativeInfinity, -Double.MaxValue, -1.5, -0.0,
      0.0, Double.MinPositiveValue, 1.5, Double.MaxValue,
      Double.PositiveInfinity)
    val df = vals.zipWithIndex
      .map { case (v, i) => ("a", v, i.toLong) }.toDF("g", "v", "id")
    val got = df.groupBy("g").agg(expr("topk_agg(v, id, 100)").as("top"))
      .select(col("top")).as[Seq[(Double, Long)]].head()
    // order must equal Spark's ORDER BY v DESC, id ASC (-0.0 ties +0.0 and
    // comes out canonicalized, matching nanSafeCompareDoubles); all other
    // values round-trip bit-exactly
    val expect = vals.zipWithIndex
      .map { case (v, i) => (if (v == 0.0) 0.0 else v, i.toLong) }
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
    assert(got.map { case (v, i) =>
      (java.lang.Double.doubleToRawLongBits(v), i) } ==
      expect.map { case (v, i) =>
        (java.lang.Double.doubleToRawLongBits(v), i) })
  }

  test("double heap agrees with a window sort on random data (property)") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 4000L).map { i =>
      // duplicated values force tie-breaks; mixed magnitudes + signs
      val v = math.pow(10, rnd.nextInt(7) - 3) * (rnd.nextInt(201) - 100)
      ("g" + (i % 11), v, i)
    }
    val df  = rows.toDF("g", "v", "id").repartition(16)
    val got = df.groupBy("g").agg(expr("topk_agg(v, id, 7)").as("top"))
      .select(col("g"), col("top"))
      .as[(String, Seq[(Double, Long)])].collect().toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val expect = grp.map(t => (t._2, t._3))
        .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
        .take(7)
      assert(got(g) == expect, s"group $g")
    }
  }

  test("merge across forced partitions equals the single-partition result") {
    val rows = (1L to 5000L).map(i => ("g" + (i % 7), (i * 2654435761L) % 10007, i))
    val many = run(rows.toDF("g", "v", "id").repartition(16), 5)
    val one  = run(rows.toDF("g", "v", "id").coalesce(1), 5)
    assert(many == one)
    // cross-check one group against a plain sort
    val expect = rows.filter(_._1 == "g3").map(t => (t._2, t._3))
      .sortBy(t => (-t._1, t._2)).take(5)
    assert(many("g3") == expect)
  }
}

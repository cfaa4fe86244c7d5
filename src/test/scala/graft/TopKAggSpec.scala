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

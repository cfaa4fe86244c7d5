package graft

import graft.queries.QueriesAgg
import org.apache.spark.sql.functions._

/** Error-bound assertions for the approximate-sketch query (q_approx_sketch
  * is declared rows-only — HLL++/quantile-sketch estimates are
  * engine-specific by construction — so this spec pins its estimates to the
  * exact values instead of leaving the entry a free pass). */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within HLL++ error of the exact count") {
    val rows = QueriesAgg.qApprox(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approxNd = r.getLong(r.fieldIndex("approx_nd_part"))
      val exactNd  = r.getLong(r.fieldIndex("exact_nd_part"))
      // default rsd 0.05; 3σ margin
      assert(math.abs(approxNd - exactNd) <= math.max(3, 0.15 * exactNd),
        s"${r.getString(0)}: approx=$approxNd exact=$exactNd")
    }
  }

  test("approx_percentile median lands inside the exact p40..p60 band") {
    val bounds = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.40)").as("lo"),
        expr("percentile(l_quantity, 0.60)").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    QueriesAgg.qApprox(spark, dir).collect().foreach { r =>
      val flag = r.getString(0)
      val med  = r.getDouble(r.fieldIndex("approx_med_qty"))
      val (lo, hi) = bounds(flag)
      assert(med >= lo && med <= hi, s"$flag: approx median $med outside [$lo, $hi]")
    }
  }
}

package graft

import graft.queries.QueriesAgg
import org.apache.spark.sql.functions._

/** Error-bound assertions for the approximate-sketch query. The declared
  * q_approx_sketch output is oracle-gated (exact distinct + within-bound
  * booleans the DuckDB side asserts TRUE); this spec pins the underlying
  * estimates numerically via [[QueriesAgg.qApproxRaw]] so a sketch
  * regression is caught with its magnitude, not just a flipped bit. */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within HLL++ error of the exact count") {
    val rows = QueriesAgg.qApproxRaw(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approxNd = r.getLong(r.fieldIndex("approx_nd"))
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
    QueriesAgg.qApproxRaw(spark, dir).collect().foreach { r =>
      val flag = r.getString(0)
      val med  = r.getDouble(r.fieldIndex("amed"))
      val (lo, hi) = bounds(flag)
      assert(med >= lo && med <= hi, s"$flag: approx median $med outside [$lo, $hi]")
    }
  }

  test("declared q_approx_sketch booleans are all true at both fixture SFs") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val rows = QueriesAgg.qApprox(spark, d).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getBoolean(r.fieldIndex("nd_within_bound")), s"$d ${r.getString(0)}")
        assert(r.getBoolean(r.fieldIndex("med_within_bound")), s"$d ${r.getString(0)}")
      }
    }
  }
}

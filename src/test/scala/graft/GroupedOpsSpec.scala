package graft

import graft.ops.GroupedOps
import org.apache.spark.sql.functions._

/** Grouped-aggregation NA contract (SURVEY.md §1.3/§2.2): min_count,
  * skipna, Kleene any/all, all-NA groups — expected values computed
  * independently in plain Scala. */
class GroupedOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val data = kernelData(10000, 50, nullP = 0.3)
  private lazy val df   = data.toDF("pos", "g", "v")

  test("sum/count skipna matches independent computation") {
    val got = df.groupBy("g")
      .agg(sum("v").as("s"), count(col("v")).as("n"))
      .collect().map(r => r.getLong(0) -> (r.get(1), r.getLong(2))).toMap
    val exp = data.groupBy(_._2).map { case (g, rows) =>
      val vs = rows.flatMap(_._3)
      g -> (vs.sum, vs.size.toLong)
    }
    exp.foreach { case (g, (es, en)) =>
      val (gs, gn) = got(g)
      assert(gn == en, s"count group $g")
      assert(approx(gs.asInstanceOf[Double], es), s"sum group $g")
    }
  }

  test("min_count nulls groups below the observation threshold") {
    // reference check_below_mincount (/root/reference/src/groupby.rs:788-843)
    val mc = 150
    val got = df.groupBy("g")
      .agg(GroupedOps.sumMinCount(col("v"), mc).as("s"), count(col("v")).as("n"))
      .collect()
    assert(got.exists(_.isNullAt(1)), "some group should fail min_count")
    got.foreach { r =>
      val belowThreshold = r.getLong(2) < mc
      assert(r.isNullAt(1) == belowThreshold, s"group ${r.getLong(0)}")
    }
  }

  test("min_count <= 0 means unused (reference passes -1)") {
    val got = df.groupBy("g").agg(GroupedOps.sumMinCount(col("v"), -1).as("s"))
      .collect()
    assert(got.forall(!_.isNullAt(1)))
  }

  test("all-NA group aggregates to NULL, not zero") {
    val d2 = Seq((0L, Option.empty[Double]), (0L, None), (1L, Some(1.0)))
      .toDF("g", "v")
    val r = d2.groupBy("g").agg(sum("v").as("s")).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(r(0L) && !r(1L))
  }

  test("any/all: skipna skips NAs; skipna=false is Kleene three-valued") {
    // (values) -> ((any,all) skipna=true, (any,all) skipna=false/Kleene) —
    // reference group_any_all (/root/reference/src/groupby.rs:671-745)
    type OB = Option[Boolean]
    val cases: Seq[(Seq[OB], ((OB, OB), (OB, OB)))] = Seq(
      Seq[OB](Some(true), Some(false)) ->
        ((Some(true), Some(false)), (Some(true), Some(false))),
      Seq[OB](Some(false), None) ->
        ((Some(false), Some(false)), (None, Some(false))),
      Seq[OB](Some(true), None) ->
        ((Some(true), Some(true)), (Some(true), None)),
      Seq[OB](None) ->
        ((None, None), (None, None)),
      Seq[OB](Some(false), Some(false)) ->
        ((Some(false), Some(false)), (Some(false), Some(false))))
    val rows: Seq[(Long, Option[Boolean])] = cases.zipWithIndex.flatMap {
      case ((vs, _), i) => vs.map(v => (i.toLong, v))
    }
    val got = rows.toDF("g", "p").groupBy("g")
      .agg(GroupedOps.any(col("p")).as("any_s"),
        GroupedOps.all(col("p")).as("all_s"),
        GroupedOps.any(col("p"), skipna = false).as("any_k"),
        GroupedOps.all(col("p"), skipna = false).as("all_k"))
      .collect()
      .map { r =>
        def ob(i: Int): OB = if (r.isNullAt(i)) None else Some(r.getBoolean(i))
        r.getLong(0) -> ((ob(1), ob(2)), (ob(3), ob(4)))
      }.toMap
    cases.zipWithIndex.foreach { case ((_, exp), i) =>
      assert(got(i.toLong) == exp, s"case $i")
    }
  }

  test("varDdof / sem match two-pass computation") {
    val byG = data.groupBy(_._2).view.mapValues(_.flatMap(_._3))
    val got = df.groupBy("g").agg(
        GroupedOps.varDdof(col("v"), 2).as("var2"),
        GroupedOps.sem(col("v"), 1).as("sem1"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    byG.foreach { case (g, vs) =>
      val n  = vs.size.toDouble
      val m  = vs.sum / n
      val m2 = vs.map(x => (x - m) * (x - m)).sum
      assert(approx(got(g)._1, m2 / (n - 2)), s"var2 g=$g")
      assert(approx(got(g)._2, math.sqrt(m2 / (n - 1)) / math.sqrt(n)), s"sem g=$g")
    }
  }

  test("skewAdjusted matches pandas-style adjusted skewness; n<3 -> null; constant -> 0") {
    val tiny = Seq(
      (0L, 1.0), (0L, 2.0),                       // n=2 -> null
      (1L, 5.0), (1L, 5.0), (1L, 5.0),            // constant -> 0
      (2L, 1.0), (2L, 2.0), (2L, 4.0), (2L, 8.0)) // skewed
    val got = tiny.toDF("g", "v").groupBy("g")
      .agg(GroupedOps.skewAdjusted(col("v")).as("sk"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(0L).isEmpty)
    assert(got(1L).contains(0.0))
    val vs = Seq(1.0, 2.0, 4.0, 8.0)
    val n  = vs.size.toDouble
    val m  = vs.sum / n
    val m2 = vs.map(x => math.pow(x - m, 2)).sum / n
    val m3 = vs.map(x => math.pow(x - m, 3)).sum / n
    val exp = m3 / math.pow(m2, 1.5) * math.sqrt(n * (n - 1)) / (n - 2)
    assert(approx(got(2L).get, exp))
  }

  test("ohlc = (first, max, min, last) by explicit order") {
    val rows = Seq((0L, 1L, 3.0), (0L, 2L, 9.0), (0L, 3L, 1.0), (0L, 4L, 5.0))
    val aggs = GroupedOps.ohlc(col("v"), col("ord")).map { case (nm, c) => c.as(nm) }
    val got = rows.toDF("g", "ord", "v").groupBy("g")
      .agg(aggs.head, aggs.tail: _*)
      .collect().head
    assert((got.getDouble(1), got.getDouble(2), got.getDouble(3), got.getDouble(4))
      == ((3.0, 9.0, 1.0, 5.0)))
  }

  test("first/last by order skip nulls") {
    val rows = Seq((0L, 1L, None), (0L, 2L, Some(7.0)), (0L, 3L, Some(2.0)), (0L, 4L, None))
    val got = rows.toDF("g", "ord", "v").groupBy("g")
      .agg(GroupedOps.firstByOrd(col("v"), col("ord")).as("f"),
        GroupedOps.lastByOrd(col("v"), col("ord")).as("l"))
      .collect().head
    assert(got.getDouble(1) == 7.0 && got.getDouble(2) == 2.0)
  }
}

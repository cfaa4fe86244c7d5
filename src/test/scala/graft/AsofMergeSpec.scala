package graft

import graft.ops.RelOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The partitioned merge as-of operator (graft.plans.AsofMergeJoin) vs
  * the union-and-scan window formulation it replaced on the default
  * path: the window form is the reference semantics, and the merge exec
  * must match it VALUE-FOR-VALUE on adversarial data — null ordinates,
  * null payloads, string payloads (exercises the sorter's row-buffer
  * reuse: remembered matches must be deep-copied), keys present on only
  * one side, and every direction × tolerance combination. Plus the plan
  * pins: the operator's whole point is two side-local exchanges+sorts
  * and no Window/Union, with the left side REUSED across chained merges
  * (`nearest`), so those shapes are locked here. */
class AsofMergeSpec extends SparkSpec {
  import spark.implicits._

  private def withMerge[A](on: Boolean)(body: => A): A = {
    val key = "spark.graft.asof.merge"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, on.toString)
    try body
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private def run(left: DataFrame, right: DataFrame, dir: String,
                  tol: Option[Long]): Map[Long, Option[String]] =
    RelOps.asofJoin(left, right, Seq("k1", "k2"), "lt", "rt", "pay", "m",
        dir, tol.map(lit(_)))
      .select("lid", "m").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap

  test("merge path == window path on randomized data (all directions, " +
       "tolerance, null ords, null + string payloads, one-sided keys)") {
    val rnd = new scala.util.Random(20260817L)
    for (round <- 1 to 6) {
      val nl = rnd.nextInt(40); val nr = rnd.nextInt(40)
      // ordinates from a SMALL domain force exact ties between left and
      // right (the inclusive boundary) and cross-key collisions; right
      // (key, ord) pairs are deduplicated so the matched payload is
      // deterministic (tied right rows are an any-of-them contract in
      // BOTH formulations — same rule the fixture queries follow)
      def key() = (rnd.nextInt(3).toLong, if (rnd.nextBoolean()) "x" else "y")
      val left = (0 until nl).map { i =>
        val (k1, k2) = key()
        val t: java.lang.Long =
          if (rnd.nextInt(12) == 0) null else rnd.nextInt(30).toLong
        (i.toLong, k1, k2, t)
      }.toDF("lid", "k1", "k2", "lt")
      val right = (0 until nr).map { _ =>
        val (k1, k2) = key()
        val t: java.lang.Long =
          if (rnd.nextInt(12) == 0) null else rnd.nextInt(30).toLong
        (k1, k2, t)
      }.distinct.zipWithIndex.map { case ((k1, k2, t), i) =>
        val pay = if (rnd.nextInt(6) == 0) null else s"p$i-${k1}"
        (k1, k2, t, pay)
      }.groupBy(r => (r._1, r._2, r._3)).map(_._2.head).toSeq
        .toDF("k1", "k2", "rt", "pay")
      for (dir <- Seq("backward", "forward", "nearest");
           tol <- Seq(None, Some(4L))) {
        val merged = withMerge(on = true) { run(left, right, dir, tol) }
        val window = withMerge(on = false) { run(left, right, dir, tol) }
        assert(merged == window,
          s"round=$round dir=$dir tol=$tol:\n merge=$merged\n window=$window")
      }
    }
  }

  test("self-as-of (both sides carved from one scan) resolves and matches") {
    // the q_asof shape: left and right share a parent plan, so the right
    // side's fresh-alias projection is what prevents duplicate-attribute
    // analysis failures — pin it on a literal frame, window path as oracle
    val ev = Seq((1L, 100L, 10L, "a", 1.0), (2L, 100L, 25L, "b", 2.0),
        (3L, 100L, 18L, "a", 3.0), (4L, 200L, 5L, "b", 4.0))
      .toDF("id", "k", "t", "side", "v")
    def q(): Seq[(Long, Option[Double])] =
      RelOps.asofJoin(
          ev.where($"side" === "b").select("id", "k", "t"),
          ev.where($"side" === "a").select($"k", $"t", $"v".as("av")),
          Seq("k"), "t", "t", "av", "m")
        .orderBy("id").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    val merged = withMerge(on = true) { q() }
    assert(merged == withMerge(on = false) { q() })
    // t=25 sees the k=100 'a' rows at 10 and 18 -> 3.0; k=200 has no 'a'
    assert(merged == Seq(2L -> Some(3.0), 4L -> None))
  }

  test("timestamp ordinates with interval tolerance match the window path") {
    val left = Seq((1L, 7L, "2024-01-01 10:00:30"),
        (2L, 7L, "2024-01-01 11:00:00"))
      .toDF("lid", "k", "ts").withColumn("ts", to_timestamp($"ts"))
    val right = Seq((7L, "2024-01-01 10:00:00", 1.5),
        (7L, "2024-01-01 10:59:00", 2.5))
      .toDF("k", "ts", "pay").withColumn("ts", to_timestamp($"ts"))
    def q(): Seq[Option[Double]] =
      RelOps.asofJoin(left, right, Seq("k"), "ts", "ts", "pay", "m",
          tolerance = Some(expr("INTERVAL 45 SECONDS")))
        .orderBy("lid").collect()
        .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3))).toSeq
    val merged = withMerge(on = true) { q() }
    assert(merged == withMerge(on = false) { q() })
    // 10:00:30 is 30s past 10:00:00 (inside 45s); 11:00:00 is 60s past
    // 10:59:00 (outside) — discarded, NOT replaced by the earlier row
    assert(merged == Seq(Some(1.5), None))
  }

  private def count(hay: String, node: String): Int =
    s"[+:]- $node[ \\[]".r.findAllIn(hay).size

  test("plan: q_asof is one AsofMergeJoin over two side-local " +
       "exchanges+sorts — no Window, no Union") {
    val p = SparkEntry.queries("q_asof")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(count(p, "AsofMergeJoin") == 1, p)
    assert(count(p, "Exchange") == 2, p)
    assert(count(p, "Sort") == 2, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Union"), p)
    // filters still reach the scans through the custom node's children
    assert(p.contains("PushedFilters: [IsNotNull(event_type), " +
      "EqualTo(event_type,purchase)]"), p)
  }

  test("plan: q_asof_dir chains three merges with the left side's " +
       "exchange and sort REUSED (4 exchanges, not 6)") {
    // forward merge + nearest's backward/forward pair: the left relation
    // is exchanged+sorted ONCE (AsofMergeJoinExec preserves left
    // partitioning/ordering), each right instance pays its own — plus the
    // query's final presentational orderBy
    val p = SparkEntry.queries("q_asof_dir")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(count(p, "AsofMergeJoin") == 3, p)
    assert(count(p, "Exchange") == 5, p) // 1 left + 3 right + 1 final sort
    assert(!p.contains("Window"), p)
  }

  test("plan: spark.graft.asof.merge=false restores the window formulation") {
    val p = withMerge(on = false) {
      SparkEntry.queries("q_asof")(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
    }
    assert(count(p, "AsofMergeJoin") == 0, p)
    assert(p.contains("Window"), p)
    assert(p.contains("Union"), p)
  }
}

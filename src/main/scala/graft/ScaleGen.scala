package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: deterministic scale-replication of a fixture SF directory —
  * `ScaleGen <srcDir> <dstDir> <factor>` replicates every table `factor`
  * times with consistent foreign-key offsets (replica r shifts each key
  * family by r·10^⌈log10(max+1)⌉, so joins stay referentially intact and
  * replica key ranges never collide). Dims (nation/region) are copied
  * unchanged; event timestamps are kept, so time-windowed queries see
  * `factor`× the rows per window — the density direction of a scale-up.
  * Used to measure the sf0.1→sf1 scaling slope recorded in SCALE.md.
  */
object ScaleGen {

  /** Key columns to offset per table, grouped by key family so the same
    * family gets the same offset everywhere it appears. */
  private val keyFamilies: Map[String, Seq[(String, String)]] = Map(
    "lineitem"   -> Seq("order" -> "l_orderkey", "part" -> "l_partkey",
                        "supp" -> "l_suppkey"),
    "orders"     -> Seq("order" -> "o_orderkey", "cust" -> "o_custkey"),
    "customer"   -> Seq("cust" -> "c_custkey"),
    "supplier"   -> Seq("supp" -> "s_suppkey"),
    "part"       -> Seq("part" -> "p_partkey"),
    "nation"     -> Seq(),
    "region"     -> Seq(),
    "events"     -> Seq("event" -> "event_id", "user" -> "user_id"),
    "documents"  -> Seq("doc" -> "doc_id"),
    "embeddings" -> Seq("vec" -> "vec_id"))

  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args.take(3)
    val factor = factorS.toInt
    // optional 4th arg: comma-separated table subset (e.g. a lineitem-only
    // sf100 probe when disk can't hold the full fixture). Key-family
    // offsets are still computed over ALL tables present in src, so the
    // subset's keys line up with a hypothetical full generation.
    val only: Option[Set[String]] =
      args.lift(3).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // events.ts must stay a raw ns-long through the round-trip
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    // one offset per key family: the smallest power of 10 above every
    // occurrence of the family across tables (deterministic, collision-free)
    val familyMax = keyFamilies.toSeq.flatMap { case (t, fams) =>
      if (fams.isEmpty) Seq.empty
      else {
        val df = spark.read.parquet(s"$src/$t.parquet")
        val maxes = df.agg(fams.map { case (_, c) => max(col(c)).as(c) }.head,
          fams.map { case (_, c) => max(col(c)).as(c) }.tail: _*).head()
        fams.zipWithIndex.map { case ((fam, _), i) => fam -> maxes.getLong(i) }
      }
    }.groupBy(_._1).map { case (fam, xs) =>
      val m = xs.map(_._2).max
      fam -> math.pow(10, math.ceil(math.log10(m + 2.0))).toLong
    }

    keyFamilies.filter { case (t, _) => only.forall(_.contains(t)) }
      .foreach { case (t, fams) =>
      val base = spark.read.parquet(s"$src/$t.parquet")
      val out: DataFrame =
        if (fams.isEmpty || factor == 1) base
        else {
          val reps = spark.range(factor).select(col("id").as("_rep"))
          // Repartition the SMALL base BEFORE the replicating crossJoin,
          // not the replicated output after it: the pre-shuffle moves
          // `rows` rows, the old post-shuffle moved `rows × factor` (at
          // ×1000 that was a 600M-row shuffle feeding from ONE generator
          // task, since the 11 MB source parquet is a single split).
          // Output file count is the same either way — many moderate
          // files, not one giant one: a single-file table caps scan
          // parallelism at size/maxPartitionBytes; real lake layouts are
          // many files.
          fams.foldLeft(base.repartition(32).crossJoin(reps)) {
            case (df, (fam, c)) =>
              df.withColumn(c, col(c) + col("_rep") * familyMax(fam))
          }.drop("_rep")
        }
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scalegen] $t x$factor -> $dst/$t.parquet")
    }
    spark.stop()
  }
}

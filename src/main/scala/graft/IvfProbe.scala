package graft

import graft.ops.SimilarityOps
import org.apache.spark.sql.functions._

/** Dev tool: sweep IVF (nlist via centroidMod, Lloyd iters, nprobe) at a
  * fixture SF and print mean recall@K vs exact brute force + the candidate
  * fraction each config scans — the tuning loop behind the constants in
  * QueriesSim (VERDICT r7 item 7). */
object IvfProbe {

  /** Deterministic mixture-of-Gaussians embedding fixture (r10 verdict
    * item 8): `clusters` centers drawn uniform in [−1,1]^dims from a
    * fixed per-cluster seed, each point = its center + uniform noise of
    * half-width `spread` from a fixed per-point seed. Gives the recall
    * sweep a CLUSTERABLE contrast to the near-uniform driver fixture
    * (IVF's worst case — see the IvfMod doc in QueriesSim): on separable
    * mixtures IVF should reach high recall at low candidate fraction,
    * and this probe records whether ours does. */
  def clusteredEmbeddings(spark: org.apache.spark.sql.SparkSession,
                          n: Int, dims: Int, clusters: Int,
                          spread: Double): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val c = (id % clusters).toInt
      val rc = new java.util.Random(1234L + c)
      val center = Array.fill(dims)(rc.nextDouble() * 2 - 1)
      val rp = new java.util.Random(987654321L + id)
      val v = center.map(x =>
        (x + spread * (rp.nextDouble() * 2 - 1)).toFloat)
      (id, v)
    }.toDF("vec_id", "embedding")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val K = 3
    val emb = (args.headOption match {
      case Some("clustered") =>
        val n = args.lift(1).map(_.toInt).getOrElse(500)
        val cl = args.lift(2).map(_.toInt).getOrElse(13)
        val sp = args.lift(3).map(_.toDouble).getOrElse(0.2)
        println(s"[ivfprobe] clustered fixture: n=$n dims=64 clusters=$cl spread=$sp")
        clusteredEmbeddings(spark, n, 64, cl, sp)
      case _ => Tables.embeddings(spark, sfDir)
    }).localCheckpoint(true)
    val n = emb.count()
    val qs = emb.where(col("vec_id") % 20 === 0).localCheckpoint(true)
    val exact = SimilarityOps.bruteForceTopK(qs, emb, "vec_id", "embedding", K)
      .select("query_id", "neighbor_id").localCheckpoint(true)
    val nq = qs.count()

    for (mod <- Seq(40, 50); iters <- Seq(4, 6, 8); nprobe <- Seq(2, 3)) {
      val ap = SimilarityOps.ivfTopKTrained(
        qs, emb, "vec_id", "embedding", K, mod, 7, iters, nprobe)
      val hits = exact.join(ap.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      val recall = hits.toDouble / (nq * K)
      // candidate fraction ~= nprobe / nlist (uniform lists); report the
      // actual trained list count since Lloyd can drop empty clusters
      val cb = SimilarityOps.trainCodebook(emb, "vec_id", "embedding", mod, 7, iters)
      val nlist = cb.count()
      println(f"mod=$mod%3d iters=$iters nprobe=$nprobe  nlist=$nlist%3d  frac~${nprobe.toDouble / nlist}%.3f  recall@$K=$recall%.3f")
    }
    spark.stop()
  }
}

package graft

import graft.ops.SimilarityOps
import org.apache.spark.sql.functions._

/** Dev tool: sweep IVF (nlist via centroidMod, Lloyd iters, nprobe) at a
  * fixture SF and print mean recall@K vs exact brute force + the candidate
  * fraction each config scans — the tuning loop behind the constants in
  * QueriesSim (VERDICT r7 item 7). */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val K = 3
    val emb = Tables.embeddings(spark, sfDir).localCheckpoint(true)
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

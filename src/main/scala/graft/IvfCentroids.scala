package graft

import org.apache.spark.sql.functions._

/** Dump the ENGINE-TRAINED IVF codebook for a scale factor to parquet —
  * the input tools/check_ivf_scale.py feeds DuckDB so the sf1+ sweep can
  * verify q_ivf_recall WITHOUT replaying Lloyd training relationally
  * (r11 verdict item 5: the training-replay oracle builds ~4B
  * intermediate rows at sf1 and DNFs; single-step training equivalence
  * is q_kmeans_iter's oracle, so the sweep only needs assignment +
  * probe + recall over the trained centroids as INPUT). The codebook is
  * exact integer arithmetic end to end ([[graft.ops.SimilarityOps
  * .trainCodebook]]), so handing it across engines loses nothing.
  *
  * Usage: runMain graft.IvfCentroids SF_DIR OUT_DIR
  * writes OUT_DIR/ivf_centroids.parquet with (cid: long,
  * centv: array<bigint>).
  */
object IvfCentroids {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      import graft.queries.QueriesSim.{IvfMod, IvfRem, KmIters}
      graft.ops.SimilarityOps.trainCodebook(
          Tables.embeddings(spark, sfDir), "vec_id", "embedding",
          IvfMod, IvfRem, KmIters)
        .select(col("cid"), col("centv"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/ivf_centroids.parquet")
    } finally spark.stop()
  }
}

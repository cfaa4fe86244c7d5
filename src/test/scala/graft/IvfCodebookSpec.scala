package graft

import graft.ops.SimilarityOps
import graft.queries.QueriesSim
import org.apache.spark.sql.functions._

/** Trained-IVF codebook invariants (VERDICT r6 item 3): Lloyd training is
  * deterministic under repartitioning, the trained codebook beats the raw
  * subsample seeds on recall@K, and the search plan stays a broadcast +
  * posting-list join (no cartesian products).
  */
class IvfCodebookSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, dir)

  test("trainCodebook is deterministic under any input partitioning") {
    def book(df: org.apache.spark.sql.DataFrame) =
      SimilarityOps.trainCodebook(df, "vec_id", "embedding",
          QueriesSim.IvfMod, QueriesSim.IvfRem, QueriesSim.KmIters)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val a = book(emb.repartition(17))
    val b = book(emb.coalesce(1))
    assert(a == b)
    assert(a.nonEmpty && a.values.forall(_.length == 64))
  }

  test("Lloyd training moves the codebook off the seeds and keeps ids") {
    val seeds = emb.where(col("vec_id") % QueriesSim.IvfMod === QueriesSim.IvfRem)
      .select(col("vec_id"), SimilarityOps.quantize(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val trained = SimilarityOps.trainCodebook(emb, "vec_id", "embedding",
        QueriesSim.IvfMod, QueriesSim.IvfRem, QueriesSim.KmIters)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(trained.keySet.subsetOf(seeds.keySet))
    // at least one centroid actually moved (the training did work)
    assert(trained.exists { case (cid, v) => seeds(cid) != v })
  }

  test("trained codebook recall@K >= subsample-seed recall@K (mean over queries)") {
    val rec = graft.queries.QueriesSim.qIvfRecall(spark, dir)
      .agg(avg("recall_seed").as("seed"), avg("recall_trained").as("trained"))
      .collect().head
    val (seed, trained) = (rec.getDouble(0), rec.getDouble(1))
    info(f"mean recall@${QueriesSim.K}: seed=$seed%.4f trained=$trained%.4f")
    assert(trained >= seed,
      s"training made recall WORSE: seed=$seed trained=$trained")
  }

  test("trained-IVF search plans without a cartesian product") {
    val plan = graft.queries.QueriesSim.qEmbedIvf(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}

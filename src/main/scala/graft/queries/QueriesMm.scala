package graft.queries

import graft.Tables
import graft.multimodal.MultimodalOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pack F — multimodal column plumbing (north-star extension; no reference
  * analog). The payload decode itself is a loudly-declared stub
  * (MultimodalOps.fakeDecode — this container has no codec libraries); the
  * oracle-checked part is the pure-Catalyst side: frame-sampling a video
  * duration into (media_id, ts_ms, frame_idx) rows via `explode(sequence)`
  * — the plan shape a real frame extractor's batch decode would consume.
  * Fixture adapter: documents.text bytes stand in for media payloads, so
  * duration_ms = length(text)·40 (MultimodalOps.fromStrings).
  */
object QueriesMm {

  val FrameEveryMs = 500L

  /** Frame sampling: one row per 500 ms of media duration. */
  def qFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val media = MultimodalOps.fromStrings(spark,
      Tables.documents(spark, dir), "doc_id", "text").toDF()
    MultimodalOps.frameSamplePlan(media, FrameEveryMs)
      .select("media_id", "ts_ms", "frame_idx")
      .orderBy("media_id", "ts_ms")
  }

  val qFrameSampleOracle: String = s"""
    WITH m AS (SELECT doc_id media_id, length(text) * 40 duration_ms
               FROM documents),
    f AS (SELECT media_id,
                 unnest(generate_series(0, greatest(duration_ms - 1, 0),
                                        $FrameEveryMs)) ts_ms
          FROM m)
    SELECT media_id, ts_ms, ts_ms // $FrameEveryMs AS frame_idx
    FROM f ORDER BY media_id, ts_ms"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_frame_sample", qFrameSample, Some(qFrameSampleOracle)))
}

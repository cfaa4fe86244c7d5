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

  val PatchPx = 16

  /** ViT-style patch grid: one row per 16×16 tile with edge clamping. */
  def qPatchGrid(spark: SparkSession, dir: String): DataFrame = {
    val media = MultimodalOps.fromStrings(spark,
      Tables.documents(spark, dir), "doc_id", "text").toDF()
    MultimodalOps.patchGridPlan(media, PatchPx)
      .orderBy("media_id", "py", "px")
  }

  val qPatchGridOracle: String = s"""
    WITH m AS (SELECT doc_id media_id, length(text) % 640 w, length(text) % 480 h
               FROM documents
               WHERE length(text) % 640 > 0 AND length(text) % 480 > 0),
    g AS (SELECT media_id, w, h,
                 unnest(generate_series(0, (w + ${PatchPx - 1}) // $PatchPx - 1)) px
          FROM m),
    g2 AS (SELECT media_id, w, h, px,
                  unnest(generate_series(0, (h + ${PatchPx - 1}) // $PatchPx - 1)) py
           FROM g)
    SELECT media_id, CAST(px AS BIGINT) px, CAST(py AS BIGINT) py,
           CAST(px * $PatchPx AS BIGINT) x0, CAST(py * $PatchPx AS BIGINT) y0,
           CAST(least($PatchPx, w - px * $PatchPx) AS BIGINT) pw,
           CAST(least($PatchPx, h - py * $PatchPx) AS BIGINT) ph
    FROM g2 ORDER BY media_id, py, px"""

  val RateHz     = 16000L
  val WinSamples = 400L  // 25 ms @ 16 kHz
  val HopSamples = 160L  // 10 ms hop

  /** Audio feature-window plan: 25 ms windows every 10 ms at 16 kHz
    * (sample-exact integral math), tail window clamped. */
  def qAudioWindows(spark: SparkSession, dir: String): DataFrame = {
    val media = MultimodalOps.fromStrings(spark,
      Tables.documents(spark, dir), "doc_id", "text").toDF()
    MultimodalOps.audioWindowPlan(media, RateHz, WinSamples, HopSamples)
      // per-media digest keeps the compare row count sane (the plan emits
      // ~100 windows/sec of audio); exact integer rollup of the window set
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_windows"),
        max("win_idx").as("last_idx"),
        sum("win_len").as("sum_len"),
        min("win_len").as("min_len"),
        max("start_s").as("last_start"))
      .orderBy("media_id")
  }

  val qAudioWindowsOracle: String = s"""
    WITH m AS (SELECT doc_id media_id,
                      (length(text) * 40) * $RateHz // 1000 n_samples
               FROM documents),
    w AS (SELECT media_id, n_samples,
                 unnest(generate_series(0, n_samples - 1, $HopSamples)) start_s
          FROM m WHERE n_samples > 0)
    SELECT media_id, count(*) n_windows,
           CAST(max(start_s // $HopSamples) AS BIGINT) last_idx,
           CAST(sum(least($WinSamples, n_samples - start_s)) AS BIGINT) sum_len,
           CAST(min(least($WinSamples, n_samples - start_s)) AS BIGINT) min_len,
           CAST(max(start_s) AS BIGINT) last_start
    FROM w GROUP BY media_id ORDER BY media_id"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_frame_sample", qFrameSample, Some(qFrameSampleOracle)),
    QueryDef("q_patch_grid", qPatchGrid, Some(qPatchGridOracle)),
    QueryDef("q_audio_windows", qAudioWindows, Some(qAudioWindowsOracle)))
}

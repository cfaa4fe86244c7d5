package graft.queries

import graft.Tables
import graft.multimodal.MultimodalOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pack F — multimodal column plumbing (north-star extension; no reference
  * analog). The IMAGE codec is real (`javax.imageio` PNG, in the JDK):
  * q_image_meta encodes a deterministic raster per document and decodes it
  * back (javax.imageio PNG), oracle-checking the exact pixel sums;
  * q_audio_meta does the same for audio (javax.sound.sampled WAV/PCM),
  * oracle-checking exact amplitude sums. Video decode falls back to
  * codec-free byte featurization (no container codec in the JDK); its
  * oracle-checked parts are the pure-Catalyst plans: frame-sampling,
  * patch grids and audio windows via `explode(sequence)` — the work-lists
  * a production decoder's batch pass would consume. Fixture adapter:
  * documents.text bytes stand in for video payloads, so
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

  /** REAL image codec round-trip (javax.imageio PNG, in the JDK): render a
    * deterministic raster per doc_id, encode to PNG bytes, DECODE the bytes
    * back, and emit exact per-channel pixel sums. PNG is lossless, so the
    * DuckDB oracle recomputes the sums from the closed-form pixel function
    * — any codec breakage (wrong channel order, row stride, color space)
    * hash-mismatches. The decode is the batch-shaped mapPartitions pass a
    * production FFmpeg/JPEG codec would slot into. */
  def qImageMeta(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.decodeImageMeta(
        MultimodalOps.encodePngImages(spark,
          Tables.documents(spark, dir), "doc_id"))
      .toDF()
      .orderBy("media_id")

  val qImageMetaOracle: String = """
    WITH dims AS (SELECT doc_id media_id,
                         4 + doc_id % 13 w, 4 + doc_id % 9 h
                  FROM documents),
    px AS (SELECT media_id, w, h, unnest(range(0, w)) x FROM dims),
    pxy AS (SELECT media_id, w, h, x, unnest(range(0, h)) y FROM px)
    SELECT media_id,
           CAST(max(w) AS BIGINT) width, CAST(max(h) AS BIGINT) height,
           count(*) n_px,
           CAST(sum((media_id*7 + x*3 + y*11) % 256) AS BIGINT) sum_r,
           CAST(sum((media_id*5 + x*13 + y*7) % 256) AS BIGINT) sum_g,
           CAST(sum((media_id*3 + x*5 + y*17) % 256) AS BIGINT) sum_b
    FROM pxy GROUP BY media_id ORDER BY media_id"""

  /** REAL decode + resize (the brief's named multimodal op): every image
    * decodes through the codec and resamples to a fixed 16×16 thumbnail
    * by nearest-neighbor floor mapping — pure integer index arithmetic,
    * so the oracle recomputes the resized channel sums from the
    * closed-form pixel function. See
    * [[graft.multimodal.MultimodalOps.decodeResizeImages]]. */
  def qImageResize(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.decodeResizeImages(
        MultimodalOps.encodePngImages(spark,
          Tables.documents(spark, dir), "doc_id"), 16, 16)
      .toDF()
      .orderBy("media_id")

  val qImageResizeOracle: String = """
    WITH dims AS (SELECT doc_id media_id,
                         4 + doc_id % 13 w, 4 + doc_id % 9 h
                  FROM documents),
    gx AS (SELECT media_id, w, h, unnest(range(0, 16)) xx FROM dims),
    g AS (SELECT media_id, w, h, xx, unnest(range(0, 16)) yy FROM gx),
    m AS (SELECT media_id, w, h,
                 (xx * w) // 16 sx, (yy * h) // 16 sy FROM g)
    SELECT media_id,
           CAST(max(w) AS BIGINT) src_w, CAST(max(h) AS BIGINT) src_h,
           CAST(16 AS BIGINT) out_w, CAST(16 AS BIGINT) out_h,
           CAST(sum((media_id*7 + sx*3 + sy*11) % 256) AS BIGINT) sum_r,
           CAST(sum((media_id*5 + sx*13 + sy*7) % 256) AS BIGINT) sum_g,
           CAST(sum((media_id*3 + sx*5 + sy*17) % 256) AS BIGINT) sum_b
    FROM m GROUP BY media_id ORDER BY media_id"""

  /** REAL audio codec round-trip (javax.sound.sampled WAV/PCM, in the
    * JDK): render a deterministic 16-bit PCM signal per doc_id, encode it
    * into a WAV container, DECODE the container back through the codec,
    * and emit the header-read sample rate plus exact amplitude sums. PCM
    * is lossless, so the DuckDB oracle recomputes the sums from the
    * closed-form signal — wrong endianness, header offset, or sign
    * convention hash-mismatches. Mirrors q_image_meta. */
  def qAudioMeta(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.decodeAudioMeta(
        MultimodalOps.encodeWavAudio(spark,
          Tables.documents(spark, dir), "doc_id"))
      .toDF()
      .orderBy("media_id")

  val qAudioMetaOracle: String = s"""
    WITH m AS (SELECT doc_id media_id,
                      CAST(200 + doc_id % 301 AS BIGINT) n
               FROM documents),
    s AS (SELECT media_id, n, unnest(range(0, n)) i FROM m),
    amp AS (SELECT media_id, n,
                   CAST((media_id*31 + i*17) % 65536 - 32768 AS BIGINT) a
            FROM s)
    SELECT media_id,
           CAST(${MultimodalOps.AudioRateHz} AS BIGINT) sample_rate,
           max(n) n_samples,
           CAST(sum(a) AS BIGINT) sum_amp,
           CAST(sum(abs(a)) AS BIGINT) sum_abs
    FROM amp GROUP BY media_id ORDER BY media_id"""

  /** REAL decode + resample for audio (the rate-normalization analog of
    * q_image_resize): every WAV decodes through the codec and
    * downsamples 16 kHz → 8 kHz by integer decimation — pure index
    * arithmetic, so the oracle recomputes the decimated sums from the
    * closed-form signal. See
    * [[graft.multimodal.MultimodalOps.decodeResampleAudio]]. */
  def qAudioResample(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.decodeResampleAudio(
        MultimodalOps.encodeWavAudio(spark,
          Tables.documents(spark, dir), "doc_id"), 2)
      .toDF()
      .orderBy("media_id")

  val qAudioResampleOracle: String = s"""
    WITH m AS (SELECT doc_id media_id,
                      CAST(200 + doc_id % 301 AS BIGINT) n
               FROM documents),
    s AS (SELECT media_id, n, unnest(range(0, n)) i FROM m),
    d AS (SELECT media_id,
                 CAST((media_id*31 + i*17) % 65536 - 32768 AS BIGINT) a
          FROM s WHERE i % 2 = 0)
    SELECT media_id,
           CAST(${MultimodalOps.AudioRateHz / 2} AS BIGINT) sample_rate,
           count(*) n_samples,
           CAST(sum(a) AS BIGINT) sum_amp,
           CAST(sum(abs(a)) AS BIGINT) sum_abs
    FROM d GROUP BY media_id ORDER BY media_id"""

  /** REAL video-container round-trip (multi-frame GIF via javax.imageio,
    * in the JDK): render deterministic grayscale frames per doc_id, write
    * them into ONE animated-GIF container, DECODE the container back
    * frame by frame, and emit one row per frame with exact pixel sums.
    * The identity gray palette makes GIF lossless here, so the DuckDB
    * oracle recomputes every frame sum from the closed-form pixel
    * function — a dropped/duplicated frame, wrong frame order, or
    * palette corruption hash-mismatches. This closes the last multimodal
    * gap: all three fixture kinds (image/audio/video) now decode through
    * real JDK container codecs in the same batch-shaped pass an FFmpeg
    * MP4 arm would use. */
  def qVideoFrames(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.decodeVideoFrames(
        MultimodalOps.encodeGifVideo(spark,
          Tables.documents(spark, dir), "doc_id"))
      .toDF()
      .orderBy("media_id", "frame_idx")

  val qVideoFramesOracle: String = """
    WITH m AS (SELECT doc_id media_id,
                      CAST(2 + doc_id % 7 AS BIGINT) nf,
                      CAST(8 + doc_id % 5 AS BIGINT) w,
                      CAST(8 + doc_id % 4 AS BIGINT) h
               FROM documents),
    fr AS (SELECT media_id, w, h, unnest(range(0, nf)) f FROM m),
    px AS (SELECT media_id, f, w, h, unnest(range(0, w)) x FROM fr),
    p AS (SELECT media_id, f, w, h, x, unnest(range(0, h)) y FROM px)
    SELECT media_id, CAST(f AS BIGINT) frame_idx,
           CAST(max(w) AS BIGINT) width, CAST(max(h) AS BIGINT) height,
           CAST(sum((media_id*7 + f*13 + x*3 + y*5) % 256) AS BIGINT) sum_gray
    FROM p GROUP BY media_id, f ORDER BY media_id, frame_idx"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_frame_sample", qFrameSample, Some(qFrameSampleOracle)),
    QueryDef("q_patch_grid", qPatchGrid, Some(qPatchGridOracle)),
    QueryDef("q_audio_windows", qAudioWindows, Some(qAudioWindowsOracle)),
    QueryDef("q_image_meta", qImageMeta, Some(qImageMetaOracle)),
    QueryDef("q_image_resize", qImageResize, Some(qImageResizeOracle)),
    QueryDef("q_audio_meta", qAudioMeta, Some(qAudioMetaOracle)),
    QueryDef("q_audio_resample", qAudioResample, Some(qAudioResampleOracle)),
    QueryDef("q_video_frames", qVideoFrames, Some(qVideoFramesOracle)))
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed row for an opaque media payload: the multimodal column model
  * (north-star extension). Real pipelines put image/audio/video bytes in
  * `payload` (BinaryType) with typed metadata alongside; all Spark-side
  * plumbing (schema, partitioning, batch-shaped decode) is real, only the
  * codec is stubbed (this container has no image/audio libraries). */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                    width: Int, height: Int, duration_ms: Long)

/** Decoded feature vector for a media row. */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                         feature: Array[Float])

object MultimodalOps {

  /** STUB CODEC — deterministic fake "decode": derives a feature vector
    * from payload bytes. Replace with a real decoder (JavaCPP/FFmpeg,
    * ImageIO) in production; the signature and batch shape are the real
    * contract. */
  private def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Batch-shaped decode: one partition = one iterator pass (the Scala
    * analog of a pandas `mapInPandas` UDF) — codecs initialize once per
    * partition, not per row, and rows stream through without
    * materializing the partition. */
  def decodeFeatures(ds: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition codec init would go here
      rows.map(r => MediaFeatures(r.media_id, r.kind, r.payload.length,
        fakeDecode(r.payload, dim)))
    }
  }

  /** Frame sampling plan for video payloads: every `everyMs` milliseconds of
    * duration yields one (media_id, frame_idx, ts_ms) row — the explode is
    * pure Catalyst (no UDF); actual frame extraction would decode in a
    * later batch-shaped pass like [[decodeFeatures]]. */
  def frameSamplePlan(df: DataFrame, everyMs: Long): DataFrame =
    df.select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L), greatest(col("duration_ms") - 1, lit(0L)),
          lit(everyMs))).as("ts_ms"))
      .withColumn("frame_idx", (col("ts_ms") / everyMs).cast("long"))

  /** Audio-window plan: sample-accurate fixed windows with hop (the
    * Whisper/wav2vec front-end shape — e.g. 25 ms windows every 10 ms at
    * 16 kHz). `n_samples = duration_ms·rate div 1000` (integral — no
    * float sample math), one row per window start, the tail window
    * clamped to the stream end. Pure Catalyst explode; the PCM slice
    * itself would decode in a batch-shaped pass like [[decodeFeatures]]. */
  def audioWindowPlan(df: DataFrame, rateHz: Long, winSamples: Long,
                      hopSamples: Long): DataFrame = {
    val nSamples = expr(s"duration_ms * $rateHz div 1000")
    df.select(col("media_id"), nSamples.as("n_samples"))
      .where(col("n_samples") > 0)
      .withColumn("start_s",
        explode(sequence(lit(0L), col("n_samples") - 1, lit(hopSamples))))
      .select(col("media_id"), col("n_samples"),
        expr(s"start_s div $hopSamples").as("win_idx"),
        col("start_s"),
        least(lit(winSamples), col("n_samples") - col("start_s")).as("win_len"))
  }

  /** Patch-grid plan for image payloads: one row per `patch`×`patch` tile
    * of the (width, height) raster — the ViT/CLIP patch-extraction
    * plumbing (image → 16×16 patch sequence) as pure Catalyst: a 2-D
    * `explode(sequence)` over the tile grid, edge tiles clamped to the
    * image border. The actual pixel crop would decode in a later
    * batch-shaped pass like [[decodeFeatures]]; this plan gives it the
    * (media, tile, offsets, clamped dims) work-list without any UDF.
    * Zero-area images yield zero rows. */
  def patchGridPlan(df: DataFrame, patch: Int): DataFrame = {
    val nx = expr(s"(width + ${patch - 1}) div $patch")
    val ny = expr(s"(height + ${patch - 1}) div $patch")
    df.select(col("media_id"), col("width"), col("height"))
      .where(col("width") > 0 && col("height") > 0)
      .withColumn("px", explode(sequence(lit(0), (nx - 1).cast("int"))))
      .withColumn("py", explode(sequence(lit(0), (ny - 1).cast("int"))))
      .select(col("media_id"),
        col("px").cast("long").as("px"), col("py").cast("long").as("py"),
        (col("px") * patch).cast("long").as("x0"),
        (col("py") * patch).cast("long").as("y0"),
        least(lit(patch), col("width") - col("px") * patch).cast("long").as("pw"),
        least(lit(patch), col("height") - col("py") * patch).cast("long").as("ph"))
  }

  /** Build a MediaRow dataset from any table with an id + string column —
    * fixture adapter used by specs (documents.text bytes stand in for real
    * media payloads). */
  def fromStrings(spark: SparkSession, df: DataFrame, idCol: String,
                  strCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        lit("image").as("kind"),
        encode(col(strCol), "UTF-8").as("payload"),
        (length(col(strCol)) % 640).cast("int").as("width"),
        (length(col(strCol)) % 480).cast("int").as("height"),
        (length(col(strCol)) * 40L).cast("long").as("duration_ms"))
      .as[MediaRow]
  }
}

package graft

import graft.multimodal.MultimodalOps
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: binary payload + typed metadata, batch-shaped
  * decode, frame-sample explode. All three codecs are real and in the JDK:
  * `javax.imageio` PNG (images), `javax.sound.sampled` WAV/PCM (audio),
  * multi-frame GIF (video container) — each round-tripped against
  * closed-form pixel/sample sums; byte featurization remains the
  * codec-free fallback arm. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = MultimodalOps.fromStrings(spark,
    Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")

  test("PNG encode -> imageio decode round-trips exact pixel sums") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val encoded = MultimodalOps.encodePngImages(spark, docs, "doc_id")
    // payloads are genuine PNG files (magic bytes)
    val p = encoded.head().payload
    assert((p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
    val got = MultimodalOps.decodeImageMeta(encoded).collect()
    assert(got.length == 50)
    got.foreach { m =>
      val id = m.media_id
      val (w, h) = (MultimodalOps.synthW(id), MultimodalOps.synthH(id))
      assert(m.width == w && m.height == h && m.n_px == w.toLong * h)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        sr += MultimodalOps.synthR(id, x, y)
        sg += MultimodalOps.synthG(id, x, y)
        sb += MultimodalOps.synthB(id, x, y)
      }
      assert(m.sum_r == sr && m.sum_g == sg && m.sum_b == sb,
        s"channel sums diverged for media $id")
    }
  }

  test("decodeResizeImages nearest-neighbor floor mapping is exact") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(30)
    val encoded = MultimodalOps.encodePngImages(spark, docs, "doc_id")
    val (outW, outH) = (16, 16)
    val got = MultimodalOps.decodeResizeImages(encoded, outW, outH).collect()
    assert(got.length == 30)
    got.foreach { m =>
      val id = m.media_id
      val (w, h) = (MultimodalOps.synthW(id), MultimodalOps.synthH(id))
      assert(m.src_w == w && m.src_h == h &&
        m.out_w == outW && m.out_h == outH)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (yy <- 0 until outH; xx <- 0 until outW) {
        val (sx, sy) = (xx * w / outW, yy * h / outH)
        sr += MultimodalOps.synthR(id, sx, sy)
        sg += MultimodalOps.synthG(id, sx, sy)
        sb += MultimodalOps.synthB(id, sx, sy)
      }
      assert(m.sum_r == sr && m.sum_g == sg && m.sum_b == sb,
        s"resized channel sums diverged for media $id")
    }
  }

  test("WAV encode -> javax.sound decode round-trips exact amplitude sums") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val encoded = MultimodalOps.encodeWavAudio(spark, docs, "doc_id")
    // payloads are genuine RIFF/WAVE containers (magic bytes)
    val p = encoded.head().payload
    assert(new String(p.slice(0, 4), "US-ASCII") == "RIFF" &&
      new String(p.slice(8, 12), "US-ASCII") == "WAVE")
    val got = MultimodalOps.decodeAudioMeta(encoded).collect()
    assert(got.length == 50)
    got.foreach { m =>
      val id = m.media_id
      val n = MultimodalOps.synthNSamples(id)
      assert(m.sample_rate == MultimodalOps.AudioRateHz && m.n_samples == n)
      var (s, sa) = (0L, 0L)
      for (i <- 0 until n) {
        val a = MultimodalOps.synthAmp(id, i)
        s += a; sa += math.abs(a)
      }
      assert(m.sum_amp == s && m.sum_abs == sa,
        s"amplitude sums diverged for media $id")
    }
  }

  test("GIF encode -> imageio per-frame decode round-trips exact gray sums") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val encoded = MultimodalOps.encodeGifVideo(spark, docs, "doc_id")
    // payloads are genuine GIF containers (magic bytes)
    val p = encoded.head().payload
    assert(new String(p.slice(0, 6), "US-ASCII").startsWith("GIF8"))
    val got = MultimodalOps.decodeVideoFrames(encoded).collect()
      .map(f => (f.media_id, f.frame_idx) -> f).toMap
    val ids = docs.select(col("doc_id").cast("long")).collect().map(_.getLong(0))
    // every (clip, frame) present exactly once, dims + sums exact
    assert(got.size == ids.map(MultimodalOps.synthNFrames(_).toLong).sum)
    ids.foreach { id =>
      val (nf, w, h) =
        (MultimodalOps.synthNFrames(id), MultimodalOps.synthVW(id),
          MultimodalOps.synthVH(id))
      for (f <- 0 until nf) {
        val m = got((id, f.toLong))
        assert(m.width == w && m.height == h)
        var s = 0L
        for (y <- 0 until h; x <- 0 until w)
          s += MultimodalOps.synthGray(id, f, x, y)
        assert(m.sum_gray == s, s"gray sum diverged for media $id frame $f")
      }
    }
  }

  test("decodeVideoFrames fails loudly on a non-GIF payload") {
    import spark.implicits._
    val bogus = Seq(graft.multimodal.MediaRow(
      7L, "video", "not a gif".getBytes("UTF-8"), 0, 0, 0L)).toDS()
    val e = intercept[Exception] {
      MultimodalOps.decodeVideoFrames(bogus).collect()
    }
    assert(e.getMessage != null)
  }

  test("decodeAudioMeta fails loudly on a non-audio payload") {
    import spark.implicits._
    val bogus = Seq(graft.multimodal.MediaRow(
      7L, "audio", "not a wav".getBytes("UTF-8"), 0, 0, 0L)).toDS()
    val e = intercept[Exception] {
      MultimodalOps.decodeAudioMeta(bogus).collect()
    }
    assert(e.getMessage != null)
  }

  test("decodeImageMeta fails loudly on a non-image payload") {
    import spark.implicits._
    val bogus = Seq(graft.multimodal.MediaRow(
      7L, "image", "not a png".getBytes("UTF-8"), 0, 0, 0L)).toDS()
    val e = intercept[Exception] {
      MultimodalOps.decodeImageMeta(bogus).collect()
    }
    assert(e.getMessage != null)
  }

  test("decodeFeatures uses real pixel features for decodable images") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(5)
    val encoded = MultimodalOps.encodePngImages(spark, docs, "doc_id")
    val f = MultimodalOps.decodeFeatures(encoded, dim = 16)
      .filter(_.media_id == 0L).head()
    // feature[0], feature[1] are the decoded raster dims
    assert(f.feature(0) == MultimodalOps.synthW(0L).toFloat)
    assert(f.feature(1) == MultimodalOps.synthH(0L).toFloat)
  }

  test("media dataset has binary payload and typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("duration_ms").dataType.typeName == "long")
    val row = media.head()
    assert(row.payload.nonEmpty && row.media_id >= 0)
  }

  test("decodeFeatures is batch-shaped, deterministic, and length-stable") {
    val feats = MultimodalOps.decodeFeatures(media, dim = 16)
    assert(feats.count() == media.count())
    val f = feats.filter(_.media_id == 0L).head()
    assert(f.feature.length == 16 && f.n_bytes > 0)
    // deterministic: decoding twice yields the same vector
    val f2 = MultimodalOps.decodeFeatures(media, dim = 16)
      .filter(_.media_id == 0L).head()
    assert(f.feature.sameElements(f2.feature))
  }

  test("decode preserves partitioning (no shuffle introduced)") {
    val repart = media.repartition(7)
    val decoded = MultimodalOps.decodeFeatures(repart)
    assert(decoded.rdd.getNumPartitions == 7)
  }

  test("binaryFile source ingests opaque payloads with metadata") {
    // the real media-ingestion path: a directory of opaque files read as
    // (path, modificationTime, length, content) — content lands in the
    // same BinaryType column MediaRow.payload models
    val dir = tmpPath("graft_binfiles")
    val fs = new java.io.File(dir)
    fs.mkdirs()
    val payloads = Map("a.bin" -> Array[Byte](1, 2, 3, 4),
      "b.bin" -> Array[Byte](9, 8, 7))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name), bytes)
    }
    val df = spark.read.format("binaryFile").load(dir)
    assert(df.schema("content").dataType.typeName == "binary")
    val got = df.select(element_at(split(col("path"), "/"), -1).as("name"),
        col("length"), col("content"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getAs[Array[Byte]](2)))
      .toMap
    payloads.foreach { case (name, bytes) =>
      val (len, content) = got(name)
      assert(len == bytes.length && content.sameElements(bytes))
    }
  }

  test("frameSamplePlan explodes one row per sampled timestamp") {
    val df = media.toDF().select("media_id", "duration_ms")
    val frames = MultimodalOps.frameSamplePlan(df, everyMs = 1000L)
    val one = frames.where(col("media_id") === 0).count()
    val dur = df.where(col("media_id") === 0).head().getLong(1)
    assert(one == (dur + 999) / 1000) // ceil(duration / step)
    assert(frames.where(col("frame_idx") < 0).count() == 0)
  }

  // ---- FastPng ↔ ImageIO cross-validation (r17 codec optimization) ----
  // The honesty contract for replacing ImageIO on the PNG hot path: the
  // two independent codec implementations must agree BOTH directions, so
  // a compensating encode/decode bug pair in FastPng cannot hide behind
  // its own round-trip.

  private def synthRaster(id: Long): (Int, Int, Array[Int]) = {
    val (w, h) = (MultimodalOps.synthW(id), MultimodalOps.synthH(id))
    val px = Array.tabulate(w * h) { i =>
      val (x, y) = (i % w, i / w)
      (MultimodalOps.synthR(id, x, y) << 16) |
        (MultimodalOps.synthG(id, x, y) << 8) | MultimodalOps.synthB(id, x, y)
    }
    (w, h, px)
  }

  test("FastPng.encode bytes decode pixel-identically through ImageIO") {
    // 117 ids covers every (w, h) combination of the synthetic raster
    // (w has period 13, h period 9)
    (0L until 117L).foreach { id =>
      val (w, h, px) = synthRaster(id)
      val bytes = graft.multimodal.FastPng.encodeRgb(w, h, px)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO could not parse FastPng bytes for id=$id")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xffffff) == px(y * w + x),
          s"pixel ($x,$y) of id=$id diverged FastPng->ImageIO")
    }
  }

  test("ImageIO.write bytes decode pixel-identically through FastPng") {
    // includes a larger noise image so ImageIO's adaptive filter heuristic
    // exercises the Sub/Up/Average/Paeth decode arms, not just filter 0
    val rnd = new scala.util.Random(42)
    val shapes = (0L until 117L).map(id =>
      (MultimodalOps.synthW(id), MultimodalOps.synthH(id), id)) ++
      Seq((64, 48, -1L), (31, 77, -2L))
    shapes.foreach { case (w, h, id) =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = if (id >= 0) {
          (MultimodalOps.synthR(id, x, y) << 16) |
            (MultimodalOps.synthG(id, x, y) << 8) | MultimodalOps.synthB(id, x, y)
        } else rnd.nextInt(1 << 24)
        img.setRGB(x, y, v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val (dw, dh, px) = graft.multimodal.FastPng.decode(bos.toByteArray)
      assert(dw == w && dh == h, s"dims diverged for id=$id")
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) == (img.getRGB(x, y) & 0xffffff),
          s"pixel ($x,$y) of id=$id diverged ImageIO->FastPng")
    }
  }

  // ---- FastGif ↔ ImageIO cross-validation (r17 codec optimization) ----

  private def gifFrames(id: Long): (Int, Int, Seq[Array[Byte]]) = {
    val (nf, w, h) = (MultimodalOps.synthNFrames(id),
      MultimodalOps.synthVW(id), MultimodalOps.synthVH(id))
    val frames = (0 until nf).map { f =>
      Array.tabulate(w * h) { i =>
        MultimodalOps.synthGray(id, f, i % w, i / w).toByte
      }
    }
    (w, h, frames)
  }

  test("FastGif.encode bytes decode frame-identically through ImageIO") {
    // 140 ids covers every (w, h, nf) combination (periods 5, 4, 7); plus
    // a large random frame that forces the LZW dictionary to 4096 and the
    // code width to 12 bits — the growth schedule is where GIF codecs
    // classically disagree by one bit
    val rnd = new scala.util.Random(7)
    val big = Array.fill[Byte](200 * 200)(rnd.nextInt(256).toByte)
    val cases = (0L until 140L).map(gifFrames) :+ ((200, 200, Seq(big)))
    cases.foreach { case (w, h, frames) =>
      val bytes = graft.multimodal.FastGif.encodeGray(w, h, frames)
      val reader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis)
        assert(reader.getNumImages(true) == frames.length)
        frames.zipWithIndex.foreach { case (px, f) =>
          val img = reader.read(f)
          assert(img.getWidth == w && img.getHeight == h)
          for (y <- 0 until h; x <- 0 until w)
            assert((img.getRGB(x, y) & 0xff) == (px(y * w + x) & 0xff),
              s"pixel ($x,$y) frame $f (${w}x$h) diverged FastGif->ImageIO")
        }
      } finally { reader.dispose(); iis.close() }
    }
  }

  test("ImageIO.write bytes decode frame-identically through FastGif") {
    val rnd = new scala.util.Random(11)
    val big = Array.fill[Byte](200 * 200)(rnd.nextInt(256).toByte)
    val cases = (0L until 140L).map(gifFrames) :+ ((200, 200, Seq(big)))
    val cm = MultimodalOps.grayPalette
    cases.foreach { case (w, h, frames) =>
      val writer =
        javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach { px =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
          val raster = img.getRaster
          for (y <- 0 until h; x <- 0 until w)
            raster.setSample(x, y, 0, px(y * w + x) & 0xff)
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      val got = graft.multimodal.FastGif.decodeGray(bos.toByteArray)
      assert(got.length == frames.length)
      frames.zipWithIndex.foreach { case (px, f) =>
        assert(got(f).width == w && got(f).height == h)
        (0 until w * h).foreach { i =>
          assert(got(f).gray(i) == (px(i) & 0xff),
            s"pixel $i frame $f (${w}x$h) diverged ImageIO->FastGif")
        }
      }
    }
  }

  test("FastGif fails loudly on corrupt input") {
    intercept[Exception] {
      graft.multimodal.FastGif.decodeGray("definitely not a gif container".getBytes("UTF-8"))
    }
    val (w, h, frames) = gifFrames(3L)
    val good = graft.multimodal.FastGif.encodeGray(w, h, frames)
    val bad = good.clone()
    bad(10) = 0x7f // clobber the screen-descriptor/palette region
    // either parses to different-but-valid gray values or raises — what it
    // must NOT do is crash the JVM (ADVICE r17: actually exercise the
    // clobbered-header path instead of leaving the fixture dead)
    try graft.multimodal.FastGif.decodeGray(bad)
    catch { case _: Exception => () } // raising is an accepted outcome
    // and a truncated stream must raise
    intercept[Exception] {
      graft.multimodal.FastGif.decodeGray(good.take(good.length / 2))
    }
  }

  test("FastWav.encode bytes parse sample-identically through AudioSystem") {
    (0L until 301L by 7L).foreach { id =>
      val n = MultimodalOps.synthNSamples(id)
      val pcm = Array.tabulate(n)(i => MultimodalOps.synthAmp(id, i).toShort)
      val bytes = graft.multimodal.FastWav.encodeMono16(
        MultimodalOps.AudioRateHz, pcm)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      assert(fmt.getSampleRate.toInt == MultimodalOps.AudioRateHz &&
        fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16 &&
        !fmt.isBigEndian &&
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
      val raw = ais.readAllBytes()
      assert(raw.length == n * 2, s"id=$id: AudioSystem read ${raw.length} bytes")
      val buf = java.nio.ByteBuffer.wrap(raw)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until n).foreach { i =>
        assert(buf.getShort(i * 2) == pcm(i), s"id=$id sample $i diverged")
      }
    }
  }

  test("AudioSystem.write bytes parse sample-identically through FastWav") {
    (0L until 301L by 7L).foreach { id =>
      val n = MultimodalOps.synthNSamples(id)
      val pcm = Array.tabulate(n)(i => MultimodalOps.synthAmp(id, i).toShort)
      val fmt = new javax.sound.sampled.AudioFormat(
        MultimodalOps.AudioRateHz.toFloat, 16, 1, true, false)
      val bb = java.nio.ByteBuffer.allocate(n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      pcm.foreach(bb.putShort)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bb.array), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      val got = graft.multimodal.FastWav.decode(bos.toByteArray)
      assert(got.sampleRateHz == MultimodalOps.AudioRateHz)
      assert(got.samples.length == n)
      (0 until n).foreach { i =>
        assert(got.samples(i) == pcm(i), s"id=$id sample $i diverged")
      }
    }
  }

  test("FastWav fails loudly on corrupt or non-PCM input") {
    intercept[Exception] {
      graft.multimodal.FastWav.decode("definitely not a wav container".getBytes("UTF-8"))
    }
    // stereo header must be rejected, not mis-summed
    val good = graft.multimodal.FastWav.encodeMono16(16000, Array[Short](1, 2, 3))
    val stereo = good.clone()
    stereo(22) = 2 // channels field
    intercept[Exception] { graft.multimodal.FastWav.decode(stereo) }
  }

  test("FastPng fails loudly on corrupt input") {
    intercept[Exception] {
      graft.multimodal.FastPng.decode("not a png at all, but long enough to pass the length gate".getBytes("UTF-8"))
    }
    // flip one payload byte -> CRC mismatch must raise, not mis-decode
    val (w, h, px) = synthRaster(5L)
    val good = graft.multimodal.FastPng.encodeRgb(w, h, px)
    val bad = good.clone()
    bad(good.length - 20) = (bad(good.length - 20) ^ 0x5a).toByte
    intercept[Exception] { graft.multimodal.FastPng.decode(bad) }
  }
}

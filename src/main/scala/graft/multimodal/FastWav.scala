package graft.multimodal

/** Minimal RIFF/WAVE PCM codec, the audio analog of [[FastPng]] (r17,
  * guide §1.2 step 2 — per-task work): `javax.sound.sampled` pays
  * provider dispatch, `AudioInputStream` plumbing, and stream copies on
  * every call, which dominates at the short-clip sizes a speech-pipeline
  * micro-batch moves. This codec writes the canonical 44-byte PCM header
  * and parses the general chunked container (fmt /data in any order,
  * unknown chunks skipped, sizes validated, loud failure on non-PCM or
  * compressed formats).
  *
  * Cross-engine honesty is spec-pinned BOTH directions in MultimodalSpec:
  * FastWav bytes parse sample-identically through `AudioSystem`, and
  * `AudioSystem.write` bytes parse sample-identically through
  * [[FastWav.decode]].
  */
object FastWav {

  /** One decoded PCM stream: 16-bit signed little-endian mono samples. */
  final case class Pcm(sampleRateHz: Int, samples: Array[Short])

  /** Encode 16-bit signed mono PCM as a canonical WAV container. */
  def encodeMono16(sampleRateHz: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                      // WAVE_FORMAT_PCM
      .putShort(1)                      // mono
      .putInt(sampleRateHz)
      .putInt(sampleRateHz * 2)         // byte rate
      .putShort(2)                      // block align
      .putShort(16)                     // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { out.putShort(samples(i)); i += 1 }
    out.array()
  }

  /** Decode a WAV container holding 16-bit signed mono PCM. Walks the
    * chunk list (any order, unknown chunks skipped, odd sizes padded per
    * spec); throws IllegalArgumentException on anything that is not
    * plain mono 16-bit PCM. */
  def decode(wav: Array[Byte]): Pcm = {
    val buf = java.nio.ByteBuffer.wrap(wav)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(wav.length >= 12, s"FastWav: ${wav.length} bytes is not a WAV")
    require(tag(buf, 0) == "RIFF" && tag(buf, 8) == "WAVE",
      "FastWav: missing RIFF/WAVE signature")
    var pos = 12
    var rate = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= wav.length && (rate < 0 || dataOff < 0)) {
      val id = tag(buf, pos)
      val len = buf.getInt(pos + 4)
      require(len >= 0 && pos + 8 + len <= wav.length,
        s"FastWav: chunk $id length $len overruns buffer")
      id match {
        case "fmt " =>
          require(len >= 16, s"FastWav: fmt chunk too short ($len)")
          val fmtTag = buf.getShort(pos + 8) & 0xffff
          val channels = buf.getShort(pos + 10) & 0xffff
          val bits = buf.getShort(pos + 22) & 0xffff
          require(fmtTag == 1, s"FastWav: not plain PCM (format tag $fmtTag)")
          require(channels == 1, s"FastWav: expected mono, got $channels channels")
          require(bits == 16, s"FastWav: expected 16-bit, got $bits")
          rate = buf.getInt(pos + 12)
        case "data" =>
          dataOff = pos + 8; dataLen = len
        case _ => () // LIST/fact/cue — skip
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(rate > 0, "FastWav: missing fmt chunk")
    require(dataOff >= 0, "FastWav: missing data chunk")
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = buf.getShort(dataOff + i * 2); i += 1 }
    Pcm(rate, samples)
  }

  private def tag(buf: java.nio.ByteBuffer, off: Int): String = {
    val b = new Array[Byte](4)
    var i = 0
    while (i < 4) { b(i) = buf.get(off + i); i += 1 }
    new String(b, "US-ASCII")
  }
}

package graft.multimodal

/** Minimal multi-frame GIF codec (the video-container analog of
  * [[FastPng]]/[[FastWav]], r17 guide §1.2 step 2): `javax.imageio`'s GIF
  * writer/reader pays SPI dispatch, BufferedImage/raster plumbing, and
  * stream-metadata object graphs per clip, which dominates at the small
  * frame sizes a patch/frame-sampling pipeline moves.
  *
  * STILL A REAL CODEC: the byte stream is spec-conformant GIF89a —
  * logical screen descriptor, 256-entry global color table, per-frame
  * image descriptors, genuine variable-code-width LZW with clear/EOI
  * codes and 4096-entry dictionary reset, sub-block framing, trailer.
  * The decoder walks extensions, honors global AND local color tables
  * (gray value = palette red channel), handles dictionary growth and the
  * code-size schedule, and fails loudly on interlace or malformed LZW
  * rather than guessing. Cross-engine honesty is spec-pinned BOTH
  * directions in MultimodalSpec: FastGif bytes decode frame- and
  * pixel-identically through `ImageIO`'s GIF reader, and
  * `ImageIO.write`-produced GIFs decode identically through
  * [[FastGif.decodeGray]].
  */
object FastGif {

  /** One decoded frame: dims plus gray values (palette red channel). */
  final case class Frame(width: Int, height: Int, gray: Array[Int])

  /** Encode full-size 8-bit gray frames (values 0-255, row-major) as an
    * animated GIF with an identity 256-gray global palette. */
  def encodeGray(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && w < 65536 && h > 0 && h < 65536, s"bad dims ${w}x$h")
    require(frames.nonEmpty, "no frames")
    frames.foreach(f => require(f.length == w * h,
      s"frame length ${f.length} != ${w}x$h"))
    val out = new java.io.ByteArrayOutputStream(1024)
    out.write("GIF89a".getBytes("US-ASCII"))
    // logical screen descriptor: global table, 8-bit color res, 256 entries
    w16(out, w); w16(out, h)
    out.write(0xF7); out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    frames.foreach { px =>
      out.write(0x2C) // image descriptor
      w16(out, 0); w16(out, 0); w16(out, w); w16(out, h)
      out.write(0x00) // no local table, no interlace
      lzwEncode(out, px)
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Decode a (possibly multi-frame) GIF into per-frame gray rasters.
    * Supports global and per-frame local color tables, extension blocks
    * (skipped), sub-frame rectangles (each frame returns its OWN raster,
    * like ImageIO's per-image read). Throws on interlaced frames or
    * malformed LZW. */
  def decodeGray(gif: Array[Byte]): Seq[Frame] = {
    require(gif.length > 13, s"FastGif: ${gif.length} bytes is not a GIF")
    val sig = new String(gif, 0, 6, "US-ASCII")
    require(sig == "GIF89a" || sig == "GIF87a", s"FastGif: bad signature $sig")
    var pos = 6
    def u16(): Int = { val v = (gif(pos) & 0xff) | ((gif(pos + 1) & 0xff) << 8); pos += 2; v }
    u16(); u16() // screen dims
    val packed = gif(pos) & 0xff; pos += 3 // packed, bg index, aspect
    var globalGray: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 7) + 1)
      globalGray = Array.tabulate(n)(k => gif(pos + 3 * k) & 0xff) // red ch.
      pos += 3 * n
    }
    val frames = Vector.newBuilder[Frame]
    var done = false
    while (!done) {
      require(pos < gif.length, "FastGif: truncated stream (no trailer)")
      (gif(pos) & 0xff) match {
        case 0x3B => done = true
        case 0x21 => // extension: introducer, label, sub-blocks
          pos += 2
          while ((gif(pos) & 0xff) != 0) pos += 1 + (gif(pos) & 0xff)
          pos += 1
        case 0x2C =>
          pos += 1
          u16(); u16() // left, top — each frame returns its own raster
          val fw = u16(); val fh = u16()
          val fpacked = gif(pos) & 0xff; pos += 1
          val interlaced = (fpacked & 0x40) != 0
          var palette = globalGray
          if ((fpacked & 0x80) != 0) {
            val n = 1 << ((fpacked & 7) + 1)
            palette = Array.tabulate(n)(k => gif(pos + 3 * k) & 0xff)
            pos += 3 * n
          }
          require(palette != null, "FastGif: frame has no color table")
          val (raw, nextPos) = lzwDecode(gif, pos, fw * fh)
          pos = nextPos
          // interlaced frames (GIF89a §20, ImageIO's writer default) carry
          // the rows in four passes: 0,8,16… then 4,12… then 2,6,10… then
          // the odd rows — deinterleave into display order
          val indices =
            if (!interlaced) raw
            else {
              val o = new Array[Byte](raw.length)
              var src = 0
              Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (start, step) =>
                var y = start
                while (y < fh) {
                  System.arraycopy(raw, src * fw, o, y * fw, fw)
                  src += 1; y += step
                }
              }
              o
            }
          val gray = new Array[Int](fw * fh)
          var k = 0
          while (k < gray.length) {
            val idx = indices(k) & 0xff
            require(idx < palette.length,
              s"FastGif: pixel index $idx outside ${palette.length}-entry palette")
            gray(k) = palette(idx); k += 1
          }
          frames += Frame(fw, fh, gray)
        case b =>
          throw new IllegalArgumentException(
            f"FastGif: unknown block introducer 0x$b%02x at $pos")
      }
    }
    frames.result()
  }

  // ---- LZW (GIF variant: variable code width, clear/EOI, 4096 cap) ----

  private def lzwEncode(out: java.io.ByteArrayOutputStream,
                        px: Array[Byte]): Unit = {
    val minCode = 8
    out.write(minCode)
    val clear = 1 << minCode; val eoi = clear + 1
    val block = new java.io.ByteArrayOutputStream(512)
    var bitBuf = 0L; var bitCnt = 0
    var codeSize = minCode + 1
    var dict = new java.util.HashMap[Integer, Integer](4096)
    var next = eoi + 1
    def flushByte(): Unit = {
      while (bitCnt >= 8) {
        block.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8; bitCnt -= 8
        if (block.size() == 255) { out.write(255); block.writeTo(out); block.reset() }
      }
    }
    // the code-size bump is checked AFTER writing a code and BEFORE the
    // caller adds its new dictionary entry (the classic compress/GIF
    // schedule — the decoder's mirror check runs after IT adds the
    // one-step-delayed entry, keeping both sides on the same width)
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += codeSize; flushByte()
      if (codeSize < 12 && next > (1 << codeSize) - 1) codeSize += 1
    }
    emit(clear)
    var prefix: Int = px(0) & 0xff
    var i = 1
    while (i < px.length) {
      val c = px(i) & 0xff
      val key: Integer = (prefix << 8) | c
      val hit = dict.get(key)
      if (hit != null) prefix = hit
      else {
        emit(prefix)
        if (next < 4096) { dict.put(key, next); next += 1 }
        else {
          emit(clear)
          dict = new java.util.HashMap[Integer, Integer](4096)
          next = eoi + 1; codeSize = minCode + 1
        }
        prefix = c
      }
      i += 1
    }
    emit(prefix)
    emit(eoi)
    // flush remaining bits
    if (bitCnt > 0) { bitCnt = 8; flushByte() }
    if (block.size() > 0) { out.write(block.size()); block.writeTo(out) }
    out.write(0) // block terminator
  }

  /** Decode `n` pixel indices starting at the LZW-min-code-size byte at
    * `pos`; returns (indices, position after the block terminator). */
  private def lzwDecode(gif: Array[Byte], pos0: Int, n: Int): (Array[Byte], Int) = {
    var pos = pos0
    val minCode = gif(pos) & 0xff; pos += 1
    require(minCode >= 2 && minCode <= 8, s"FastGif: bad LZW min code $minCode")
    val clear = 1 << minCode; val eoi = clear + 1
    val prefix = new Array[Short](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](n)
    var outPos = 0
    var codeSize = minCode + 1
    var next = eoi + 1
    var bitBuf = 0L; var bitCnt = 0
    var blockLeft = 0
    var prev = -1
    def readCode(): Int = {
      while (bitCnt < codeSize) {
        if (blockLeft == 0) {
          blockLeft = gif(pos) & 0xff; pos += 1
          if (blockLeft == 0) { pos -= 1; return eoi } // premature terminator:
          // leave it unconsumed for the caller's skip-to-terminator walk
        }
        bitBuf |= (gif(pos) & 0xffL) << bitCnt; bitCnt += 8; pos += 1; blockLeft -= 1
      }
      val c = (bitBuf & ((1L << codeSize) - 1)).toInt
      bitBuf >>>= codeSize; bitCnt -= codeSize
      c
    }
    var running = true
    while (running && outPos < n) {
      val c = readCode()
      if (c == clear) {
        next = eoi + 1; codeSize = minCode + 1; prev = -1
      } else if (c == eoi) {
        running = false
      } else {
        require(c < next || (c == next && prev >= 0),
          s"FastGif: LZW code $c out of range (next=$next)")
        val isKwK = c == next // code not yet in the table: seq(prev)+first(seq(prev))
        val cur = if (isKwK) prev else c
        // stack slot 0 is reserved for the KwKwK trailing byte (it pops
        // LAST); the chain walk pushes last-to-first, the root literal is
        // the sequence's FIRST byte and pops first
        var sp = if (isKwK) 1 else 0
        var p = cur
        while (p >= clear + 2) { stack(sp) = suffix(p); sp += 1; p = prefix(p) }
        val firstByte = p.toByte
        stack(sp) = firstByte; sp += 1
        if (isKwK) stack(0) = firstByte
        while (sp > 0) {
          sp -= 1
          require(outPos < n, "FastGif: LZW output overruns frame")
          out(outPos) = stack(sp); outPos += 1
        }
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev.toShort
          suffix(next) = firstByte
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = c
      }
    }
    require(outPos == n, s"FastGif: decoded $outPos of $n pixels")
    // skip to and past the block terminator
    if (blockLeft > 0) pos += blockLeft
    while ((gif(pos) & 0xff) != 0) pos += 1 + (gif(pos) & 0xff)
    pos += 1
    (out, pos)
  }

  private def w16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
}

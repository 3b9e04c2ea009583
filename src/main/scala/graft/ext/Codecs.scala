package graft.ext

/** Dependency-free REAL decoders for the multimodal seam: BMP (24bpp
  * uncompressed) and WAV (PCM16) parsed straight from their public byte
  * layouts — no external codec library, so they run in this container.
  *
  * This is the swap-in [[Multimodal.decodeStub]]'s scaladoc promises: the
  * same `(content, dim) => Array[Float]` signature, but features computed
  * from genuinely decoded pixels / PCM samples. [[decodeReal]] sniffs the
  * magic bytes and dispatches; unsupported payloads fail LOUDLY (a real
  * pipeline routes those to a dead letter, mirroring the CDC path's
  * route-or-keep discipline — never silently fake a feature).
  *
  * Feature contract matches the stub's: a `dim`-length unit-norm vector,
  * deterministic per (content, dim). Layout is summary stats in the head
  * (channel means/stds for images; RMS, zero-crossing rate, mean |ampl|,
  * peak for audio) and a luminance / amplitude histogram in the tail —
  * the classic pre-neural content descriptor, and enough for the
  * engine's downstream ops (near-dup, ANN, group stats) to act on real
  * content rather than byte hashes.
  */
object Codecs extends Serializable {

  // ---- little-endian readers (both formats specify little-endian) ----
  @inline private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff
  @inline private def u16(b: Array[Byte], o: Int): Int = u8(b, o) | (u8(b, o + 1) << 8)
  @inline private def i32(b: Array[Byte], o: Int): Int =
    u8(b, o) | (u8(b, o + 1) << 8) | (u8(b, o + 2) << 16) | (u8(b, o + 3) << 24)

  def isBmp(content: Array[Byte]): Boolean =
    content.length >= 2 && content(0) == 'B' && content(1) == 'M'

  def isWav(content: Array[Byte]): Boolean =
    content.length >= 12 &&
      content(0) == 'R' && content(1) == 'I' && content(2) == 'F' && content(3) == 'F' &&
      content(8) == 'W' && content(9) == 'A' && content(10) == 'V' && content(11) == 'E'

  /** Decoded image: row-major TOP-DOWN RGB triples. */
  final case class BmpImage(width: Int, height: Int, rgb: Array[Byte])

  /** Parse a 24bpp uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
    * the layout every paint program writes). Handles both bottom-up
    * (positive height, the common case) and top-down (negative height)
    * row orders and the 4-byte row padding. */
  def decodeBmp(content: Array[Byte]): BmpImage = {
    require(content.length >= 54, s"BMP: truncated header (${content.length} bytes)")
    require(isBmp(content), "BMP: bad magic (expected 'BM')")
    val dataOff = i32(content, 10)
    val hdrSize = i32(content, 14)
    require(hdrSize >= 40, s"BMP: need BITMAPINFOHEADER, got header size $hdrSize")
    val width = i32(content, 18)
    val heightRaw = i32(content, 22)
    val bpp = u16(content, 28)
    val compression = i32(content, 30)
    require(width > 0 && heightRaw != 0, s"BMP: bad dimensions ${width}x$heightRaw")
    require(bpp == 24 && compression == 0,
      s"BMP: only 24bpp uncompressed supported (got bpp=$bpp compression=$compression)")
    val topDown = heightRaw < 0
    val height = math.abs(heightRaw)
    val rowSize = ((width * 3 + 3) / 4) * 4 // rows pad to 4-byte boundaries
    require(content.length.toLong >= dataOff.toLong + rowSize.toLong * height,
      s"BMP: truncated pixel data (need ${dataOff + rowSize.toLong * height}, " +
        s"have ${content.length})")
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y // bottom-up storage
      val base = dataOff + srcRow * rowSize
      var x = 0
      while (x < width) {
        val p = base + x * 3
        val o = (y * width + x) * 3
        rgb(o) = content(p + 2) // BMP stores BGR; emit RGB
        rgb(o + 1) = content(p + 1)
        rgb(o + 2) = content(p)
        x += 1
      }
      y += 1
    }
    BmpImage(width, height, rgb)
  }

  /** Encode RGB pixels as a 24bpp uncompressed bottom-up BMP — the
    * exact layout [[decodeBmp]] parses (the round-trip is spec-pinned).
    * `rgb` is row-major top-down RGB triples, `width*height*3` bytes. */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"BMP: bad dimensions ${width}x$height")
    require(rgb.length == width * height * 3,
      s"BMP: need ${width * height * 3} rgb bytes, got ${rgb.length}")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val out = new Array[Byte](54 + dataSize)
    @inline def w16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    @inline def w32(o: Int, v: Int): Unit = {
      w16(o, v & 0xffff); w16(o + 2, (v >>> 16) & 0xffff)
    }
    out(0) = 'B'; out(1) = 'M'
    w32(2, out.length); w32(10, 54)          // file size, pixel offset
    w32(14, 40)                              // BITMAPINFOHEADER
    w32(18, width); w32(22, height)          // positive height = bottom-up
    w16(26, 1); w16(28, 24)                  // planes, 24bpp
    w32(30, 0); w32(34, dataSize)            // BI_RGB, image size
    var y = 0
    while (y < height) {
      val dstRow = 54 + (height - 1 - y) * rowSize // bottom-up storage
      var x = 0
      while (x < width) {
        val s = (y * width + x) * 3
        val d = dstRow + x * 3
        out(d) = rgb(s + 2)     // BGR on disk
        out(d + 1) = rgb(s + 1)
        out(d + 2) = rgb(s)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decoded audio: interleaved PCM16 samples. */
  final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Parse a RIFF/WAVE container with a PCM16 `fmt ` chunk, walking the
    * chunk list (so files with LIST/INFO or fact chunks parse too). */
  def decodeWav(content: Array[Byte]): WavAudio = {
    require(content.length >= 44, s"WAV: truncated header (${content.length} bytes)")
    require(isWav(content), "WAV: bad magic (expected RIFF....WAVE)")
    var off = 12
    var sampleRate = 0
    var channels = 0
    var fmtSeen = false
    var samples: Array[Short] = null
    while (off + 8 <= content.length) {
      val id = new String(content, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = i32(content, off + 4)
      require(size >= 0 && off + 8 + size.toLong <= content.length,
        s"WAV: chunk '$id' overruns the file")
      if (id == "fmt ") {
        require(size >= 16, "WAV: fmt chunk too small")
        val audioFormat = u16(content, off + 8)
        channels = u16(content, off + 10)
        sampleRate = i32(content, off + 12)
        val bits = u16(content, off + 22)
        require(audioFormat == 1 && bits == 16,
          s"WAV: only PCM16 supported (got format=$audioFormat bits=$bits)")
        require(channels >= 1 && sampleRate > 0,
          s"WAV: bad fmt (channels=$channels rate=$sampleRate)")
        fmtSeen = true
      } else if (id == "data") {
        require(fmtSeen, "WAV: data chunk before fmt chunk")
        val n = size / 2
        samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          samples(i) = (u8(content, off + 8 + 2 * i) |
            (content(off + 9 + 2 * i) << 8)).toShort
          i += 1
        }
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(samples != null, "WAV: no data chunk")
    WavAudio(sampleRate, channels, samples)
  }

  @inline private def unitNorm(v: Array[Float]): Array[Float] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n > 0) { i = 0; while (i < v.length) { v(i) = (v(i) / n).toFloat; i += 1 } }
    v
  }

  /** REAL image features: per-channel mean and stddev (6 dims, scaled to
    * [0,1]) + a luminance histogram over the remaining dims (mass
    * fractions), unit-normalized — computed from decoded pixels, not
    * payload bytes. */
  def bmpFeatures(content: Array[Byte], dim: Int): Array[Float] = {
    require(dim >= 8, s"image features need dim >= 8, got $dim")
    val img = decodeBmp(content)
    val n = img.width.toLong * img.height
    val sum = new Array[Double](3)
    val sumSq = new Array[Double](3)
    val bins = dim - 6
    val hist = new Array[Long](bins)
    var i = 0
    while (i < img.rgb.length) {
      val r = img.rgb(i) & 0xff; val g = img.rgb(i + 1) & 0xff; val b = img.rgb(i + 2) & 0xff
      sum(0) += r; sum(1) += g; sum(2) += b
      sumSq(0) += r.toDouble * r; sumSq(1) += g.toDouble * g; sumSq(2) += b.toDouble * b
      // integer Rec.601 luma in [0, 255]
      val luma = (299 * r + 587 * g + 114 * b) / 1000
      hist(math.min(bins - 1, luma * bins / 256)) += 1
      i += 3
    }
    val out = new Array[Float](dim)
    var c = 0
    while (c < 3) {
      val mean = sum(c) / n
      out(c) = (mean / 255.0).toFloat
      out(3 + c) = (math.sqrt(math.max(0.0, sumSq(c) / n - mean * mean)) / 255.0).toFloat
      c += 1
    }
    var b2 = 0
    while (b2 < bins) { out(6 + b2) = (hist(b2).toDouble / n).toFloat; b2 += 1 }
    unitNorm(out)
  }

  /** REAL audio features: RMS, zero-crossing rate, mean |amplitude|, peak
    * (4 dims, each in [0,1]) + an |amplitude| histogram over the remaining
    * dims, unit-normalized — computed from decoded PCM samples. */
  def wavFeatures(content: Array[Byte], dim: Int): Array[Float] = {
    require(dim >= 6, s"audio features need dim >= 6, got $dim")
    val wav = decodeWav(content)
    val n = math.max(1, wav.samples.length)
    val bins = dim - 4
    val hist = new Array[Long](bins)
    var sumSq = 0.0; var sumAbs = 0.0; var peak = 0; var zc = 0L
    var i = 0
    while (i < wav.samples.length) {
      val s = wav.samples(i).toInt
      val a = math.abs(s)
      sumSq += s.toDouble * s; sumAbs += a
      if (a > peak) peak = a
      if (i > 0 && ((s >= 0) != (wav.samples(i - 1) >= 0))) zc += 1
      hist(math.min(bins - 1, a * bins / 32768)) += 1
      i += 1
    }
    val out = new Array[Float](dim)
    out(0) = (math.sqrt(sumSq / n) / 32768.0).toFloat // RMS
    out(1) = (zc.toDouble / n).toFloat // zero-crossing rate
    out(2) = (sumAbs / n / 32768.0).toFloat // mean |amplitude|
    out(3) = (peak / 32768.0).toFloat // peak
    var b = 0
    while (b < bins) { out(4 + b) = (hist(b).toDouble / n).toFloat; b += 1 }
    unitNorm(out)
  }

  /** The [[Multimodal.decodeStub]] swap-in: sniff the magic bytes,
    * dispatch to the real decoder; anything else fails loudly. */
  def decodeReal(content: Array[Byte], dim: Int): Array[Float] =
    if (isBmp(content)) bmpFeatures(content, dim)
    else if (isWav(content)) wavFeatures(content, dim)
    else throw new IllegalArgumentException(
      "unsupported media payload (expected BMP or WAV magic); " +
        "route undecodable media to a dead letter upstream")
}

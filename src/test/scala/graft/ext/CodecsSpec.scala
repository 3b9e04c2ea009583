package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkTestBase

/** Real BMP/WAV decoders and the codec seam: fixtures are generated in
  * their actual on-disk byte layouts (headers, BGR order, row padding,
  * chunk walking), decoded back, and run through the SAME
  * `extractFeatures` plumbing the stub path uses. */
class CodecsSpec extends SparkTestBase {
  import spark.implicits._

  /** Write a 24bpp BMP: file+info headers, BGR pixel order, rows padded
    * to 4 bytes, bottom-up unless `topDown`. */
  private def bmp(width: Int, height: Int, px: (Int, Int) => (Int, Int, Int),
                  topDown: Boolean = false): Array[Byte] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val b = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize).putInt(0).putInt(54)
    b.putInt(40).putInt(width).putInt(if (topDown) -height else height)
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (s <- 0 until height) {
      val y = if (topDown) s else height - 1 - s // stored row -> image row
      for (x <- 0 until width) {
        val (r, g, bl) = px(x, y)
        b.put(bl.toByte).put(g.toByte).put(r.toByte)
      }
      for (_ <- width * 3 until rowSize) b.put(0.toByte)
    }
    b.array()
  }

  /** Write a PCM16 mono WAV; optionally interpose a LIST chunk before
    * data (chunk-walking must skip it). */
  private def wav(sampleRate: Int, samples: Array[Short],
                  extraChunk: Boolean = false): Array[Byte] = {
    val dataSize = samples.length * 2
    val extra = if (extraChunk) 12 else 0
    val b = ByteBuffer.allocate(44 + extra + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + extra + dataSize).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    if (extraChunk) b.put("LIST".getBytes).putInt(4).put("INFO".getBytes)
    b.put("data".getBytes).putInt(dataSize)
    samples.foreach(b.putShort)
    b.array()
  }

  test("decodeBmp: pixel-exact round trip, padding + both row orders") {
    // 2x2, distinct per-pixel colors; width 2 -> 2 pad bytes per row
    val px = (x: Int, y: Int) => (x * 100 + 10, y * 100 + 20, x * 50 + y * 25 + 30)
    val up = Codecs.decodeBmp(bmp(2, 2, px))
    assert(up.width == 2 && up.height == 2)
    for (y <- 0 until 2; x <- 0 until 2) {
      val o = (y * 2 + x) * 3
      val (r, g, b) = px(x, y)
      assert((up.rgb(o) & 0xff, up.rgb(o + 1) & 0xff, up.rgb(o + 2) & 0xff) == ((r, g, b)),
        s"pixel ($x,$y)")
    }
    val down = Codecs.decodeBmp(bmp(2, 2, px, topDown = true))
    assert(up.rgb.toSeq == down.rgb.toSeq, "row order must not change decoded pixels")
  }

  test("decodeBmp: rejects bad magic, truncation, unsupported bpp") {
    val good = bmp(2, 2, (_, _) => (1, 2, 3))
    intercept[IllegalArgumentException](Codecs.decodeBmp("XXnot a bmp".getBytes))
    intercept[IllegalArgumentException](Codecs.decodeBmp(good.take(30)))
    intercept[IllegalArgumentException](Codecs.decodeBmp(good.dropRight(4)))
    val bpp8 = good.clone(); bpp8(28) = 8 // bpp field
    intercept[IllegalArgumentException](Codecs.decodeBmp(bpp8))
  }

  test("decodeWav: PCM parse, chunk walking, physical stats of a sine") {
    val rate = 16000
    val n = 1600 // 0.1 s
    val amp = 16000.0
    val freq = 440.0
    val sine = Array.tabulate(n)(i =>
      (amp * math.sin(2 * math.Pi * freq * i / rate)).toShort)
    val parsed = Codecs.decodeWav(wav(rate, sine, extraChunk = true))
    assert(parsed.sampleRate == rate && parsed.channels == 1)
    assert(parsed.samples.toSeq == sine.toSeq)

    val f = Codecs.wavFeatures(wav(rate, sine), dim = 16)
    // un-normalize via the peak slot to check physical stats
    val scale = (amp / 32768.0) / f(3)
    val rms = f(0) * scale * 32768.0
    assert(math.abs(rms - amp / math.sqrt(2)) < amp * 0.02,
      s"sine RMS should be amp/sqrt(2), got $rms")
    val zcr = f(1) * scale
    assert(math.abs(zcr - 2 * freq / rate) < 0.01,
      s"sine ZCR should be 2f/rate=${2 * freq / rate}, got $zcr")
  }

  test("bmpFeatures: solid color -> exact channel means, single luma bin") {
    val f = Codecs.bmpFeatures(bmp(4, 4, (_, _) => (255, 0, 0)), dim = 16)
    assert(f(1) == 0f && f(2) == 0f, "G/B means must be zero")
    assert(f(3) == 0f && f(4) == 0f && f(5) == 0f, "solid color has zero stddev")
    // unit-norm holds
    val norm = f.map(x => x.toDouble * x).sum
    assert(math.abs(norm - 1.0) < 1e-6)
    // one luma bin holds all mass: luma(255,0,0) = 76 -> bin 76*10/256 = 2
    val bins = f.drop(6)
    assert(bins.count(_ > 0f) == 1 && bins(2) > 0f)
  }

  test("extractFeatures runs the REAL codec through the stub's plumbing") {
    val img = bmp(8, 8, (x, y) => (x * 30, y * 30, (x + y) * 15))
    val snd = wav(8000, Array.tabulate(800)(i => (8000 * math.sin(i / 10.0)).toShort))
    val records = Seq(
      Multimodal.MediaRecord(1L, "image",
        Multimodal.MediaMeta("image/bmp", 8, 8, 0, 0L), img),
      Multimodal.MediaRecord(2L, "audio",
        Multimodal.MediaMeta("audio/wav", 0, 0, 8000, 100L), snd)
    ).toDS().repartition(2)

    val out = Multimodal.extractFeatures(records, dim = 16, Codecs.decodeReal _)
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).n_bytes == img.length && out(2L).n_bytes == snd.length)
    assert(out(1L).feature.toSeq == Codecs.bmpFeatures(img, 16).toSeq,
      "distributed image features must equal the direct decode")
    assert(out(2L).feature.toSeq == Codecs.wavFeatures(snd, 16).toSeq,
      "distributed audio features must equal the direct decode")
    // and the default path is untouched: stub still the oracle surface
    val stub = Multimodal.extractFeatures(records, dim = 16)
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    assert(stub(1L) == Multimodal.decodeStub(img, 16).toSeq)
  }

  test("decodeReal: unsupported payload fails loudly") {
    val e = intercept[IllegalArgumentException](
      Codecs.decodeReal("plain text, not media".getBytes, 16))
    assert(e.getMessage.contains("dead letter"))
  }
}

package graft.ext

import graft.SparkTestBase

/** Real-codec image hashing: BMP encode→decode round-trip, aHash
  * locality (few pixels differ → few bits differ), and the pigeonhole
  * pair join over image fingerprints. */
class ImageHashSpec extends SparkTestBase {
  import spark.implicits._

  test("encodeBmp round-trips through decodeBmp exactly") {
    val rng = new scala.util.Random(3)
    val (w, h) = (7, 5) // odd width exercises row padding
    val rgb = Array.fill(w * h * 3)(rng.nextInt(256).toByte)
    val img = Codecs.decodeBmp(Codecs.encodeBmp(w, h, rgb))
    assert(img.width == w && img.height == h)
    assert(img.rgb.toSeq == rgb.toSeq, "pixel-exact round trip")
  }

  test("aHash locality: near-identical docs render to near-identical hashes") {
    val base = (0 until 64).map(i => s"tok$i").mkString(" ")
    val oneOff = base.replace("tok31", "tokX") // 1 of 64 tokens differs
    val different = (0 until 64).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, base), (2L, oneOff), (3L, different), (4L, base))
      .toDF("doc_id", "text")
    val fps = Multimodal.imageAHash(Multimodal.synthesizeBmpCorpus(docs))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(4L), "identical docs must hash identically")
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fps(1L), fps(2L)) <= 3,
      s"one changed token (4 of 256 pixels) must stay within 3 bits, " +
        s"got ${hamming(fps(1L), fps(2L))}")
    assert(hamming(fps(1L), fps(3L)) > 3,
      "an unrelated doc must not collide into the near-dup band")

    // the pair machinery over these fingerprints finds exactly the
    // planted neighborhood
    val pairs = Dedup.hammingNearDupPairs(
        Multimodal.imageAHash(Multimodal.synthesizeBmpCorpus(docs)),
        maxHamming = 3)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs.contains((1L, 4L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("dHash locality, gradient semantics, and exposure invariance") {
    val base = (0 until 64).map(i => s"tok$i").mkString(" ")
    val oneOff = base.replace("tok31", "tokX")
    val different = (0 until 64).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, base), (2L, oneOff), (3L, different), (4L, base))
      .toDF("doc_id", "text")
    val fps = Multimodal.imageDHash(Multimodal.synthesizeBmpCorpus(docs))
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fps(1L) == fps(4L), "identical docs must hash identically")
    assert(hamming(fps(1L), fps(2L)) <= 3,
      s"one changed token must stay local, got ${hamming(fps(1L), fps(2L))}")
    assert(hamming(fps(1L), fps(3L)) > 3,
      "an unrelated doc must not collide into the near-dup band")

    // gradient semantics on a synthetic ramp: luma strictly increasing
    // left-to-right ⇒ every left block mean < right neighbor ⇒ fp == 0;
    // strictly decreasing ⇒ all 64 bits set
    def rampBmp(asc: Boolean): Array[Byte] = {
      val (w, h) = (18, 8)
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val v = if (asc) (x * 255 / (w - 1)) else ((w - 1 - x) * 255 / (w - 1))
        val o = (y * w + x) * 3
        rgb(o) = v.toByte; rgb(o + 1) = v.toByte; rgb(o + 2) = v.toByte
      }
      Codecs.encodeBmp(w, h, rgb)
    }
    val ramps = Seq(
      Multimodal.MediaRecord(10L, "image",
        Multimodal.MediaMeta("image/bmp", 18, 8, 0, 0L), rampBmp(asc = true)),
      Multimodal.MediaRecord(11L, "image",
        Multimodal.MediaMeta("image/bmp", 18, 8, 0, 0L), rampBmp(asc = false))).toDS()
    val rampFps = Multimodal.imageDHash(ramps).as[(Long, Long)].collect().toMap
    assert(rampFps(10L) == 0L, "ascending ramp: no left block brighter than its right")
    assert(rampFps(11L) == -1L, "descending ramp: all 64 comparisons fire")

    // exposure invariance: a uniform brightness shift preserves every
    // gradient comparison (the aHash-vs-dHash differentiator)
    def shifted(bmp: Array[Byte], delta: Int): Array[Byte] = {
      val img = Codecs.decodeBmp(bmp)
      val out = img.rgb.map(b => math.min(255, math.max(0, (b & 0xff) + delta)).toByte)
      Codecs.encodeBmp(img.width, img.height, out)
    }
    def gradBmp(): Array[Byte] = { // non-monotone texture, values ≤ 205
      val (w, h) = (18, 8)
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 37 + y * 53) % 206
        val o = (y * w + x) * 3
        rgb(o) = v.toByte; rgb(o + 1) = v.toByte; rgb(o + 2) = v.toByte
      }
      Codecs.encodeBmp(w, h, rgb)
    }
    val tex = gradBmp()
    val pair = Seq(
      Multimodal.MediaRecord(20L, "image",
        Multimodal.MediaMeta("image/bmp", 18, 8, 0, 0L), tex),
      Multimodal.MediaRecord(21L, "image",
        Multimodal.MediaMeta("image/bmp", 18, 8, 0, 0L), shifted(tex, 50))).toDS()
    val texFps = Multimodal.imageDHash(pair).as[(Long, Long)].collect().toMap
    assert(texFps(20L) == texFps(21L),
      "a +50 uniform exposure shift must not flip any dHash bit")
  }

  test("aHash is partitioning-independent and decodes real bottom-up BMPs") {
    val docs = (0 until 40).map(i => (i.toLong, s"doc $i body " +
      (0 until 20).map(j => s"w$i$j").mkString(" "))).toDF("doc_id", "text")
    val a = Multimodal.imageAHash(Multimodal.synthesizeBmpCorpus(docs))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = Multimodal.imageAHash(
        Multimodal.synthesizeBmpCorpus(docs.repartition(7)))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}

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

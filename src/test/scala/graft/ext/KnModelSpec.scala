package graft.ext

import graft.SparkTestBase

/** The pruned-KN serving artifact ([[KnModel]]): export → parquet
  * round-trip → load → score must equal the in-memory pruned scorer
  * BIT-for-bit (the stored doubles are the scorer's own values), the
  * artifact stays vocabulary-bounded, and the load-side arms replay
  * back-off and OOV exactly. */
class KnModelSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val corpus = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text").limit(120).cache()

  private def scores(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq

  test("export → load → score is bit-identical to the in-memory pruned scorer") {
    val dir = tmpDir("knm-a")
    val eps = 1e-3
    KnModel.export(corpus, eps, dir)
    assert(scores(KnModel.score(spark, dir, corpus)) ==
      scores(NgramLM.knPrunedLogLik(corpus, corpus, eps)),
      "the artifact loop must not move a single bit")
    // the artifact is the bounded deployment surface: entries = the
    // kept set, one backoff row per seen history, one cont row per
    // continuation word
    val (e, b, c) = KnModel.sizes(spark, dir)
    val ent = NgramLM.knPruneEntries(corpus, eps)
      .select("kept").as[Boolean].collect()
    assert(e == ent.count(identity).toLong)
    assert(ent.exists(!_), "the fixture prune must bite")
    val c12 = NgramLM.corpusBigrams(corpus)
      .as[(String, String, Long)].collect()
    assert(b == c12.map(_._1).distinct.length.toLong)
    assert(c == c12.map(_._2).distinct.length.toLong)
  }

  test("eps = 0 artifact reproduces the UNpruned model's scores") {
    val dir = tmpDir("knm-0")
    KnModel.export(corpus, 0.0, dir)
    assert(scores(KnModel.score(spark, dir, corpus)) ==
      scores(NgramLM.knLogLik(corpus, corpus)),
      "γ must reduce to the original back-off weight when nothing prunes")
  }

  test("load-side arms: back-off, unseen history, and OOV replay exactly") {
    // train on a closed corpus, score probes that hit every arm
    val train = Seq((1L, "a b"), (2L, "b a"), (3L, "a c"), (4L, "a b a c"))
      .toDF("doc_id", "text")
    val dir = tmpDir("knm-arms")
    KnModel.export(train, 1e9, dir) // prune everything: γ = 1 everywhere
    val probes = Seq(
      (1L, "a b"),  // seen history, pruned entry → γ·pcont = pcont
      (2L, "z a"),  // unseen history → pcont
      (3L, "a z")   // z never a continuation → OOV
    ).toDF("doc_id", "text")
    val got = scores(KnModel.score(spark, dir, probes))
    def r4(x: Double) = BigDecimal(x).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val cont = NgramLM.corpusBigrams(train)
      .as[(String, String, Long)].collect()
    val bTot = cont.size.toDouble
    def pcont(w: String) = cont.count(_._2 == w) / bTot
    assert(got == Seq(
      (1L, 1L, 0L, r4(math.log(pcont("b")))),
      (2L, 1L, 0L, r4(math.log(pcont("a")))),
      (3L, 1L, 1L, 0.0)), s"arm mismatch: $got")
  }
}

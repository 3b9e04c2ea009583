package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The soft (published-Kudo) unigram-EM path ([[Unigram.emTrainSoft]]
  * and the forward–backward kernel behind it): hand-computable lattice
  * posteriors, the EM likelihood-ascent guarantee under a fixed
  * inventory, agreement with the gated hard-EM path where the
  * posterior is peaked, and the determinism boundary (per-word kernel
  * output exact; only the corpus sum floats). */
class UnigramSoftEmSpec extends SparkTestBase {
  import spark.implicits._

  private def expCounts(word: String,
                        inv: Seq[(String, Double)]): Map[String, Double] =
    Seq(word).toDF("w")
      .select(explode(graft.functions.UnigramFunctions.unigram_expected_counts(
        col("w"), inv.map(_._1), inv.map(_._2))).as("pc"))
      .select("pc.piece", "pc.c").as[(String, Double)].collect().toMap

  test("hand lattice: 'ab' under {a, b, ab} gives the closed-form posteriors") {
    // two segmentations: [ab] with mass θab, [a,b] with mass θa·θb;
    // Z = θab + θa·θb. E[ab] = θab/Z, E[a] = E[b] = θa·θb/Z.
    val (ta, tb, tab) = (0.2, 0.3, 0.5)
    val z = tab + ta * tb
    val got = expCounts("ab", Seq(("a", ta), ("ab", tab), ("b", tb)))
    assert(math.abs(got("ab") - tab / z) < 1e-12)
    assert(math.abs(got("a") - ta * tb / z) < 1e-12)
    assert(math.abs(got("b") - ta * tb / z) < 1e-12)
    // posterior occupancy telescopes: expected pieces ≥ 1, ≤ chars
    val tot = got.values.sum
    assert(tot >= 1.0 - 1e-12 && tot <= 2.0 + 1e-12)
  }

  test("per-word kernel output is deterministic across plans and partitionings") {
    val inv = Seq(("a", 0.15), ("ab", 0.3), ("abc", 0.25), ("b", 0.1),
      ("bc", 0.12), ("c", 0.08))
    val a = expCounts("abcabc", inv)
    val b = expCounts("abcabc", inv)
    assert(a === b, "same word, same inventory ⇒ bit-identical doubles")
  }

  test("EM ascent: corpus log-likelihood is non-decreasing under a fixed inventory") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull).limit(80)
    val counts = WordPiece.wordCounts(docs).cache()
    try {
      // target = topSeed ⇒ the cut can never drop a multi (soft EM
      // gives every piece positive expected count) ⇒ no prune between
      // iterations ⇒ the textbook EM guarantee applies to consecutive
      // LL readings (each measured under the iteration's INPUT θ)
      val res = Unigram.emTrainSoft(counts, topSeed = 12, target = 12,
        maxLen = 4, iters = 4)
      assert(res.logLik.size == 4)
      res.logLik.sliding(2).foreach { case Seq(l0, l1) =>
        assert(l1 >= l0 - 1e-9, s"EM must not decrease LL: ${res.logLik}")
      case _ => ()
      }
      // and the final model genuinely improved on the seed
      assert(res.logLik.last > res.logLik.head,
        s"fixture must actually move the likelihood: ${res.logLik}")
      // θ stays a distribution with every char covered
      val fin = res.pieces
      assert(math.abs(fin.map(_._2).sum - 1.0) < 1e-9)
      assert(fin.forall(_._2 > 0.0))
      val chars = counts.select(explode(split(col("word"), "")).as("c"))
        .filter(col("c") =!= "").distinct().as[String].collect().toSet
      assert(chars.subsetOf(fin.map(_._1).toSet))
    } finally { counts.unpersist(false); () }
  }

  test("peaked posterior: soft EM keeps the same multis as the gated hard path " +
      "on the dominated-substring corpus") {
    // the UnigramEmSpec corpus where hard EM prunes the frequent-but-
    // always-dominated 'ca': the posterior is peaked (piece-count
    // differences dominate), so the published soft estimator must
    // select the same surviving multis
    val docs = ((1 to 10).map(i => (i.toLong, "cab")) ++
      (11 to 18).map(i => (i.toLong, "ca")) ++
      (19 to 27).map(i => (i.toLong, "xy")) ++
      (28 to 30).map(i => (i.toLong, "b"))).toDF("doc_id", "text")
    val counts = WordPiece.wordCounts(docs)
    val hard = Unigram.emTrainFromCounts(counts, 3, 2, 2, iters = 2)
    val soft = Unigram.emTrainSoft(counts, 3, 2, 2, iters = 2)
    def multis(ps: Seq[(String, _)]) =
      ps.map(_._1).filter(_.length >= 2).toSet
    assert(multis(soft.pieces) === multis(hard.pieces),
      s"soft=${soft.pieces} hard=${hard.pieces}")
  }

  // ---- the fixed-point E-step (q212): the soft path under the hash ----

  private def fixedCounts(word: String, inv: Seq[(String, Double)],
                          scale: Long): Map[String, Long] =
    Seq(word).toDF("w")
      .select(explode(graft.functions.UnigramFunctions
        .unigram_expected_counts_fixed(
          col("w"), inv.map(_._1), inv.map(_._2), scale)).as("pc"))
      .select("pc.piece", "pc.c").as[(String, Long)].collect().toMap

  test("fixed-point E-step: hand lattice rounds the closed-form posteriors") {
    val (ta, tb, tab) = (0.2, 0.3, 0.5)
    val z = tab + ta * tb
    val s = 1000000000L
    val got = fixedCounts("ab", Seq(("a", ta), ("ab", tab), ("b", tb)), s)
    def fx(e: Double) = math.floor(e * s + 0.5).toLong
    assert(got("ab") == fx(tab / z))
    assert(got("a") == fx(ta * tb / z))
    assert(got("b") == fx(ta * tb / z))
  }

  test("fixed-point E-step: within 1/scale-per-occurrence of the double kernel") {
    val inv = Seq(("a", 0.15), ("ab", 0.3), ("abc", 0.25), ("b", 0.1),
      ("bc", 0.12), ("c", 0.08))
    val s = 1000000000L
    val word = "abcabcabc"
    val dbl = expCounts(word, inv)
    val fix = fixedCounts(word, inv, s)
    assert(dbl.keySet == fix.keySet)
    // each piece has ≤ len occurrences, each rounded within 0.5/scale
    dbl.foreach { case (p, e) =>
      assert(math.abs(fix(p) - e * s) <= 0.5 * word.length,
        s"piece $p: fixed ${fix(p)} vs double ${e * s}")
    }
  }

  test("full fixed-point EM iteration: hand-computed two-pass lattice") {
    // one word 'ab', seed weights (a:2, ab:5, b:3) → θ0 = (.2, .5, .3);
    // pass 1 posteriors are the closed forms, the M-step renormalizes
    // the ROUNDED integers, pass 2 re-runs the lattice under θ'
    val counts = Seq(("ab", 1L)).toDF("word", "n")
    val s = 1000000000L
    def fx(e: Double) = math.floor(e * s + 0.5).toLong
    val (ta, tb, tab) = (2.0 / 10, 3.0 / 10, 5.0 / 10)
    val z0 = tab + ta * tb
    val e1 = Map("a" -> fx(ta * tb / z0), "b" -> fx(ta * tb / z0),
      "ab" -> fx(tab / z0))
    val tot1 = e1.values.sum
    val (ta1, tb1, tab1) = (e1("a").toDouble / tot1,
      e1("b").toDouble / tot1, e1("ab").toDouble / tot1)
    val z1 = tab1 + ta1 * tb1
    val want = Map("a" -> fx(ta1 * tb1 / z1), "b" -> fx(ta1 * tb1 / z1),
      "ab" -> fx(tab1 / z1))
    val got = Unigram.softEmIterationFixed(counts,
        Seq(("a", 2L), ("ab", 5L), ("b", 3L)), s)
      .as[(String, Long)].collect().toMap
    assert(got == want, s"got $got want $want")
  }

  test("fixed-point iteration degrades gracefully on an empty corpus (r16)") {
    // ADVICE r15: an empty corpus (or posteriors all rounding to zero)
    // left pass 1 with no surviving pieces, and pass 2 then tripped
    // softExpectedCountsFixed's non-empty-inventory require with an
    // opaque IllegalArgumentException — the sibling soft-EM paths
    // degrade to empty/zero results instead. Now: the empty pass-1
    // frame comes back, schema intact.
    val empty = Seq.empty[(String, Long)].toDF("word", "n")
    val out = Unigram.softEmIterationFixed(empty,
      Seq(("a", 2L), ("ab", 5L), ("b", 3L)))
    assert(out.columns.toSeq == Seq("piece", "e_fixed"))
    assert(out.schema("e_fixed").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(out.count() == 0L)
  }

  test("pruned trainer round: Kudo cut keeps singles + top multis, then pass 2 (r16)") {
    // corpus: 'ab' ×3, 'cd' ×1 — piece 'ab' accumulates more expected
    // count than 'cd', so at keepMultiFrac = 0.5 the prune keeps 'ab'
    // and drops 'cd'; every single survives unconditionally
    val counts = Seq(("ab", 3L), ("cd", 1L)).toDF("word", "n")
    val inv = Seq(("a", 2L), ("ab", 5L), ("b", 3L), ("c", 2L),
      ("cd", 5L), ("d", 3L))
    val e1 = Unigram.softExpectedCountsFixed(counts, inv)
      .as[(String, Long)].collect().toMap
    assert(e1("ab") > e1("cd"), "fixture: 'ab' must outweigh 'cd'")
    // expected pass-2: the hand-derived pruned inventory through the
    // plain fixed-point E-step (renormalization lives inside it)
    val inv2 = (e1.filter(_._1.length == 1) + ("ab" -> e1("ab")))
      .toSeq.sortBy(_._1)
    val want = Unigram.softExpectedCountsFixed(counts, inv2)
      .as[(String, Long)].collect().toMap
    val got = Unigram.softEmPrunedIterationFixed(counts, inv,
      keepMultiFrac = 0.5).as[(String, Long)].collect().toMap
    assert(got == want, s"got $got want $want")
    assert(!got.contains("cd"), "the pruned multi must vanish from pass 2")
    // keepMultiFrac = 1.0 prunes nothing: equals the plain iteration
    assert(Unigram.softEmPrunedIterationFixed(counts, inv, 1.0)
        .as[(String, Long)].collect().toMap ==
      Unigram.softEmIterationFixed(counts, inv)
        .as[(String, Long)].collect().toMap)
    // empty corpus degrades like the sibling paths
    assert(Unigram.softEmPrunedIterationFixed(
      Seq.empty[(String, Long)].toDF("word", "n"), inv).count() == 0L)
  }

  test("fixed-point corpus sums are partitioning-invariant (integer, order-free)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull).limit(60)
    val inv = Unigram.trainPieces(docs)
      .map { case (p, cost) => (p, Unigram.CostScale - cost) }
    def run(parts: Int) =
      Unigram.softExpectedCountsFixed(
          WordPiece.wordCounts(docs).repartition(parts), inv)
        .orderBy("piece").as[(String, Long)].collect().toSeq
    assert(run(1) == run(7),
      "integer accumulation must not depend on partitioning or order")
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.VectorFunctions

/** The rank-routing indexed BPE encode ([[graft.functions
  * .BpeApplyMergesIndexed]]): BIT-IDENTICAL to the sequential kernel
  * ([[graft.functions.BpeApplyMerges]]) on trained tables at several
  * depths AND on the adversarial hand cases its rank routing must get
  * right — overlap within a merge, chained merges, pairs RECREATED
  * below the current rank (skipped, as sequential passes would), and a
  * pair adopted at two ranks. */
class BpeIndexedSpec extends SparkTestBase {
  import spark.implicits._

  private def encodeBoth(toks: Seq[String], merges: Seq[(String, String)]): (Seq[String], Seq[String]) = {
    val df = Seq(Tuple1(toks)).toDF("toks")
    val seq = df.select(VectorFunctions.bpe_apply_merges(col("toks"),
      merges.map(_._1), merges.map(_._2)).as("out")).as[Seq[String]].head()
    val idx = df.select(VectorFunctions.bpe_apply_merges_indexed(col("toks"),
      merges.map(_._1), merges.map(_._2)).as("out")).as[Seq[String]].head()
    (seq, idx)
  }

  test("hand cases: overlap, chaining, skipped recreations, duplicate adoption") {
    val cases: Seq[(Seq[String], Seq[(String, String)])] = Seq(
      // left-to-right non-overlap within one merge
      (Seq("a", "a", "a"), Seq(("a", "a"))),
      (Seq("a", "a", "a", "a"), Seq(("a", "a"))),
      // chained merges: "a b" + c
      (Seq("a", "b", "c"), Seq(("a", "b"), ("a b", "c"))),
      // merge 2 CREATES a pair for merge 1 — whose pass is over, so the
      // sequential result keeps ["q", "x y"]; rank routing must skip it
      (Seq("q", "x", "y"), Seq(("q", "x y"), ("x", "y"))),
      // well-formed creation the other way: merge 1 creates merge 2's rhs
      (Seq("q", "x", "y"), Seq(("x", "y"), ("q", "x y"))),
      // chained adjacency after a mid-sequence merge
      (Seq("a", "x", "y", "b", "a", "b"),
        Seq(("a", "b"), ("x", "y"), ("a", "x y"))),
      // the SAME pair at two ranks (the defensive multi-rank routing):
      // rank 1 consumes every occurrence, rank 3 must be a clean no-op
      (Seq("a", "b", "a", "b", "x", "y"),
        Seq(("a", "b"), ("x", "y"), ("a", "b"))),
      // ambiguous creators of the same token string "a b c": only the
      // segmentation the ranks actually produce may win
      (Seq("a", "b", "c", "q", "a", "b", "c"),
        Seq(("b", "c"), ("a", "b c"), ("a", "b"), ("a b", "c"), ("q", "a b c"))),
      // left-neighbor pair formed by a merge
      (Seq("p", "a", "b"), Seq(("a", "b"), ("p", "a b"))),
      // no match / empty / singleton
      (Seq("z"), Seq(("a", "b"))),
      (Seq.empty[String], Seq(("a", "b"))),
      // interleaved ranks across disjoint regions
      (Seq("a", "b", "c", "d", "a", "b"),
        Seq(("c", "d"), ("a", "b"), ("a b", "c d"))))
    cases.foreach { case (toks, merges) =>
      val (seq, idx) = encodeBoth(toks, merges)
      assert(idx == seq, s"toks=$toks merges=$merges\nseq: $seq\nidx: $idx")
    }
  }

  test("null token elements survive both kernels identically") {
    val df = Seq(Tuple1(Seq[String]("a", null, "b", "a", "b"))).toDF("toks")
    val merges = Seq(("a", "b"))
    val seq = df.select(VectorFunctions.bpe_apply_merges(col("toks"),
      merges.map(_._1), merges.map(_._2)).as("out")).as[Seq[String]].head()
    val idx = df.select(VectorFunctions.bpe_apply_merges_indexed(col("toks"),
      merges.map(_._1), merges.map(_._2)).as("out")).as[Seq[String]].head()
    assert(idx == seq, s"seq: $seq idx: $idx")
    assert(seq == Seq("a", null, "b", "a b"))
  }

  test("trained tables at depths 8 / 64 / 160: indexed equals sequential corpus-wide") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val (res, toks) = TextAnalysis.bpeTrainBatched(docs, "doc_id", "text",
      rounds = 160, batchCap = 32)
    toks.unpersist(false)
    val table = res.merges.map(m => (m._2, m._3))
    assert(table.size == 160, s"trained ${table.size} merges")
    Seq(8, 64, 160).foreach { depth =>
      val t = table.take(depth)
      val enc = docs.select(col("doc_id"),
        VectorFunctions.bpe_apply_merges(split(col("text"), " "),
          t.map(_._1), t.map(_._2)).as("seq"),
        VectorFunctions.bpe_apply_merges_indexed(split(col("text"), " "),
          t.map(_._1), t.map(_._2)).as("idx"))
      val bad = enc.filter(not(col("seq") <=> col("idx"))).count()
      assert(bad == 0L, s"depth $depth: $bad docs diverge")
    }
  }

  test("bpeEncodeWithTable conserves text and counts merge applications") {
    val docs = Seq(
      (1L, "a b c a b"),
      (2L, "x"),
      (3L, "a b a b a b")).toDF("doc_id", "text")
    val table = Seq(("a", "b"), ("a b", "c"))
    val out = TextAnalysis.bpeEncodeWithTable(docs, table)
      .orderBy("doc_id")
      .select(col("doc_id"), col("n_raw"), col("n_encoded"),
        array_join(col("toks_encoded"), " ").as("joined"))
      .as[(Long, Long, Long, String)].collect().toSeq
    // encoding only re-segments: the space-joined text is invariant
    assert(out.map(_._4) == Seq("a b c a b", "x", "a b a b a b"))
    assert(out.map(r => (r._2, r._3)) == Seq((5L, 2L), (1L, 1L), (6L, 3L)))
  }

  test("property: both kernels equal a pure-Scala sequential reference on random tables") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // third, independent implementation of the contract: each merge in
    // training order, left-to-right non-overlap within a merge
    def seqRef(toks: Seq[String], merges: Seq[(String, String)]): Seq[String] =
      merges.foldLeft(toks) { case (t, (a, b)) =>
        val out = Seq.newBuilder[String]
        var i = 0
        while (i < t.length) {
          if (i + 1 < t.length && t(i) == a && t(i + 1) == b) {
            out += s"$a $b"; i += 2
          } else { out += t(i); i += 1 }
        }
        out.result()
      }
    val alphabet = Seq("a", "b", "c", "d")
    // merges grow a vocab so later merges can consume earlier outputs
    // (chained tables — the rank-routing's hardest regime); duplicate
    // adoptions arise naturally from re-picking the same pair
    val genTable: Gen[Seq[(String, String)]] = for {
      k <- Gen.choose(1, 10)
      picks <- Gen.listOfN(k, Gen.choose(0, Int.MaxValue - 1))
    } yield {
      var vocab = alphabet.toVector
      picks.map { p =>
        val a = vocab(p % vocab.size)
        val b = vocab((p / vocab.size) % vocab.size)
        vocab = vocab :+ s"$a $b"
        (a, b)
      }
    }
    val genCorpus: Gen[Seq[Seq[String]]] = Gen.nonEmptyListOf(for {
      n <- Gen.choose(0, 20)
      toks <- Gen.listOfN(n, Gen.oneOf(alphabet))
    } yield toks: Seq[String]).map(_.toSeq)
    val prop = Prop.forAll(genCorpus, genTable) { (corpus, table) =>
      val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "toks")
      val got = df.select(col("id"),
          VectorFunctions.bpe_apply_merges(col("toks"),
            table.map(_._1), table.map(_._2)).as("s"),
          VectorFunctions.bpe_apply_merges_indexed(col("toks"),
            table.map(_._1), table.map(_._2)).as("x"))
        .as[(Long, Seq[String], Seq[String])]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      corpus.zipWithIndex.forall { case (toks, i) =>
        val want = seqRef(toks, table)
        got(i.toLong) == ((want, want))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(20)
      .withInitialSeed(org.scalacheck.rng.Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val df = Seq(Tuple1("hello, world! it's 42 degrees")).toDF("text")
    assert(df.select(TextAnalysis.tokenCount($"text")).head().getLong(0) == 5L)
    // hello , world ! it ' s 42 degrees -> 9
    assert(df.select(TextAnalysis.bpeishTokenCount($"text")).head().getLong(0) == 9L)
  }

  test("quality columns: hand-computed row") {
    val df = TextAnalysis.withQuality(Seq((1L, "aa bb aa cc")).toDF("doc_id", "text"))
    val r = df.head()
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(r.getAs[Long]("n_chars") == 11L)
    assert(r.getAs[Long]("n_distinct_tokens") == 3L)
    assert(r.getAs[Double]("avg_token_len") == 2.0)
    assert(r.getAs[Double]("distinct_ratio") == 0.75)
    assert(r.getAs[Double]("punct_ratio") == 0.0)
    val expectedScore = 0.5 * (4.0 / 64.0) + 0.4 * 0.75 + 0.1 * 1.0
    assert(math.abs(r.getAs[Double]("quality_score") - expectedScore) < 1e-15)
  }

  test("language id: hand-labeled snippets") {
    val snippets = Seq(
      (1L, "the cat sat on the mat and looked at the dog", "en"),
      (2L, "der hund ist nicht mit der katze und das ist gut", "de"),
      (3L, "le chat est dans la maison et les enfants sont pour", "fr"),
      (4L, "el perro es una mascota para los que como pero", "es"),
      (5L, "我 是 一个 学生 他 有 的 是 这 在", "zh"),
      (6L, "zzz qqq xxx", "und"))
    val got = TextAnalysis.withLangId(snippets.toDF("id", "text", "expected"))
      .select("expected", "lang_pred").as[(String, String)].collect()
    got.foreach { case (exp, pred) => assert(pred == exp, s"expected $exp got $pred") }
  }

  test("fingerprint: deterministic, order-sensitive, content-sensitive") {
    val df = Seq((1L, "a b c"), (2L, "a c b"), (3L, "a b c"), (4L, "a b d"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.withFingerprint(df)
      .select("doc_id", "fingerprint").as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(3L))   // same text, same fp
    assert(fps(1L) != fps(2L))   // order matters
    assert(fps(1L) != fps(4L))   // content matters
  }

  test("chunking: boundary arithmetic and overlap") {
    def toks(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, toks(64)),   // exactly one chunk
                 (2L, toks(65)),   // spills into a 2nd (17-token) chunk
                 (3L, toks(112)),  // start 48 covers 48..111 -> 2 chunks
                 (4L, toks(113)),  // 3rd chunk of 17
                 (5L, toks(3)))    // short doc: still 1 chunk
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(df, chunkSize = 64, stride = 48)
      .select("doc_id", "chunk_id", "start_tok", "chunk_len")
      .as[(Long, Long, Long, Long)].collect().sorted
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 64L),
      (2L, 0L, 0L, 64L), (2L, 1L, 48L, 17L),
      (3L, 0L, 0L, 64L), (3L, 1L, 48L, 64L),
      (4L, 0L, 0L, 64L), (4L, 1L, 48L, 64L), (4L, 2L, 96L, 17L),
      (5L, 0L, 0L, 3L)))
    // consecutive chunks overlap by chunkSize - stride tokens
    val texts = TextAnalysis.chunkByTokens(df.filter($"doc_id" === 3L))
      .orderBy("chunk_id").select("chunk_text").as[String].collect()
    assert(texts(0).split(" ").drop(48).toSeq == texts(1).split(" ").take(16).toSeq)
  }

  test("inverted index: df band, heap keeps the smallest ids") {
    // 10 docs; "hot" in 9/10 (900‰ > the 800‰ cutoff), singletons under
    // minDf, "alpha"/"mid" in 4 docs each (postings capped at 3)
    val corpus = Seq(
      (1L, "hot alpha"), (2L, "hot alpha"), (3L, "hot mid"), (4L, "hot alpha"),
      (5L, "hot rare"), (6L, "hot mid"), (7L, "hot alpha"), (8L, "hot mid"),
      (9L, "hot beta"), (10L, "x mid")).toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(corpus, minDf = 2, maxDfPermille = 800,
        postingCap = 3)
      .select("token", "df", "postings").as[(String, Long, String)]
      .collect().sortBy(_._1)
    // hot: df 9/10 = 900 permille -> excluded; rare/x/beta: df 1 -> excluded
    assert(got.toSeq == Seq(
      ("alpha", 4L, "1,2,4"),       // capped at the 3 smallest of 1,2,4,7
      ("mid", 4L, "3,6,8")))        // capped at the 3 smallest of 3,6,8,10
  }

  test("co-occurrence: counts match a naive recomputation") {
    val corpus = Seq(
      (1L, "a b c"), (2L, "a b"), (3L, "a c"), (4L, "b c a"), (5L, "a q"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.cooccurrence(corpus, vocabSize = 3, minPairDocs = 2)
      .select("t1", "t2", "pair_docs", "df1", "df2")
      .as[(String, String, Long, Long, Long)].collect().toSet
    // vocab by df desc, token asc: a(5), b(3), c(3); q excluded
    // pairs: (a,b) docs 1,2,4; (a,c) docs 1,3,4; (b,c) docs 1,4
    assert(got == Set(
      ("a", "b", 3L, 5L, 3L), ("a", "c", 3L, 5L, 3L), ("b", "c", 2L, 3L, 3L)))
  }

  test("ngram novelty: unique vs shared 3-grams, short docs drop") {
    val corpus = Seq(
      (1L, "a b c d"),   // grams: "a b c", "b c d"
      (2L, "a b c"),     // gram "a b c" shared with doc 1
      (3L, "x y"))       // < 3 tokens -> no grams
      .toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(corpus, n = 3)
      .select("doc_id", "n_grams", "n_unique")
      .as[(Long, Long, Long)].collect().sorted
    assert(got.toSeq == Seq((1L, 2L, 1L), (2L, 1L, 0L)))
  }

  test("adjacent pair counts: hand-computed merges, single-token docs drop") {
    val corpus = Seq(
      (1L, "a b a b c"), // pairs: (a,b) (b,a) (a,b) (b,c)
      (2L, "a b"),       // (a,b)
      (3L, "z"))         // one token -> no pairs
      .toDF("doc_id", "text")
    val got = TextAnalysis.adjacentPairCounts(corpus, topK = 10)
      .as[(String, String, Long)].collect().toSeq
    // count desc then pair asc — (a,b)=3 first, ties (b,a)/(b,c) in order
    assert(got == Seq(("a", "b", 3L), ("b", "a", 1L), ("b", "c", 1L)))
  }

  test("adjacent pair counts: topK cut is deterministic at the boundary") {
    val corpus = Seq((1L, "p q"), (2L, "p r"), (3L, "p s")).toDF("doc_id", "text")
    val got = TextAnalysis.adjacentPairCounts(corpus, topK = 2)
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("p", "q", 1L), ("p", "r", 1L))) // tie broken by (t1, t2)
  }

  test("stopword lists are disjoint enough for a deterministic argmax") {
    val all = TextAnalysis.stopwords.values.flatten.toSeq
    assert(all.size == all.toSet.size, "stopword appearing in two languages breaks scoring")
  }

  test("vocabGrowth: hand-computed curve; duplicated corpus flattens vocabulary") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),     // cp 2: 3 new types, 3 tokens
      (2L, "a b d"),     // cp 2: 1 new type (d)
      (3L, "e f"),       // cp 4: 2 new
      (4L, "a e g"),     // cp 4: 1 new (g)
      (5L, "a b c"))     // cp 6: 0 new
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs, every = 2L)
      .orderBy("checkpoint")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 2L, 6L, 4L), (4L, 4L, 11L, 7L), (6L, 5L, 14L, 7L)))
    // determinism under repartition
    val again = TextAnalysis.vocabGrowth(docs.repartition(4), every = 2L)
      .orderBy("checkpoint").as[(Long, Long, Long, Long)].collect().toSeq
    assert(again == got)
    // a fully-duplicated corpus: vocab flat after the first checkpoint
    val dup = (1L to 20L).map(i => (i, "x y z")).toDF("doc_id", "text")
    val flat = TextAnalysis.vocabGrowth(dup, every = 5L)
      .orderBy("checkpoint").as[(Long, Long, Long, Long)].collect().toSeq
    assert(flat.forall(_._4 == 3L), s"duplication must flatten vocab: $flat")
    assert(flat.map(_._2) == Seq(5L, 10L, 15L, 20L))
  }

  test("property: repetitionProfile equals a sequential reference on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // small alphabet forces real repetition; lengths cover every n-gram
    // boundary case (0-gram docs, exactly-n docs, long docs)
    val genDoc = for {
      n <- Gen.choose(1, 14)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield toks.mkString(" ")
    val genCorpus = Gen.nonEmptyListOf(genDoc)
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong + 1, t) })
    def refRow(text: String): (Long, Double, Double, Double, Double) = {
      val t = text.split(" ")
      val n = t.length.toLong
      def grams(k: Int) = t.sliding(k).filter(_.length == k).map(_.mkString(" ")).toSeq
      def top(k: Int) =
        if (n < k) 0L else grams(k).groupBy(identity).values.map(_.size).max.toLong
      def dup(k: Int) =
        if (n < k) 0L
        else grams(k).groupBy(identity).values.filter(_.size >= 2).map(_.size).sum.toLong
      def r4(x: Double) = math.rint(x * 10000) / 10000
      (n, r4(top(1) * 1.0 / n), r4(top(2) * 2.0 / n),
        r4(dup(3).toDouble / math.max(n - 2, 1)),
        r4(dup(5).toDouble / math.max(n - 4, 1)))
    }
    val prop = Prop.forAll(genCorpus) { corpus =>
      val got = TextAnalysis.repetitionProfile(corpus.toDF("doc_id", "text"))
        .select("doc_id", "n_tokens", "top_unigram_frac", "top_bigram_frac",
          "dup_3gram_frac", "dup_5gram_frac")
        .as[(Long, Long, Double, Double, Double, Double)]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
      corpus.forall { case (id, text) => got(id) == refRow(text) }
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(12)
      .withInitialSeed(org.scalacheck.rng.Seed(42L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("pmiCollocations: planted collocation scores hand-computed PMI") {
    import spark.implicits._
    // "x y" ×4; filler docs contribute unigrams but no repeated bigram
    val docs = ((1L to 4L).map(i => (i, "x y")) ++
      (5L to 8L).map(i => (i, s"p$i q$i r$i s$i"))).toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, minCount = 2L, topK = 10)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got.size == 1)
    val (t1, t2, cxy, cx, cy, pmi) = got.head
    assert((t1, t2, cxy, cx, cy) == (("x", "y", 4L, 4L, 4L)))
    // N_uni = 24, N_bi = 16 → pmi = ln(4·24·24 / (16·4·4)) = ln 9
    assert(pmi == math.rint(math.log(9.0) * 10000) / 10000)
    // deterministic under repartition
    val again = TextAnalysis.pmiCollocations(docs.repartition(4),
      minCount = 2L, topK = 10).as[(String, String, Long, Long, Long, Double)]
      .collect().toSeq
    assert(again == got)
  }

  test("qualityDrift: identical slices → zero PSI; planted drift detected") {
    import spark.implicits._
    def doc(i: Long, n: Int) = (i, (0 until n).map(j => s"w${i}_$j").mkString(" "))
    val a = (1L to 40L).map(i => doc(i, 20)).toDF("doc_id", "text")
    // identical distribution (different ids, same shape) → PSI = 0 per bin
    val a2 = (101L to 140L).map(i => doc(i, 20)).toDF("doc_id", "text")
    val same = TextAnalysis.qualityDrift(a, a2, buckets = 10)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(same.length == 10, "every bucket of the grid must be present")
    assert(same.forall(_._4 == 0L), s"identical shapes must give PSI 0: ${same.toSeq}")
    // drifted side: much longer docs → higher length score → upper buckets
    val b = (1L to 40L).map(i => doc(i, 70)).toDF("doc_id", "text")
    val drift = TextAnalysis.qualityDrift(a, b, buckets = 10)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(drift.map(_._4).sum > 0L, s"drift must be positive: ${drift.toSeq}")
    assert(drift.map(_._2).sum == 40L && drift.map(_._3).sum == 40L)
    // partitioning independence
    val again = TextAnalysis.qualityDrift(a.repartition(5), b.repartition(3),
        buckets = 10).as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq == drift.toSeq)
  }

  test("zipfFit: exact-Zipf corpus → slope ≈ −1, r2 ≈ 1; deterministic") {
    import spark.implicits._
    // term r appears ⌊2520/r⌋ times (2520 divisible by 1..10 ⇒ exact)
    val rows = (1 to 10).flatMap(r => Seq.fill(2520 / r)(s"t$r"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val docs = rows.toDF("doc_id", "text")
    val got = TextAnalysis.zipfFit(docs, topV = 10)
      .as[(Long, Double, Double, Double)].head()
    assert(got._1 == 10L)
    assert(got._2 > -1.01 && got._2 < -0.99, s"slope ${got._2}")
    assert(got._4 > 0.999, s"r2 ${got._4}")
    // intercept ≈ ln(2520) ≈ 7.832
    assert(math.abs(got._3 - math.log(2520.0)) < 0.02, s"intercept ${got._3}")
    val again = TextAnalysis.zipfFit(docs.repartition(6), topV = 10)
      .as[(Long, Double, Double, Double)].head()
    assert(again == got)
    // fewer terms than topV: n_terms = vocabulary size
    val small = Seq((1L, "a a b")).toDF("doc_id", "text")
    assert(TextAnalysis.zipfFit(small, topV = 200)
      .as[(Long, Double, Double, Double)].head()._1 == 2L)
  }

  test("repetitionProfile: hand-computed fractions, flag, short-doc zeros") {
    import spark.implicits._
    val docs = Seq(
      // 8 tokens; "a" ×4 → top1 = 4/8 = .5; "a b" ×3 → top2 = 6/8 = .75;
      // "a b a" ×2 + "b a b" ×2 of 6 slots → dup3 = 4/6; no dup 5-gram
      (1L, "a b a b a b c a"),
      // uniform doc: top1 1/6, top2 2/6, no dups anywhere
      (2L, "p q r s t u"),
      // shorter than 5 tokens: dup5 reads 0, others still compute
      (3L, "x x x"),
      // dup 5-gram: "k l m n o" twice in 10 tokens → slots 1,6 of 6 → .3333
      (4L, "k l m n o k l m n o"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionProfile(docs).orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double, Double, Boolean)].collect().toSeq
    assert(got(0) == ((1L, 8L, 0.5, 0.75, 0.6667, 0.0, true)))
    assert(got(1) == ((2L, 6L, 0.1667, 0.3333, 0.0, 0.0, true))) // top2 2/6 > .15
    assert(got(2) == ((3L, 3L, 1.0, 1.3333, 0.0, 0.0, true)))
    assert(got(3) == ((4L, 10L, 0.2, 0.4, 0.75, 0.3333, true)))
    // a clean doc under permissive thresholds is not flagged
    val clean = TextAnalysis.repetitionProfile(docs,
        maxTopUnigramFrac = 1.0, maxTopBigramFrac = 2.0,
        maxDupTrigramFrac = 2.0, maxDupFivegramFrac = 1.0)
      .orderBy("doc_id").select("repetitive").as[Boolean].collect().toSeq
    assert(clean == Seq(false, false, false, false))
    // partitioning independence
    val again = TextAnalysis.repetitionProfile(docs.repartition(4)).orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double, Double, Boolean)].collect().toSeq
    assert(again == got)
  }

  test("gopherRules: hand-computed signals, per-rule booleans, boundary exactness") {
    val docs = Seq(
      // 1: passes EVERY rule (minWords=2, maxWords=10): 10 words, mean
      // len 3.6, all alpha, 'the' ×2 = 2 stopwords, dominance at the
      // EXACT boundary (5·2 = 10), 9 distinct bigrams
      (1L, "the quick brown fox jumps the lazy dog ok yes"),
      // 2: word-count fail only path is exercised via minWords below
      (2L, "aa aa aa aa bb"), // dominance fail: 5·4 > 5
      (3L, "x1 y2 z3 w4 v5"), // alpha fail: 0 alpha words
      (4L, "abcdefghijklmnop qrstuvwxyzabcdef"), // mean word len 16 > 10
      (5L, "ab ab ab ab ab ab"), // repetition: 5 bigrams, 1 distinct → fail
      (6L, "")) // empty text: zero words, bigrams; rules degenerate
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, minWords = 2, maxWords = 10,
        stops = Seq("the"))
      .orderBy("doc_id").collect()
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(got.length == 6)
    val r1 = byId(1L)
    assert(r1.getAs[Long]("n_words") == 10 && r1.getAs[Long]("n_stopwords") == 2)
    assert(r1.getAs[Long]("max_word_count") == 2) // dominance boundary: 5·2 = 10
    assert(r1.getAs[Boolean]("keep"))
    assert(byId(2L).getAs[Long]("max_word_count") == 4 &&
      !byId(2L).getAs[Boolean]("r_dominance"))
    assert(!byId(3L).getAs[Boolean]("r_alpha_ratio") &&
      byId(3L).getAs[Long]("n_alpha_words") == 0)
    assert(!byId(4L).getAs[Boolean]("r_mean_word_len") &&
      byId(4L).getAs[Long]("sum_word_chars") == 32)
    val r5 = byId(5L)
    assert(r5.getAs[Long]("n_bigrams") == 5 && r5.getAs[Long]("n_distinct_bigrams") == 1)
    assert(!r5.getAs[Boolean]("r_repetition"))
    val r6 = byId(6L)
    assert(r6.getAs[Long]("n_words") == 0 && r6.getAs[Long]("n_bigrams") == 0)
    assert(!r6.getAs[Boolean]("r_word_count") && r6.getAs[Boolean]("r_repetition"))
    // boundary exactness: mean word length EXACTLY 3 and EXACTLY 10 pass
    val edge = Seq((1L, "abc def"), (2L, "abcdefghij klmnopqrst"))
      .toDF("doc_id", "text")
    val e = TextAnalysis.gopherRules(edge, minWords = 1).orderBy("doc_id").collect()
    assert(e.forall(_.getAs[Boolean]("r_mean_word_len")))
  }
}

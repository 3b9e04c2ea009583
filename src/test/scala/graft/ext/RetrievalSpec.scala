package graft.ext

import graft.SparkTestBase

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  // the BM25 formula re-derived in plain scala math, independent of the
  // Spark plan (same role as the hand-computed oracles elsewhere)
  private def score(terms: Seq[(Long, Long)], n: Long, avgdl: Double, dl: Long,
                    k1: Double = 1.2, b: Double = 0.75): Double =
    round4(terms.map { case (tf, df) =>
      val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
      val tfn = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
      idf * tfn
    }.sum)

  test("bm25TopK: hand-computed scores, rank order, k truncation") {
    val docs = Seq((1L, "x y"), (2L, "x x z"), (3L, "w")).toDF("doc_id", "text")
    val q = Seq((10L, "x"), (10L, "z"), (10L, "x")).toDF("query_id", "term") // dup term collapses
    val got = Retrieval.bm25TopK(docs, q, k = 5)
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4).toSeq
    // N=3, avgdl=2; doc2 hits x(tf=2,df=2) and z(tf=1,df=1), doc1 only x
    val s2 = score(Seq((2L, 2L), (1L, 1L)), 3, 2.0, dl = 3)
    val s1 = score(Seq((1L, 2L)), 3, 2.0, dl = 2)
    assert(got == Seq((10L, 2L, s2, 1L), (10L, 1L, s1, 2L)))
    val top1 = Retrieval.bm25TopK(docs, q, k = 1).as[(Long, Long, Double, Long)].collect()
    assert(top1.toSeq == Seq((10L, 2L, s2, 1L)))
  }

  test("bm25TopK: ties on rounded score break by doc_id asc; self-doc excluded") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b")).toDF("doc_id", "text")
    // query_id = 2 collides with a doc_id -> doc 2 must not retrieve itself
    val q = Seq((2L, "a")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(docs, q, k = 5)
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4).toSeq
    assert(got.map(_._2) == Seq(1L, 3L)) // identical docs: id-asc tie order
    assert(got.map(_._3).distinct.size == 1)
  }

  test("probeQueries: every-th doc, distinct first-width tokens") {
    val docs = Seq(
      (0L, "a b a c d"), (1L, "z z"), (2L, "p q"), (3L, "r"), (4L, "s s s")
    ).toDF("doc_id", "text")
    val got = Retrieval.probeQueries(docs, every = 2, width = 3)
      .as[(Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    // doc 0: first 3 tokens "a b a" -> {a, b}; doc 2: {p, q}; doc 4: {s}
    assert(got == Seq((0L, "a"), (0L, "b"), (2L, "p"), (2L, "q"), (4L, "s")))
  }

  test("bm25TopK: query term absent from the corpus contributes nothing") {
    val docs = Seq((1L, "x y"), (2L, "y z")).toDF("doc_id", "text")
    val q = Seq((10L, "nope"), (10L, "x")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(docs, q, k = 5)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(1L)) // only the x-posting doc scores
  }

  private def rrfContrib(rank: Long, c: Long = 60L): Long =
    1000000000000L / (c + rank)

  test("rrfFuse: hand-computed integer fusion, both-list docs outrank single-list") {
    // doc 5 is rank 2 in BOTH lists; doc 1 is rank 1 in one list only.
    // RRF: 2/(60+2) units > 1/(60+1) units — presence in both channels wins.
    val lex = Seq((10L, 1L, 1L), (10L, 5L, 2L)).toDF("query_id", "doc_id", "rank")
    val den = Seq((10L, 7L, 1L), (10L, 5L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(lex, den), k = 10)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4).toSeq
    val exp = Seq(
      (10L, 5L, 2 * rrfContrib(2), 1L),   // in both lists
      (10L, 1L, rrfContrib(1), 2L),       // single list, rank 1; tie vs doc 7
      (10L, 7L, rrfContrib(1), 3L))       //   broken by doc_id asc
    assert(got == exp)
  }

  test("rrfFuse: k truncation and per-query independence") {
    val l1 = Seq((1L, 100L, 1L), (1L, 101L, 2L), (2L, 200L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(l1), k = 1)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(got == Seq((1L, 100L, rrfContrib(1), 1L), (2L, 200L, rrfContrib(1), 1L)))
  }

  test("rrfFuse: fused score is exact-integer (floor division), no float drift") {
    // 10^12 / 61 = 16393442622.95… -> floor 16393442622
    val l = Seq((1L, 9L, 1L)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(l), k = 5).as[(Long, Long, Long, Long)].collect()
    assert(got.head._3 == 16393442622L)
  }

  private def phrases(ps: (Long, String)*) =
    ps.toSeq.toDF("phrase_id", "phrase")

  test("phraseSearch: verbatim occurrences only — order matters, bags don't match") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "brown quick the fox"),        // same bag, wrong order
      (3L, "x the quick brown fox y the quick brown fox"), // twice, offset
      (4L, "the quick brown")).toDF("doc_id", "text") // prefix only
    val got = Retrieval.phraseSearch(docs, phrases(7L -> "the quick brown fox"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq((7L, 1L, 1L, 0L), (7L, 3L, 2L, 1L)),
      s"doc 2 (permuted bag) and doc 4 (prefix) must not match: $got")
  }

  test("phraseSearch: a phrase with a REPEATED token needs the repetition aligned") {
    val docs = Seq(
      (1L, "a b a c"),   // contains "a b a"
      (2L, "a b c a"),   // has both tokens but not "a b a"
      (3L, "b a b a b")) // "a b a" at start 1
      .toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, phrases(1L -> "a b a"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq((1L, 1L, 1L, 0L), (1L, 3L, 1L, 1L)), got.toString)
  }

  test("phraseSearch: overlapping self-similar occurrences all count") {
    val docs = Seq((1L, "z z z z")).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, phrases(1L -> "z z"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 3L, 0L)), s"starts 0,1,2 all match: $got")
  }

  test("phraseSearch: multiple phrases resolve independently; no-match phrases emit nothing") {
    val docs = Seq((1L, "p q r"), (2L, "q r s")).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs,
        phrases(1L -> "q r", 2L -> "never present"))
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq((1L, 1L, 1L, 1L), (1L, 2L, 1L, 0L)), got.toString)
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The exact unigram-Viterbi kernel
  * ([[graft.functions.UnigramViterbiStats]]) and inventory derivation
  * ([[Unigram]]): hand-computed DP optima (including a case where
  * greedy maximum-munch is suboptimal), fallback costing, piece-count
  * recovery, and partitioning invariance on a corpus slice. */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private val K = Unigram.CostScale

  private def stats(text: String, inv: Seq[(String, Long)]): (Long, Long, Long) = {
    val pieces = inv.map { case (p, w) => (p, K - w) }
    val r = Unigram.viterbiStats(
      Seq((1L, text)).toDF("doc_id", "text"), pieces).head()
    (r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("hand-computed DP optima") {
    // tie on piece count → the weight sum decides: a+bc (101) beats ab+c (11)
    assert(stats("abc", Seq(("a", 1L), ("ab", 10L), ("bc", 100L), ("c", 1L)))
      === ((1L, 2 * K - 101, 2L)))
    // fewer pieces dominates any weight: abcd (1) beats ab+cd (100)
    assert(stats("abcd", Seq(("abcd", 1L), ("ab", 50L), ("cd", 50L)))
      === ((1L, K - 1, 1L)))
    // greedy maximum-munch is SUBOPTIMAL here: munch takes abcd then the
    // cost-K fallback on uncovered 'e' (2K−1); Viterbi finds ab+cde (2K−100)
    assert(stats("abcde", Seq(("abcd", 1L), ("ab", 50L), ("cde", 50L)))
      === ((1L, 2 * K - 100, 2L)))
    // no piece matches anywhere: every char rides the cost-K fallback
    assert(stats("xyz", Seq(("a", 5L))) === ((1L, 3 * K, 3L)))
    // multi-word accumulation + empty-token skip (doubled space)
    assert(stats("ab  ab", Seq(("ab", 7L))) === ((2L, 2 * K - 14, 2L)))
  }

  test("corpus slice: invariance, bounds, and inventory determinism") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull).limit(60)
    val inv = Unigram.trainPieces(docs)
    assert(inv == Unigram.trainPieces(docs), "derivation must be deterministic")
    // all single chars present; costs positive and below K
    assert(inv.forall { case (_, c) => c > 0 && c < K })
    val chars = docs.select(explode(split(col("text"), "")).as("c"))
      .filter(col("c") =!= "" && col("c") =!= " ").distinct().as[String].collect().toSet
    assert(chars.subsetOf(inv.map(_._1).toSet))
    val a = Unigram.viterbiStats(docs, inv).orderBy("doc_id").collect().toSeq
    val b = Unigram.viterbiStats(docs.repartition(7), inv).orderBy("doc_id").collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq), "partitioning must not change the DP")
    a.foreach { r =>
      val (nw, cost, np) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(np >= nw, "every word is at least one piece")
      assert(cost > (np - 1) * K && cost < np * K,
        "cost must sit inside its piece-count band (weights in (0, K))")
    }
  }
}

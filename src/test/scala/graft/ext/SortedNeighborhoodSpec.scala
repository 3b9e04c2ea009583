package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Dedup.sortedNeighborhoodPairs]] against a plain-Scala sequential
  * reference: same total order, same successor comb, same exact-Jaccard
  * verify. */
class SortedNeighborhoodSpec extends SparkTestBase {
  import spark.implicits._

  // (id, lang, text): near-dup pairs share lang and near-identical
  // length, so they sort adjacently — the property blocking relies on
  private def corpus: Seq[(Long, String, String)] = {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val dups = (0 until 6).map { i =>
      (10L + i, "en", if (i % 2 == 0) base else base + " extra")
    }
    val noise = (0 until 40).map { i =>
      val words = (0 until 8 + i % 5).map(j => s"w${i}_$j").mkString(" ")
      (100L + i, if (i % 3 == 0) "de" else "en", words)
    }
    dups ++ noise
  }

  private def shingleSet(text: String, n: Int): Set[String] = {
    val toks = text.split(" ")
    if (toks.length < n) Set(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  private def reference(rows: Seq[(Long, String, String)], window: Int,
                        threshold: Double): Seq[(Long, Long, Double)] = {
    val sorted = rows.sortBy(r => (r._2, r._3.length, r._1))
      .map(r => (r._1, shingleSet(r._3, 3)))
    for {
      i <- sorted.indices
      j <- (i + 1) to math.min(i + window, sorted.length - 1)
      inter = (sorted(i)._2 & sorted(j)._2).size
      union = (sorted(i)._2 | sorted(j)._2).size
      jac = inter.toDouble / union
      if jac >= threshold
    } yield (math.min(sorted(i)._1, sorted(j)._1),
      math.max(sorted(i)._1, sorted(j)._1), jac)
  }

  test("matches the sequential sorted-neighborhood reference") {
    val rows = corpus
    val docs = rows.toDF("doc_id", "lang", "text")
      .withColumn("n_chars", length(col("text")))
    val got = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
        Seq(col("lang"), col("n_chars")), window = 4, threshold = 0.5)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val want = reference(rows, window = 4, threshold = 0.5)
      .sortBy(r => (r._1, r._2))
    assert(got.map(r => (r._1, r._2)) == want.map(r => (r._1, r._2)),
      s"pair sets differ: got $got want $want")
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._3 - w._3) < 1e-12,
        s"jaccard mismatch on (${g._1}, ${g._2})")
    }
    assert(got.nonEmpty, "fixture must produce verified pairs")
  }

  test("result is partitioning-independent and window-bounded") {
    val docs = corpus.toDF("doc_id", "lang", "text")
      .withColumn("n_chars", length(col("text")))
    val a = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
        Seq(col("lang"), col("n_chars")), window = 4, threshold = 0.5,
        numBuckets = 5)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val b = Dedup.sortedNeighborhoodPairs(docs.repartition(7), "doc_id",
        "text", Seq(col("lang"), col("n_chars")), window = 4, threshold = 0.5)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(a == b, "rank must not depend on input partitioning")

    // window=1 can only pair immediate sort neighbors — a strict subset
    val w1 = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
        Seq(col("lang"), col("n_chars")), window = 1, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(w1.subsetOf(a.toSet))
  }

  test("empty and null-free corpora do not break the rank") {
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
      .withColumn("n_chars", length(col("text")))
    assert(Dedup.sortedNeighborhoodPairs(empty, "doc_id", "text",
      Seq(col("lang"), col("n_chars")), window = 3, threshold = 0.5).count() == 0)
  }
}

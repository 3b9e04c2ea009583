package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.streaming.{VocabStream, VocabStreamConfig}

/** The counts-grain (character-level) BPE trainer
  * ([[TextAnalysis.bpeTrainFromCounts]]) and its maintained-store path
  * ([[graft.streaming.VocabStream.bpeMerges]]): hand-derivable merges
  * incl. the dirty-token skip, exact equivalence to the corpus-grain
  * batched trainer over the replicated char corpus (the weighting
  * law), input-partitioning invariance, the map-only encode against a
  * sequential per-word reference fold, and store derivations invariant
  * under fold order, replays, and a rebuild from scratch. */
class BpeCountsSpec extends SparkTestBase {
  import spark.implicits._

  private def mergeRows(df: org.apache.spark.sql.DataFrame) =
    df.as[(Int, String, String, Long)].collect().toSeq

  test("hand case: weighted argmax, dirty-token skip, exhaustion") {
    // counts: aab×3, ab×2, b×5 → char pairs (a,b) 3+2=5, (a,a) 3.
    // Window 1 (cap 4): adopt (a,b); (a,a) SKIPPED — `a` is dirty.
    // Window 2: aab → [a, "a b"], ab → ["a b"] → only pair (a, "a b") 3.
    // Window 3: no pair left → exhausted at 2 merges.
    val counts = Seq(("aab", 3L), ("ab", 2L), ("b", 5L)).toDF("word", "n")
    val got = mergeRows(TextAnalysis.bpeMergesFromCounts(counts,
      rounds = 8, batchCap = 4))
    assert(got == Seq((1, "a", "b", 5L), (2, "a", "a b", 3L)),
      s"hand-derived merge table mismatch: $got")
  }

  test("weighting law: counts-grain ≡ corpus-grain over the replicated char corpus") {
    // a (word, n) frame is EXACTLY a corpus of n copies of the word's
    // char sequence — the two trainers must emit identical tables,
    // window for window (same spectra → same greedy).
    val counts = WordPiece.wordCounts(
      graft.core.Tables.documents(spark, "/root/testdata/sf0.001"))
    val chars = counts.as[(String, Long)].collect().toSeq
      .flatMap { case (w, n) => (1L to n).map(i => (w, i)) }
      .zipWithIndex
      .map { case ((w, _), i) => (i.toLong, w.mkString(" ")) }
    val charDocs = chars.toDF("doc_id", "text").repartition(8)
    val fromCounts = mergeRows(TextAnalysis.bpeMergesFromCounts(counts,
      rounds = 24, batchCap = 8))
    val fromCorpus = mergeRows(TextAnalysis.bpeMergesBatched(charDocs,
      rounds = 24, batchCap = 8))
    assert(fromCounts == fromCorpus,
      s"counts-grain must equal corpus-grain\ncounts: $fromCounts\ncorpus: $fromCorpus")
  }

  test("merge table is invariant under count-frame partitioning") {
    val counts = WordPiece.wordCounts(
      graft.core.Tables.documents(spark, "/root/testdata/sf0.001"))
    val a = mergeRows(TextAnalysis.bpeMergesFromCounts(counts, rounds = 16, batchCap = 4))
    val b = mergeRows(TextAnalysis.bpeMergesFromCounts(
      counts.repartition(7), rounds = 16, batchCap = 4))
    assert(a == b, "adoption must not depend on partitioning")
  }

  /** Sequential per-word reference: apply each merge left-to-right
    * non-overlapping, in training order — the oracle's fold in Scala. */
  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var toks: Seq[String] = word.map(_.toString)
    merges.foreach { case (a, b) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += s"$a $b"; i += 2
        } else { out += toks(i); i += 1 }
      }
      toks = out.toSeq
    }
    toks
  }

  test("map-only encode equals the sequential per-word reference") {
    val docs = Seq(
      (1L, "aab ab b aab"),
      (2L, "b"),
      (3L, "aab  aab"), // double space → empty token filtered
      (4L, "zzz"), // untouched by any merge
      (5L, "")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("a", "a b"))
    val got = TextAnalysis.bpeEncodeWords(docs, merges)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    val want = Seq(
      (1L, "aab ab b aab"), (2L, "b"), (3L, "aab  aab"), (4L, "zzz"), (5L, ""))
      .map { case (id, text) =>
        val words = text.split(" ").filter(_.nonEmpty).toSeq
        (id, words.size.toLong, words.map(_.length.toLong).sum,
          words.map(w => refEncode(w, merges).size.toLong).sum)
      }
    assert(got == want, s"encode mismatch\ngot:  $got\nwant: $want")
  }

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("store path: fold order, replays, compaction and a rebuild all derive the identical table") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(120).cache()
    def third(k: Int) = corpus.filter(col("doc_id") % 3 === k)
    val oneShot = mergeRows(TextAnalysis.bpeMergesFromCounts(
      WordPiece.wordCounts(corpus), rounds = 24, batchCap = 8))

    // store A: in-order folds with a pre-compaction replay
    val stA = tmpDir("bpes-a"); val cfgA = VocabStreamConfig(
      s"$stA/_in_unused", stA, s"$stA/_ck_unused", schema)
    VocabStream.processBatch(third(0), 0L, cfgA)
    VocabStream.processBatch(third(1), 1L, cfgA)
    VocabStream.processBatch(third(1), 1L, cfgA) // replay: must not double
    VocabStream.compact(spark, stA, upToBatch = 1L)
    VocabStream.processBatch(third(2), 2L, cfgA)
    assert(mergeRows(VocabStream.bpeMerges(spark, stA, rounds = 24, batchCap = 8))
      == oneShot, "store-derived table must equal the one-shot table")

    // store B (the RESTART/rebuild): different fold split, different
    // order, no compaction — additive counts are arrival-order-free,
    // so the derived table is identical
    val stB = tmpDir("bpes-b"); val cfgB = VocabStreamConfig(
      s"$stB/_in_unused", stB, s"$stB/_ck_unused", schema)
    VocabStream.processBatch(corpus.filter(col("doc_id") % 2 === 1), 0L, cfgB)
    VocabStream.processBatch(corpus.filter(col("doc_id") % 2 === 0), 1L, cfgB)
    assert(mergeRows(VocabStream.bpeMerges(spark, stB, rounds = 24, batchCap = 8))
      == oneShot, "rebuilt store must derive the identical table")
    corpus.unpersist()
  }

  // the TVF faces (bpe_merges_store → bpe_encode_words) are covered in
  // DocSqlSpec, whose session loads GraftExtensions.
}

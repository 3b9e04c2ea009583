package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.VectorFunctions

/** The batched BPE trainer ([[TextAnalysis.bpeMergesBatched]]):
  * batchCap = 1 must be BIT-IDENTICAL to the sequential trainer; the
  * rewrite expression must equal the sequential per-merge fold on
  * overlap and chaining edge cases; window provenance must replay. */
class BpeBatchedSpec extends SparkTestBase {
  import spark.implicits._

  private def docsFixture = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the cat"),
    (3L, "a cat and the cat sat down"),
    (4L, "on the mat the cat sat"),
    (5L, "the mat sat on a cat"),
    (6L, "sat sat sat the cat")).toDF("doc_id", "text")

  private def mergeRows(df: org.apache.spark.sql.DataFrame) =
    df.as[(Int, String, String, Long)].collect().toSeq

  test("batchCap = 1 is bit-identical to the sequential trainer (8 rounds)") {
    val seq8 = mergeRows(TextAnalysis.bpeMerges(docsFixture, rounds = 8))
    val bat8 = mergeRows(TextAnalysis.bpeMergesBatched(docsFixture, rounds = 8, batchCap = 1))
    assert(bat8 == seq8, s"batchCap=1 must equal sequential\nseq: $seq8\nbat: $bat8")
  }

  test("batched first merges equal sequential on the documents table") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val seq3 = mergeRows(TextAnalysis.bpeMerges(docs, rounds = 3))
    val bat = mergeRows(TextAnalysis.bpeMergesBatched(docs, rounds = 32, batchCap = 32))
    assert(bat.take(3) == seq3,
      s"first 3 merges must match sequential\nseq: $seq3\nbat: ${bat.take(3)}")
    assert(bat.size == 32 && bat.map(_._1) == (1 to 32),
      "depth run yields densely-numbered rounds")
  }

  test("BpeApplyMerges equals sequential single-merge folds (overlap + chaining)") {
    // "a a a" merges left-to-right non-overlapping: one "a a", one a
    val cases = Seq(
      (Seq("a", "a", "a"), Seq(("a", "a")), Seq("a a", "a")),
      // chained: ("a","b") then ("a b","c") — later merge sees the
      // earlier rewrite (the sequential recurrence)
      (Seq("a", "b", "c", "a", "b"), Seq(("a", "b"), ("a b", "c")),
        Seq("a b c", "a b")),
      // second merge shares no token — independent rewrite
      (Seq("x", "y", "a", "a"), Seq(("a", "a"), ("x", "y")),
        Seq("x y", "a a")),
      // no match at all — identity
      (Seq("q"), Seq(("a", "b")), Seq("q")),
      (Seq.empty[String], Seq(("a", "b")), Seq.empty[String]))
    cases.foreach { case (toks, merges, want) =>
      val got = Seq(Tuple1(toks)).toDF("toks")
        .select(VectorFunctions.bpe_apply_merges(col("toks"),
          merges.map(_._1), merges.map(_._2)).as("out"))
        .as[Seq[String]].head()
      assert(got == want, s"toks=$toks merges=$merges got=$got want=$want")
    }
  }

  test("within a window, token-disjoint adoptions carry exact window-start counts") {
    // every adopted merge's pair_count must equal the count of that pair
    // in the window-start spectrum slice it was adopted from
    val (res, toks) = TextAnalysis.bpeTrainBatched(
      docsFixture, "doc_id", "text", rounds = 12, batchCap = 4)
    toks.unpersist(false)
    val byWindow = res.windows.toMap
    // reconstruct which window each merge came from: windows adopt in
    // order, ≤ batchCap each
    var remaining = res.merges
    byWindow.keys.toSeq.sorted.foreach { w =>
      val slice = byWindow(w).map { case (a, b, c) => (a, b) -> c }.toMap
      val inWindow = remaining.takeWhile { case (_, a, b, c) =>
        slice.get((a, b)).contains(c) }
      assert(inWindow.nonEmpty || remaining.isEmpty,
        s"window $w adopted nothing traceable")
      remaining = remaining.drop(math.max(inWindow.size, 1))
    }
    // adoption never exceeds the cap per window
    assert(res.merges.size == 12)
    assert(res.windows.forall(_._2.size <= 8 * 4), "slice bounded by scanCap")
  }
}

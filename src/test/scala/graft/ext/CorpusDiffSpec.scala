package graft.ext

import graft.SparkTestBase

class CorpusDiffSpec extends SparkTestBase {
  import spark.implicits._

  test("diff classifies added / removed / changed / unchanged") {
    val oldSnap = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, "alpha"),          // unchanged
      (2L, "beta edited"),    // changed
      (4L, "delta"),          // unchanged
      (5L, "epsilon"))        // added; 3 removed
      .toDF("doc_id", "text")
    val got = CorpusDiff.diff(oldSnap, newSnap)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
    assert(CorpusDiff.diff(oldSnap, newSnap).columns.toSeq == Seq("doc_id", "status"))
  }

  test("empty sides: everything added / everything removed") {
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val empty = docs.limit(0)
    assert(CorpusDiff.diff(empty, docs).as[(Long, String)].collect().toMap ==
      Map(1L -> "added", 2L -> "added"))
    assert(CorpusDiff.diff(docs, empty).as[(Long, String)].collect().toMap ==
      Map(1L -> "removed", 2L -> "removed"))
  }

  test("digest projection happens before the join: no text column in the join plan") {
    val docs = (1L to 100L).map(i => (i, s"document body $i")).toDF("doc_id", "text")
    val p = CorpusDiff.diff(docs, docs).queryExecution.executedPlan.toString()
    // both join inputs must carry (id, 32-hex digest) only — a plan that
    // shuffles the text column would defeat the O(ids) shuffle contract
    // (on this in-memory frame the md5 projection constant-folds INTO the
    // LocalTableScan, so the whole plan is text-free; a parquet-backed
    // scan would show text only inside ReadSchema, never past the Project)
    assert(!p.contains("text#"), s"text column must not survive past the digest projection:\n$p")
    assert(p.contains("__h_old") && p.contains("__h_new"))
  }
}

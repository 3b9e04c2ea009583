package graft.ext

import graft.SparkTestBase

/** [[TextAnalysis.bpeMerges]] against a plain-Scala sequential BPE
  * trainer: same argmax tie-break, same left-to-right non-overlap
  * rewrite, round after round. */
class BpeMergesSpec extends SparkTestBase {
  import spark.implicits._

  private def refMerge(toks: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var pending: Option[String] = None
    toks.foreach { t =>
      pending match {
        case None => pending = Some(t)
        case Some(p) if p == a && t == b => out += s"$a $b"; pending = None
        case Some(p) => out += p; pending = Some(t)
      }
    }
    pending.foreach(out += _)
    out.toList
  }

  private def reference(docs: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] = {
    var corpus = docs.map(_.split(" ").toList)
    (1 to rounds).flatMap { r =>
      val counts = corpus.flatMap(ts => ts.zip(ts.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      if (counts.isEmpty) None
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        corpus = corpus.map(refMerge(_, a, b))
        Some((r, a, b, c))
      }
    }
  }

  test("matches the sequential trainer, overlap runs included") {
    // "x x x x x" forces the non-overlap rule: round 1 merges (x, x)
    // twice per 4 adjacencies, leaving "x x, x x, x"
    val docs = Seq(
      "x x x x x",
      "the cat sat on the mat",
      "the cat ran to the cat house",
      "a b a b a b",
      "the cat sat on a mat")
    val got = TextAnalysis.bpeMerges(
        docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        rounds = 4)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val want = reference(docs, 4)
    assert(got == want, s"merge tables differ:\n got $got\n want $want")
    // the corpus fixture really exercises chained merges: some round
    // must adopt a pair whose side is itself a merged token
    assert(got.exists(m => m._2.contains(" ") || m._3.contains(" ")),
      "fixture must produce a chained (second-order) merge")
  }

  test("bpeEncode reports the reference rewrite's exact compression") {
    val docs = Seq(
      "x x x x x",
      "the cat sat on the mat",
      "the cat ran to the cat house",
      "a b a b a b")
    var corpus = docs.map(_.split(" ").toList)
    reference(docs, 3).foreach { case (_, a, b, _) =>
      corpus = corpus.map(refMerge(_, a, b))
    }
    val got = TextAnalysis.bpeEncode(
        docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        rounds = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    docs.indices.foreach { i =>
      val (_, nRaw, nEnc) = got(i)
      assert(nRaw == docs(i).split(" ").length)
      assert(nEnc == corpus(i).length,
        s"doc $i: encoded count $nEnc != reference ${corpus(i).length}")
    }
    assert(got.exists(r => r._3 < r._2), "the merges must compress something")
  }

  test("partitioning-independent and early-stops on exhausted corpora") {
    val docs = Seq("p q", "p q", "r s").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val a = TextAnalysis.bpeMerges(docs, rounds = 10)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val b = TextAnalysis.bpeMerges(docs.repartition(5), rounds = 10)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(a == b)
    // after merging (p,q) and (r,s) every doc is a single token — the
    // trainer must stop early, not loop to 10
    assert(a.size < 10, s"expected early stop, got $a")
    assert(a.head == ((1, "p", "q", 2L)))
  }
}

package graft.ext

import graft.SparkTestBase

/** [[Dedup.exactSpanDedup]] — suffix-array-grade substring dedup — and
  * the ERROR BOUND of [[Dedup.dedupTiles]]' fixed-tile approximation
  * against it: aligned duplicates are caught by both; phase-shifted
  * duplicates (occurrences disagreeing on offset mod width) are caught
  * only by the exact operator — the documented miss class of the tile
  * formulation. */
class SpanDedupExactSpec extends SparkTestBase {
  import spark.implicits._

  private val W = 4 // width / minLen for the fixtures

  private def run(docs: org.apache.spark.sql.DataFrame) =
    Dedup.exactSpanDedup(docs, "doc_id", "text", minLen = W)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("later occurrence of a duplicated span is cut at ANY alignment; first survives") {
    val span = (1 to 6).map(i => s"s$i").mkString(" ") // 6 tokens > W
    val docs = Seq(
      (1L, s"$span a1 a2"),                    // first occurrence, offset 0
      (2L, s"b1 b2 b3 $span"),                 // later, offset 3 (phase-shifted)
      (3L, s"c1 $span c2 c3")).toDF("doc_id", "text") // later, offset 1
    val out = run(docs)
    assert(out(1L)._3 == s"$span a1 a2", "global first occurrence intact")
    assert(out(2L)._3 == "b1 b2 b3" && out(2L)._2 == 3L,
      s"doc 2's copy must be cut despite the phase shift: ${out(2L)}")
    assert(out(3L)._3 == "c1 c2 c3", s"mid-doc copy cut: ${out(3L)}")
    assert(out.values.forall { case (n, k, _) => k <= n })
  }

  test("a fully-duplicated later document empties; unique text is untouched") {
    val text = (1 to 8).map(i => s"t$i").mkString(" ")
    val uniq = (1 to 8).map(i => s"u$i").mkString(" ")
    val out = run(Seq((1L, text), (2L, text), (3L, uniq)).toDF("doc_id", "text"))
    assert(out(1L) == ((8L, 8L, text)))
    assert(out(2L) == ((8L, 0L, "")), s"full later copy empties: ${out(2L)}")
    assert(out(3L) == ((8L, 8L, uniq)))
  }

  test("short docs (< minLen tokens) can never be cut and keep their row") {
    val out = run(Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text"))
    assert(out(1L) == ((2L, 2L, "a b")) && out(2L) == ((2L, 2L, "a b")))
  }

  test("ERROR BOUND: tiles catch aligned duplicates, MISS phase-shifted ones; " +
      "the exact removed set always contains the tile removed set") {
    val span = (1 to 8).map(i => s"p$i").mkString(" ") // two full W-tiles
    val docs = Seq(
      (1L, span),                   // first occurrence, tile-aligned
      (2L, span),                   // aligned copy — tiles see it
      (3L, s"x1 $span"))            // shifted by 1 — tiles are blind
      .toDF("doc_id", "text")
    val exact = run(docs)
    val tiles = Dedup.dedupTiles(docs, "doc_id", "text", width = W)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap // (n_kept_tiles (in tiles), text)
    // aligned copy: both operators empty it
    assert(exact(2L)._3 == "" && tiles(2L)._2 == "")
    // phase-shifted copy: the EXACT operator cuts the span...
    assert(exact(3L)._3 == "x1", s"exact must catch the shifted copy: ${exact(3L)}")
    // ...while the tile approximation keeps it whole (its tiles are
    // "x1 p1 p2 p3", "p4 p5 p6 p7", "p8" — none matches doc 1's tiling)
    assert(tiles(3L)._2 == s"x1 $span",
      s"the tile formulation is blind to the phase shift: ${tiles(3L)}")
    // containment direction of the approximation (width = minLen): a
    // duplicated tile IS a duplicated width-substring, so everything
    // tiles remove the exact pass removes too — tiles only UNDER-remove
    val docs2 = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d z e f g h"),
      (3L, "q r a b c d w"), (4L, "e f g h a b c d")).toDF("doc_id", "text")
    val e2 = run(docs2)
    // tiles' n_kept counts TILES — compare kept TOKENS via text_clean
    val t2 = Dedup.dedupTiles(docs2, "doc_id", "text", width = W)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (if (r._4.isEmpty) 0L
        else r._4.split(" ").length.toLong)).toMap
    e2.foreach { case (id, (_, kExact, _)) =>
      assert(kExact <= t2(id),
        s"doc $id: exact keeps $kExact tokens, tiles keep ${t2(id)} — tiles must only under-remove")
    }
  }

  private def runDecon(docs: org.apache.spark.sql.DataFrame,
                       bench: org.apache.spark.sql.DataFrame) =
    Dedup.exactSubstrDecontaminate(docs, bench, "doc_id", "text", minLen = W)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("decontaminate: a doc quoting a bench item loses exactly the quote — " +
      "ALL occurrences cut (no first-survives), at any alignment") {
    val item = (1 to 5).map(i => s"b$i").mkString(" ") // 5 tokens > W
    val docs = Seq(
      (1L, item),                       // verbatim copy of the bench item
      (2L, s"x1 x2 $item y1"),          // quote mid-document, shifted
      (3L, s"$item $item"),             // quotes it twice
      (4L, "clean text with no overlap at all")).toDF("doc_id", "text")
    val bench = Seq((100L, item)).toDF("doc_id", "text")
    val out = runDecon(docs, bench)
    assert(out(1L) == ((5L, 0L, "")), s"verbatim copy empties: ${out(1L)}")
    assert(out(2L)._3 == "x1 x2 y1", s"only the quote is cut: ${out(2L)}")
    assert(out(3L) == ((10L, 0L, "")),
      s"both occurrences cut — no first-survives: ${out(3L)}")
    assert(out(4L)._3 == "clean text with no overlap at all")
  }

  test("decontaminate: bench items shorter than minLen contribute nothing; " +
      "partial (sub-minLen) overlap is kept") {
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    // "a b" is 2 < W tokens; "c d e" overlaps 3 < W tokens of doc 1
    val bench = Seq((100L, "a b"), (101L, "c d e q r s t u")).toDF("doc_id", "text")
    val out = runDecon(docs, bench)
    assert(out(1L) == ((6L, 6L, "a b c d e f")),
      s"no full-minLen window matches — nothing cut: ${out(1L)}")
  }
}

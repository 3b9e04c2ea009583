package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference integer PageRank — the same scaled-long arithmetic,
    * driver-side. */
  private def ref(edges: Seq[(Long, Long)], iterations: Int,
                  scale: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.length
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = (3 * scale) / (20 * n)
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iterations) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = nodes.map(v => v ->
        in.get(v).map(s => base + (17 * s) / 20).getOrElse(base)).toMap
    }
    r
  }

  test("ranks matches the reference arithmetic on a star graph; center dominates") {
    // undirected star: center 0 <-> leaves 1..4 (both directions)
    val und = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L)))
    val got = PageRank.ranks(und.toDF("src", "dst"), iterations = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == ref(und, 5))
    assert(got(0L) > got(1L) * 2, "hub must clearly outrank leaves")
    assert((1L to 4L).map(got).toSet.size == 1, "symmetric leaves tie exactly")
  }

  test("ranks is partitioning-independent and mass-conserving up to flooring") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L),
      (1L, 4L), (4L, 1L), (5L, 1L), (1L, 5L))
    val a = PageRank.ranks(edges.toDF("src", "dst"), 5).as[(Long, Long)].collect().toMap
    val b = PageRank.ranks(edges.toDF("src", "dst").repartition(7), 5)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a == ref(edges, 5))
    // flooring only ever LOSES mass; with 5 nodes, scale units of total
    val total = a.values.sum
    assert(total <= 1000000000000L && total > 999999000000L)
  }

  test("tileDupEdges: symmetric pairs exactly for docs sharing a duplicate tile") {
    val docs = Seq(
      (1L, "a b c d"), // tiles [a b][c d]
      (2L, "a b x y"), // shares [a b] with 1
      (3L, "c d"),     // shares [c d] with 1
      (4L, "z z z z")) // unique
      .toDF("doc_id", "text")
    val got = Dedup.tileDupEdges(docs, "doc_id", "text", width = 2)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)))
  }

  test("tileDupEdges: maxFanout drops over-hot tiles, accounted by absence") {
    val docs = (1L to 6L).map(i => (i, "hot tile here")).toDF("doc_id", "text")
    val capped = Dedup.tileDupEdges(docs, "doc_id", "text", width = 3, maxFanout = 5)
    assert(capped.count() == 0, "6-doc tile group exceeds the 5-doc cap")
    val uncapped = Dedup.tileDupEdges(docs, "doc_id", "text", width = 3, maxFanout = 6)
    assert(uncapped.count() == 30, "6*5 directed pairs when under the cap")
  }
}

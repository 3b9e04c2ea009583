package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("pointInInterval equals the naive inequality join; boundary semantics exact") {
    val points = Seq(
      (1L, "u1", ts("2026-01-01 10:00:00")),  // == start -> IN
      (2L, "u1", ts("2026-01-01 10:59:59")),  // inside   -> IN
      (3L, "u1", ts("2026-01-01 11:00:00")),  // == end   -> OUT
      (4L, "u2", ts("2026-01-01 10:30:00")),  // wrong key-> OUT
      (5L, "u1", ts("2026-01-03 09:00:00")))  // far away -> OUT
      .toDF("pid", "user", "t")
    val intervals = Seq(
      (100L, "u1", ts("2026-01-01 10:00:00"), ts("2026-01-01 11:00:00")),
      // multi-granule interval (26 hours at the 1h default granule)
      (200L, "u1", ts("2026-01-02 12:00:00"), ts("2026-01-03 14:00:00")))
      .toDF("iid", "user", "s", "e")

    val got = RangeJoin.pointInInterval(points, intervals, "t", "s", "e",
        granuleSeconds = 3600L, keys = Seq("user"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (2L, 100L), (5L, 200L)), s"got $got")

    // the naive inequality join agrees (the oracle formulation)
    val naive = points.join(intervals, Seq("user"))
      .filter($"t" >= $"s" && $"t" < $"e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == naive)
    // each matching pair appears exactly once (no granule-induced dups)
    val rows = RangeJoin.pointInInterval(points, intervals, "t", "s", "e",
      granuleSeconds = 60L, keys = Seq("user")).count()
    assert(rows == 3)
  }

  test("pointInInterval equals the naive join on seeded-random data, all granules") {
    val rnd = new scala.util.Random(42)
    val base = ts("2026-01-01 00:00:00").getTime
    val points = (1L to 300L).map(i =>
      (i, s"u${rnd.nextInt(5)}", new Timestamp(base + rnd.nextInt(7 * 86400) * 1000L)))
      .toDF("pid", "user", "t")
    val intervals = (1L to 80L).map { i =>
      val s = base + rnd.nextInt(7 * 86400) * 1000L
      (i, s"u${rnd.nextInt(5)}", new Timestamp(s),
        new Timestamp(s + (60 + rnd.nextInt(12 * 3600)) * 1000L))
    }.toDF("iid", "user", "s", "e")
    val naive = points.join(intervals, Seq("user"))
      .filter($"t" >= $"s" && $"t" < $"e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (g <- Seq(60L, 3600L, 86400L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "t", "s", "e",
          granuleSeconds = g, keys = Seq("user"))
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.toSet == naive, s"granule $g disagrees with the naive join")
      assert(got.length == got.toSet.size, s"granule $g emitted duplicate pairs")
    }
  }

  test("intervalOverlap finds overlapping pairs once, across granules") {
    val a = Seq(
      (1L, ts("2026-01-01 10:00:00"), ts("2026-01-01 12:00:00")),
      (2L, ts("2026-01-01 15:00:00"), ts("2026-01-01 16:00:00")))
      .toDF("aid", "s1", "e1")
    val b = Seq(
      (10L, ts("2026-01-01 11:00:00"), ts("2026-01-01 20:00:00")), // overlaps both
      (20L, ts("2026-01-01 12:00:00"), ts("2026-01-01 13:00:00")), // touches 1's end -> no
      (30L, ts("2026-01-01 09:00:00"), ts("2026-01-01 10:30:00"))) // overlaps 1
      .toDF("bid", "s2", "e2")
    val got = RangeJoin.intervalOverlap(a, b, "aid", "bid", "s1", "e1", "s2", "e2",
        granuleSeconds = 1800L)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (1L, 30L)), s"got $got")
  }
}

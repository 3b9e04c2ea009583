package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[RobustStats.winsorize]] against a plain-Scala sorted-multiset
  * reference for the discrete-quantile pick and the clamp. */
class WinsorizeSpec extends SparkTestBase {
  import spark.implicits._

  private def refBounds(vs: Seq[Long], lo: Int, hi: Int): (Long, Long) = {
    val sorted = vs.sorted
    val n = sorted.length.toLong
    def pick(pct: Int): Long = sorted(((n - 1) * pct / 100).toInt)
    (pick(lo), pick(hi))
  }

  test("matches the sorted-multiset reference, ties and outliers included") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      val g = s"g${i % 3}"
      // heavy ties + a few wild outliers per group
      val v = if (i % 97 == 0) 1000000L + i else (rng.nextInt(40) + 10).toLong
      (i.toLong, g, v)
    }
    val out = RobustStats.winsorize(rows.toDF("doc_id", "g", "v"),
        "g", col("v"), "doc_id")
      .as[(Long, String, Long, Long, Long, Long)].collect()
    assert(out.length == rows.length)
    val byGroup = rows.groupBy(_._2).map { case (g, rs) =>
      g -> refBounds(rs.map(_._3), 5, 95)
    }
    val vals = rows.map(r => r._1 -> r._3).toMap
    out.foreach { case (id, g, v, lo, hi, w) =>
      val (rlo, rhi) = byGroup(g)
      assert(v == vals(id))
      assert(lo == rlo && hi == rhi,
        s"group $g bounds ($lo, $hi) != reference ($rlo, $rhi)")
      assert(w == math.min(math.max(v, rlo), rhi))
    }
    // the outliers really got clamped
    assert(out.exists(r => r._6 != r._3), "fixture must clamp something")
  }

  test("degenerate groups: single value, all ties") {
    val rows = Seq((1L, "a", 5L), (2L, "b", 9L), (3L, "b", 9L), (4L, "b", 9L))
    val out = RobustStats.winsorize(rows.toDF("doc_id", "g", "v"),
        "g", col("v"), "doc_id")
      .as[(Long, String, Long, Long, Long, Long)].collect().sortBy(_._1)
    out.foreach { case (_, _, v, lo, hi, w) =>
      assert(lo == v && hi == v && w == v,
        "constant groups must pass through unclamped")
    }
  }

  test("percentile bounds are validated") {
    val df = Seq((1L, "a", 5L)).toDF("doc_id", "g", "v")
    intercept[IllegalArgumentException] {
      RobustStats.winsorize(df, "g", col("v"), "doc_id", loPct = 60, hiPct = 40)
    }
  }
}

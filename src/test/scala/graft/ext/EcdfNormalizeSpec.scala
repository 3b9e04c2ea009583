package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[RobustStats.ecdfNormalize]] against the sorted-multiset definition:
  * pct_micro = floor(#{v' <= v} * 1e6 / n) within each group. */
class EcdfNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  test("matches the ECDF definition, ties share a rank") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 300).map { i =>
      (i.toLong, s"s${i % 3}", (rng.nextInt(30) + 1).toLong)
    }
    val out = RobustStats.ecdfNormalize(rows.toDF("doc_id", "g", "v"),
        "g", col("v"), "doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == rows.length)
    val byGroup = rows.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    out.foreach { case (id, g, v, pct) =>
      val vs = byGroup(g)
      val expected = vs.count(_ <= v).toLong * 1000000L / vs.length
      assert(pct == expected, s"doc $id in $g: $pct != $expected")
    }
    // ties: equal values must get the identical rank
    out.groupBy(r => (r._2, r._3)).values.foreach { grp =>
      assert(grp.map(_._4).distinct.size == 1, "tied values must share a rank")
    }
    // the max of each group is always pct_micro = 1_000_000
    out.groupBy(_._2).values.foreach { grp =>
      assert(grp.maxBy(_._3)._4 == 1000000L)
    }
  }

  test("cross-source comparability: identical distributions yield identical ranks") {
    val a = (0 until 50).map(i => (i.toLong, "a", (i % 10).toLong + 1))
    val b = (0 until 50).map(i => (100L + i, "b", (i % 10).toLong + 1))
    val out = RobustStats.ecdfNormalize((a ++ b).toDF("doc_id", "g", "v"),
        "g", col("v"), "doc_id")
      .as[(Long, String, Long, Long)].collect()
    val ra = out.filter(_._2 == "a").map(r => r._3 -> r._4).toMap
    val rb = out.filter(_._2 == "b").map(r => r._3 -> r._4).toMap
    assert(ra == rb, "same shape, different raw source => same normalized ranks")
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RobustStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("madOutlierStats: hand-computed median/MAD, one planted outlier") {
    // g=A values 1..9 plus 1000: median = 5.5 (med2 = 11),
    // deviations |v-5.5| = 4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5
    // -> sorted dev2 (=2dev) 1,1,3,3,5,5,7,7,9,1989; MAD = (5+5)/2/2...
    // median(dev2) = (5+5)/2 = 5 -> mad4 = 10 (MAD = 2.5)
    // outlier: |v-5.5| > 3*2.5 = 7.5 -> only 1000
    val df = ((1L to 9L) :+ 1000L).map(v => ("A", v)).toDF("g", "v")
    val r = RobustStats.madOutlierStats(df, "g", col("v")).head()
    assert(r.getAs[Long]("med2") == 11L)
    assert(r.getAs[Long]("mad4") == 10L)
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("madOutlierStats: groups are independent; constant group has MAD 0") {
    val df = (Seq(("A", 10L), ("A", 10L), ("A", 10L), ("A", 99L)) ++
      Seq(("B", 1L), ("B", 2L), ("B", 3L))).toDF("g", "v")
    val got = RobustStats.madOutlierStats(df, "g", col("v"))
      .select("g", "n_rows", "n_outliers", "med2", "mad4")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // A: median 10, MAD 0 -> any deviation is an outlier (99)
    // B: median 2, MAD 1 -> no |v-2| > 3
    assert(got == Seq(("A", 4L, 1L, 20L, 0L), ("B", 3L, 0L, 4L, 4L)))
  }

  test("madOutlierStats: robust to the outliers a z-score would absorb") {
    // half-broken data: z-score's stddev explodes and flags nothing;
    // MAD's breakdown point 0.5 still isolates the planted junk
    val clean = (1L to 20L).map(v => ("A", 100L + v % 3))
    val junk = (1L to 6L).map(i => ("A", 100000L + i))
    val df = (clean ++ junk).toDF("g", "v")
    val r = RobustStats.madOutlierStats(df, "g", col("v")).head()
    assert(r.getAs[Long]("n_outliers") == 6L)
  }

  test("weightedMedian: hand-computed lower weighted median; weight collapse") {
    // group A: values (1, w=1), (5, w=2), (9, w=1): tot=4, cum(5)=3 >= 2 -> 5
    // group B: a heavy single value dominates: (10, w=100), (99, w=1) -> 10
    // value 5 appears twice in A (weights 1+1 collapse to 2)
    val df = Seq(("A", 1L, 1L), ("A", 5L, 1L), ("A", 5L, 1L), ("A", 9L, 1L),
      ("B", 10L, 100L), ("B", 99L, 1L)).toDF("g", "v", "w")
    val got = RobustStats.weightedMedian(df, "g", col("v"), col("w"))
      .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("A", 3L, 4L, 5L), ("B", 2L, 101L, 10L)))
    // unit weights degenerate to the plain lower median
    val unit = (1L to 7L).map(i => ("G", i, 1L)).toDF("g", "v", "w")
    assert(RobustStats.weightedMedian(unit, "g", col("v"), col("w"))
      .head().getLong(3) == 4L)
  }

  test("weightedMedian: bucketed prefix sum is partitioning-independent") {
    val rows = (0L until 5000L).map(i => (s"g${i % 3}", i % 700, 1L + i % 5))
    def run(parts: Int, buckets: Int) =
      RobustStats.weightedMedian(rows.toDF("g", "v", "w").repartition(parts),
          "g", col("v"), col("w"), numBuckets = buckets)
        .orderBy("g").collect().toSeq
    val base = run(1, 1)
    assert(base == run(13, 8))
    assert(base == run(4, 0))
  }

  test("sampleQuantiles: k >= n degenerates to exact quantiles of the full set") {
    val df = (1L to 101L).map(i => (i, i.toDouble)).toDF("id", "v")
    val got = RobustStats.sampleQuantiles(df, col("id"), col("v"),
        probs = Seq(0.25, 0.5, 0.75), k = 1000)
      .orderBy("p").as[(Double, Double)].collect().toSeq
    // 101 values 1..101: interpolated quantiles land exactly on 26/51/76
    assert(got == Seq((0.25, 26.0), (0.5, 51.0), (0.75, 76.0)))
  }

  test("sampleQuantiles: sample is the hash-order prefix, stable under repartition") {
    val df = (1L to 5000L).map(i => (i, i.toDouble)).toDF("id", "v")
    val a = RobustStats.sampleQuantiles(df, col("id"), col("v"),
      probs = Seq(0.5), k = 200).head().getDouble(1)
    val b = RobustStats.sampleQuantiles(df.repartition(13), col("id"), col("v"),
      probs = Seq(0.5), k = 200).head().getDouble(1)
    assert(a == b)
    // reference: the same Knuth-hash bottom-200 prefix computed locally
    val ids = (1L to 5000L).sortBy(i =>
      (Math.floorMod((i % 1000003L) * 2654435761L, 1000000007L), i)).take(200)
    val vs = ids.map(_.toDouble).sorted
    val want = { // percentile(v, 0.5) interpolation over 200 values
      val pos = 0.5 * (vs.length - 1); val lo = pos.toInt
      vs(lo) + (pos - lo) * (vs(lo + 1) - vs(lo))
    }
    assert(a == want)
  }
}

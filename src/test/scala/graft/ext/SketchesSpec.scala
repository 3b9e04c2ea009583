package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private def matrixOf(rows: Seq[(String, Long)], k: Int) = {
    val df = rows.toDF("grp", "v")
    Sketches.overlapMatrix(
      Sketches.kmvRegisters(df, "grp", col("v"), k), "grp", k)
  }

  test("small groups: union/intersection/jaccard are EXACT below k") {
    // A = 0..9, B = 5..24 → |A|=10 |B|=20 |A∪B|=25 |A∩B|=5, J=0.2
    val rows = (0L until 10L).map(("a", _)) ++ (5L until 25L).map(("b", _))
    val m = matrixOf(rows, k = 128).collect()
    assert(m.length == 1)
    val r = m.head
    assert(r.getAs[Long]("distinct_a") == 10L)
    assert(r.getAs[Long]("distinct_b") == 20L)
    assert(r.getAs[Long]("union_est") == 25L)
    assert(r.getAs[Long]("inter_est") == 5L)
    assert(r.getAs[Double]("jaccard") == 5.0 / 25.0)
  }

  test("identical groups → jaccard 1; disjoint groups → jaccard 0") {
    val same = (0L until 50L)
    val rows = same.map(("a", _)) ++ same.map(("b", _)) ++
      (1000L until 1050L).map(("c", _))
    val m = matrixOf(rows, k = 128).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = m(("a", "b"))
    assert(ab.getAs[Long]("inter_est") == 50L && ab.getAs[Double]("jaccard") == 1.0)
    val ac = m(("a", "c"))
    assert(ac.getAs[Long]("inter_est") == 0L && ac.getAs[Double]("jaccard") == 0.0)
  }

  test("estimate regime: union within 30% of truth, jaccard in the ballpark") {
    // A = 0..3999, B = 2000..5999: |A∪B| = 6000, J = 2000/6000 = 1/3
    val rows = (0L until 4000L).map(("a", _)) ++ (2000L until 6000L).map(("b", _))
    val r = matrixOf(rows, k = 64).collect().head
    val u = r.getAs[Long]("union_est").toDouble
    val j = r.getAs[Double]("jaccard")
    assert(math.abs(u - 6000.0) / 6000.0 < 0.3, s"union_est=$u")
    assert(j > 0.15 && j < 0.55, s"jaccard=$j")
  }

  test("matrix is partitioning-independent (registers merge exactly)") {
    val rows = (0L until 3000L).map(i => (s"g${i % 4}", i * 31 % 997))
    def run(parts: Int) =
      Sketches.overlapMatrix(
        Sketches.kmvRegisters(rows.toDF("grp", "v").repartition(parts),
          "grp", col("v"), k = 32), "grp", k = 32)
        .orderBy("group_a", "group_b").collect().toSeq
    assert(run(1) == run(7))
  }

  test("heavyHitters: exact thresholded counts, equal to brute force, partitioning-independent") {
    // zipf-ish stream: value i appears ~3000/i times
    val rows = (1 to 60).flatMap(i => Seq.fill(3000 / i)(s"tok$i"))
    val df = rows.toDF("v")
    val brute = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size
    val minCount = math.ceil(n * 0.01).toLong
    val expect = brute.filter(_._2 >= minCount).toSeq.sortBy(_._1)
    def run(parts: Int) =
      Sketches.heavyHitters(df.repartition(parts), col("v"), minFreq = 0.01)
        .orderBy("value").as[(String, Long)].collect().toSeq
    assert(run(1) == expect)
    assert(run(13) == expect, "MG candidate variance must not reach the output")
  }

  test("heavyHitters: a value spread thin across partitions still surfaces") {
    // 5% heavy value interleaved with unique noise — every partition sees
    // it below its local majority, but the MG superset guarantee holds
    val rows = (0 until 20000).map(i => if (i % 20 == 0) "heavy" else s"u$i")
    val got = Sketches.heavyHitters(rows.toDF("v").repartition(16), col("v"),
        minFreq = 0.04)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("heavy", 1000L)))
  }

  test("pair count is groups choose 2") {
    val rows = (0L until 100L).map(i => (s"g${i % 5}", i))
    assert(matrixOf(rows, k = 16).count() == 10L)
  }
}

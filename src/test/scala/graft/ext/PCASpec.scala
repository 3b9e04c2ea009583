package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PCASpec extends SparkTestBase {
  import spark.implicits._

  /** Planted 2-factor corpus in 8 dims: strong variance along e0+e1,
    * weaker along e2−e3, tiny isotropic noise. */
  private def planted(n: Int = 400, seed: Int = 13) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val a = rnd.nextGaussian() * 10.0
      val b = rnd.nextGaussian() * 3.0
      val base = Array.fill(8)(rnd.nextGaussian() * 0.05f.toDouble)
      base(0) += a / math.sqrt(2); base(1) += a / math.sqrt(2)
      base(2) += b / math.sqrt(2); base(3) -= b / math.sqrt(2)
      (i.toLong, base.map(_.toFloat).toSeq)
    }
  }

  test("fit: recovers planted factor directions, eigenvalues descending") {
    val corpus = planted().toDF("vec_id", "embedding")
    val m = PCA.fit(corpus, "embedding", dim = 8, nComponents = 3)
    assert(m.n == 400)
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1)),
      "eigenvalues must descend")
    // PC1 ≈ (e0+e1)/√2, PC2 ≈ (e2−e3)/√2 (up to the fixed sign)
    val pc1 = m.components(0); val pc2 = m.components(1)
    assert(math.abs(math.abs(pc1(0)) - 1 / math.sqrt(2)) < 0.02 &&
      math.abs(math.abs(pc1(1)) - 1 / math.sqrt(2)) < 0.02,
      s"PC1 must align with e0+e1, got ${pc1.toSeq}")
    assert(math.abs(math.abs(pc2(2)) - 1 / math.sqrt(2)) < 0.02 &&
      math.abs(math.abs(pc2(3)) - 1 / math.sqrt(2)) < 0.02,
      s"PC2 must align with e2-e3, got ${pc2.toSeq}")
    // eigenvalues ≈ planted variances (10² and 3², row-mean removed)
    assert(math.abs(m.eigenvalues(0) - 100.0) < 15.0)
    assert(math.abs(m.eigenvalues(1) - 9.0) < 2.0)
  }

  test("fit: components are orthonormal; model is partitioning-independent bit-for-bit") {
    val corpus = planted().toDF("vec_id", "embedding")
    val m = PCA.fit(corpus, "embedding", dim = 8, nComponents = 4)
    for (c <- m.components) {
      val norm = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9, s"component norm $norm")
    }
    for (Seq(a, b) <- m.components.toSeq.combinations(2)) {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      assert(math.abs(dot) < 1e-8, s"components must be orthogonal, dot=$dot")
    }
    val m2 = PCA.fit(corpus.repartition(13), "embedding", dim = 8, nComponents = 4)
    assert(m2.mean.toSeq == m.mean.toSeq &&
      m2.eigenvalues.toSeq == m.eigenvalues.toSeq &&
      m2.components.map(_.toSeq).toSeq == m.components.map(_.toSeq).toSeq,
      "decimal sums must make the fit partitioning-independent")
  }

  test("project: long format, deterministic, matches a driver-side reference") {
    val rows = planted(120)
    val corpus = rows.toDF("vec_id", "embedding")
    val m = PCA.fit(corpus, "embedding", dim = 8, nComponents = 2)
    val got = PCA.project(corpus, "vec_id", "embedding", m)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size == 120 * 2)
    for ((id, v) <- rows; c <- 0 until 2) {
      var dot = 0.0
      for (j <- 0 until 8) dot += v(j).toDouble * m.components(c)(j)
      val want = BigDecimal(dot - m.bias(c))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got((id, c.toLong)) - want) < 5e-5,
        s"projection ($id, $c): got ${got((id, c.toLong))}, want $want")
    }
    // per-component projections are centered: Σ proj ≈ 0
    val sums = got.toSeq.groupBy(_._1._2).view.mapValues(_.map(_._2).sum)
    for ((c, s) <- sums) assert(math.abs(s) < 0.5, s"component $c not centered: $s")
  }

  test("projectVectors + topKBruteForceD: reduced-space search preserves planted neighborhoods") {
    // 2-factor data: the 8→2 reduction keeps the factor plane, so
    // reduced-space top-k must recover most full-space neighbors (not
    // all: full-space cosine also sees the noise dims and the
    // uncentered offset; random recall@5 here would be ~0.025)
    val rows = planted(200)
    val corpus = rows.toDF("vec_id", "embedding")
    val m = PCA.fit(corpus, "embedding", dim = 8, nComponents = 2)
    val red = PCA.projectVectors(corpus, "vec_id", "embedding", m)
    assert(red.schema("pvec").dataType.simpleString == "array<double>")
    val probes = corpus.filter(col("vec_id") % 40 === 0)
    val exact = Similarity.topKBruteForce(corpus, probes, k = 5)
    val approx = Similarity.topKBruteForceD(red,
      red.filter(col("vec_id") % 40 === 0), k = 5)
    val hits = exact.select("query_id", "neighbor_id")
      .join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"))
      .count()
    val total = exact.count()
    assert(hits.toDouble / total > 0.7,
      s"reduced-space recall ${hits.toDouble / total} too low on 2-factor data")
    // determinism under repartition
    val again = Similarity.topKBruteForceD(red.repartition(7),
      red.filter(col("vec_id") % 40 === 0), k = 5)
    assert(again.orderBy("query_id", "rank").collect().toSeq ==
      approx.orderBy("query_id", "rank").collect().toSeq)
  }

  test("explained variance: dominant factors carry nearly everything") {
    val corpus = planted().toDF("vec_id", "embedding")
    val full = PCA.fit(corpus, "embedding", dim = 8, nComponents = 8)
    val top2 = PCA.fit(corpus, "embedding", dim = 8, nComponents = 2)
    val ratio = PCA.explainedVariance(top2, full.eigenvalues.sum)
    assert(ratio > 0.99, s"planted 2-factor data: top-2 must explain >99%, got $ratio")
  }
}

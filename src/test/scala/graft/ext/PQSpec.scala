package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Product quantization: codebook shape, encode determinism, planted
  * recall, and the memory contract (codes table width). */
class PQSpec extends SparkTestBase {
  import spark.implicits._

  /** Planted clusters (same construction as SimilaritySpec): members of
    * a cluster are tiny perturbations of its center — ANN must put
    * same-cluster members at the top. */
  private def planted(nClusters: Int, perCluster: Int, dim: Int = 16, seed: Int = 7) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    (0 until nClusters).flatMap { c =>
      (0 until perCluster).map { i =>
        val v = centers(c).zipWithIndex.map { case (x, j) =>
          x + 0.01f * new scala.util.Random(seed + c * 100 + i * 10 + j).nextGaussian().toFloat
        }
        ((c * perCluster + i).toLong, v.toSeq)
      }
    }
  }

  test("fit: m codebooks of k subDim-centroids; deterministic re-fit") {
    val corpus = planted(4, 5).toDF("vec_id", "embedding")
    val cb = PQ.fit(corpus, "vec_id", "embedding", dim = 16, m = 4, k = 4,
      iterations = 3, seed = 11L)
    assert(cb.m == 4 && cb.subDim == 4 && cb.k == 4)
    assert(cb.books.length == 4 && cb.books.forall(_.length == 4) &&
      cb.books.forall(_.forall(_.length == 4)))
    val cb2 = PQ.fit(corpus.repartition(7), "vec_id", "embedding", dim = 16,
      m = 4, k = 4, iterations = 3, seed = 11L)
    assert(cb == cb2, "codebooks must not depend on partitioning")
  }

  test("encode: one code per subspace, stable under repartitioning") {
    val corpus = planted(4, 5).toDF("vec_id", "embedding")
    val cb = PQ.fit(corpus, "vec_id", "embedding", dim = 16, m = 4, k = 4,
      iterations = 3, seed = 11L)
    val codes = PQ.encode(corpus, cb).orderBy("vec_id").collect()
    assert(codes.forall(_.getSeq[Int](1).length == 4))
    assert(codes.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 4)))
    val again = PQ.encode(corpus.repartition(5), cb).orderBy("vec_id").collect()
    assert(codes.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("topKPq: planted cluster members recalled at rank head") {
    val corpus = planted(6, 5).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" % 5 === 0) // one per cluster
    val cb = PQ.fit(corpus, "vec_id", "embedding", dim = 16, m = 4, k = 8,
      iterations = 4, seed = 11L)
    val top = PQ.topKPq(corpus, queries, k = 4, cb, refine = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (c <- 0 until 6) {
      val qid = (c * 5).toLong
      val clusterMates = ((c * 5 + 1) until (c * 5 + 5)).map(_.toLong).toSet
      assert(clusterMates.subsetOf(top(qid)),
        s"query $qid missing mates: ${clusterMates -- top(qid)}")
    }
  }

  test("codes table is the narrow scan: m ints per row, not dim floats") {
    val corpus = planted(4, 5).toDF("vec_id", "embedding")
    val cb = PQ.fit(corpus, "vec_id", "embedding", dim = 16, m = 4, k = 4,
      iterations = 2, seed = 11L)
    val codes = PQ.encode(corpus, cb)
    assert(codes.columns.toSeq == Seq("vec_id", "codes"))
    assert(codes.schema("codes").dataType.simpleString == "array<int>")
  }

  test("fit: raising driverThreshold past KMeans's in-driver bound keeps paths bit-exact") {
    // 20001 rows > KMeans.fit's internal 20000 in-driver bound: a caller
    // raising PQ's driverThreshold must NOT re-enable the in-memory fast
    // path there (double sums) while KMeans.fit would go distributed
    // (decimal sums) — the clamp forces both through the same path
    val rnd = new scala.util.Random(3)
    val corpus = (0 until 20001)
      .map(i => (i.toLong, Seq.fill(4)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val raised = PQ.fit(corpus, "vec_id", "embedding", dim = 4, m = 2, k = 4,
      iterations = 2, seed = 5L, driverThreshold = 1000000L)
    val default = PQ.fit(corpus, "vec_id", "embedding", dim = 4, m = 2, k = 4,
      iterations = 2, seed = 5L)
    assert(raised == default,
      "an inflated driverThreshold must not change the codebooks")
  }
}

package graft.ext

import graft.SparkTestBase

class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  private def planted(nClusters: Int, perCluster: Int, dim: Int = 8, seed: Int = 11)
      : Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until nClusters).flatMap { c =>
      val center = Array.fill(dim)(rnd.nextGaussian().toFloat)
      (0 until perCluster).map { j =>
        val v = center.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
        ((c * perCluster + j).toLong, v)
      }
    }
  }

  test("driver path: fit is bit-identical across partitionings") {
    // the collected sample is hash-sorted before accumulation, so the
    // scan's partition layout cannot reorder float addition
    val data = planted(6, 40).toDF("vec_id", "embedding")
    val a = KMeans.fit(data.repartition(1), "vec_id", "embedding",
      k = 6, dim = 8, iterations = 4)
    val b = KMeans.fit(data.repartition(7), "vec_id", "embedding",
      k = 6, dim = 8, iterations = 4)
    assert(a.toSeq == b.toSeq)
  }

  test("distributed path: fit is bit-identical across partitionings (decimal update)") {
    // driverThreshold = 0 forces the distributed Lloyd's; the IVF oracle
    // re-ranks a seed-deterministic candidate set, so if the update step
    // summed doubles, task scheduling would perturb the centroids and the
    // candidate set with them
    val data = planted(6, 40).toDF("vec_id", "embedding")
    val a = KMeans.fit(data.repartition(1), "vec_id", "embedding",
      k = 6, dim = 8, iterations = 4, driverThreshold = 0)
    val b = KMeans.fit(data.repartition(7), "vec_id", "embedding",
      k = 6, dim = 8, iterations = 4, driverThreshold = 0)
    assert(a.toSeq == b.toSeq)
  }

  test("fit quantizes well enough for IVF: planted cluster-mates share probed cells") {
    // Lloyd's converges to local optima (a planted cluster may split
    // across two cells — same property as any k-means), so assert the
    // property IVF actually needs: with a few probes, a query's candidate
    // set recovers nearly all of its planted cluster-mates.
    val pts = planted(5, 30)
    val data = pts.toDF("vec_id", "embedding")
    val queries = pts.filter(_._1 % 30 == 0).toDF("vec_id", "embedding")
    val cands = Similarity.ivfCandidates(data, queries,
        numCentroids = 8, nProbe = 3, iterations = 6, trainTarget = 0)
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (q <- 0 until 5) {
      val mates = ((q * 30 + 1) until (q * 30 + 30)).map(_.toLong).toSet
      val got = cands.getOrElse(q * 30L, Set.empty)
      val recall = mates.count(got).toDouble / mates.size
      assert(recall >= 0.95, s"query ${q * 30}: cluster recall $recall")
    }
  }

  test("hash subsample is deterministic and distributed-path quality holds") {
    val data = planted(4, 60).toDF("vec_id", "embedding")
    // trainTarget 80 on 240 rows -> oneIn 3 subsample, distributed path
    val a = KMeans.fit(data.repartition(3), "vec_id", "embedding",
      k = 4, dim = 8, iterations = 4, trainTarget = 80, driverThreshold = 0)
    val b = KMeans.fit(data.repartition(8), "vec_id", "embedding",
      k = 4, dim = 8, iterations = 4, trainTarget = 80, driverThreshold = 0)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 4 * 8)
  }

  test("clusterQuality: hand-computed margins, ties to lower cell, partition-independent") {
    import spark.implicits._
    // centroids: c0 = (1,0), c1 = (0,1)
    val cents = Array(1f, 0f, 0f, 1f)
    val vecs = Seq(
      (1L, Seq(1f, 0f)),     // dots (1, 0)     → cell 0, own 1.0, margin 1.0
      (2L, Seq(0.6f, 0.8f)), // dots (.6, .8)   → cell 1, own 0.8, margin ≈ 0.2
      (3L, Seq(0.5f, 0.5f)), // tie (.5, .5)    → cell 0, margin 0
      (4L, Seq(0f, 0.9f)))   // dots (0, .9)    → cell 1, own 0.9, margin 0.9
      .toDF("vec_id", "embedding")
    val got = KMeans.clusterQuality(vecs, "vec_id", "embedding", cents, dim = 2)
      .orderBy("cell").as[(Long, Long, Long, Long, Long)].collect().toSeq
    // cell 0: vecs 1,3 → own 1.0+0.5, margins 1.0, 0
    val own2 = math.floor(0.8f.toDouble * 1e6).toLong
    val m2 = math.floor((0.8f.toDouble - 0.6f.toDouble) * 1e6).toLong
    val own4 = math.floor(0.9f.toDouble * 1e6).toLong // 0.9f ≠ 0.9 in double
    assert(got(0) == ((0L, 2L, 1500000L, 1000000L, 0L)))
    assert(got(1) == ((1L, 2L, own2 + own4, m2 + own4, m2)))
    val again = KMeans.clusterQuality(vecs.repartition(3), "vec_id", "embedding",
        cents, dim = 2)
      .orderBy("cell").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(again == got)
    // assignment agrees with the production nearest_centroids argmax
    val cells = vecs.select($"vec_id",
        graft.functions.VectorFunctions
          .nearest_centroids($"embedding", cents, 2, 1)(0).cast("long").as("c"))
      .as[(Long, Long)].collect().toMap
    assert(cells == Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 1L))
  }
}

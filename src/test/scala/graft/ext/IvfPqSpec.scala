package graft.ext

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** IVF-PQ composed index: fit determinism, encode shape, planted recall,
  * and the cell-partitioned store's static partition pruning — the plan
  * fact that makes "probe 8 of 1024 cells" read 8/1024 of the index. */
class IvfPqSpec extends SparkTestBase {
  import spark.implicits._

  /** Planted clusters (PQSpec's construction): members are tiny
    * perturbations of their center — ANN must recall cluster mates. */
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

  test("fit: coarse centroids + residual codebooks, partitioning-independent") {
    val corpus = planted(4, 6).toDF("vec_id", "embedding")
    val idx = IvfPq.fit(corpus, "vec_id", "embedding", dim = 16,
      numCells = 4, m = 4, k = 4, iterations = 3, seed = 11L)
    assert(idx.numCells == 4 && idx.dim == 16)
    assert(idx.centroidsFlat.length == 4 * 16)
    assert(idx.cb.m == 4 && idx.cb.subDim == 4 && idx.cb.k == 4)
    val idx2 = IvfPq.fit(corpus.repartition(7), "vec_id", "embedding", dim = 16,
      numCells = 4, m = 4, k = 4, iterations = 3, seed = 11L)
    assert(idx.centroidsFlat.toSeq == idx2.centroidsFlat.toSeq &&
      idx.cb == idx2.cb, "index must not depend on partitioning")
  }

  test("encode: (id, cell, codes) — one cell, m residual codes, stable") {
    val corpus = planted(4, 6).toDF("vec_id", "embedding")
    val idx = IvfPq.fit(corpus, "vec_id", "embedding", dim = 16,
      numCells = 4, m = 4, k = 4, iterations = 3, seed = 11L)
    val codes = IvfPq.encode(corpus, idx).orderBy("vec_id").collect()
    assert(codes.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 4))
    assert(codes.forall(_.getSeq[Int](2).length == 4))
    assert(codes.forall(_.getSeq[Int](2).forall(c => c >= 0 && c < 4)))
    val again = IvfPq.encode(corpus.repartition(5), idx).orderBy("vec_id").collect()
    assert(codes.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("topKIvfPq: planted cluster members recalled at rank head") {
    val corpus = planted(6, 5).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" % 5 === 0) // one per cluster
    val idx = IvfPq.fit(corpus, "vec_id", "embedding", dim = 16,
      numCells = 6, m = 4, k = 8, iterations = 4, seed = 11L)
    val top = IvfPq.topKIvfPq(corpus, queries, k = 4, idx, nProbe = 2, refine = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (c <- 0 until 6) {
      val qid = (c * 5).toLong
      val clusterMates = ((c * 5 + 1) until (c * 5 + 5)).map(_.toLong).toSet
      assert(clusterMates.subsetOf(top(qid)),
        s"query $qid missing mates: ${clusterMates -- top(qid)}")
    }
  }

  test("cell-partitioned store: probed cells become a static partition filter") {
    val corpus = planted(8, 8).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 0L) // one query, one cluster
    val idx = IvfPq.fit(corpus, "vec_id", "embedding", dim = 16,
      numCells = 8, m = 4, k = 4, iterations = 4, seed = 11L)
    val dir = tmpDir("graft-ivfpq-codes")
    IvfPq.writeCodes(corpus, idx, dir)

    val nProbe = 2
    val pruned = IvfPq.candidatesFromCodesDir(spark, dir, queries, idx,
      nProbe = nProbe, nCandidates = 12)

    // plan fact: the parquet scan carries `cell IN (...)` as a PARTITION
    // filter (whole non-probed directories skipped at planning)
    val scans = pruned.queryExecution.sparkPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a parquet file scan of the codes store")
    val pf = scans.map(_.metadata.getOrElse("PartitionFilters", "")).mkString
    assert(pf.contains("cell"), s"probed cells must be a partition filter, got: $pf")
    assert(scans.exists(_.selectedPartitions.partitionCount <= nProbe),
      s"scan must read <= nProbe=$nProbe of ${idx.numCells} cell directories, " +
        s"read ${scans.map(_.selectedPartitions.partitionCount).mkString(",")}")

    // correctness: pruned store path == in-memory full-codes path
    val full = IvfPq.ivfPqCandidates(corpus, queries, idx,
      nProbe = nProbe, nCandidates = 12)
    assert(pruned.orderBy("query_id", "neighbor_id").collect().map(_.toSeq).toSeq ==
      full.orderBy("query_id", "neighbor_id").collect().map(_.toSeq).toSeq)
  }
}

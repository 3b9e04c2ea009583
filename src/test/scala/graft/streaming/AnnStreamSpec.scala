package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase
import graft.ext.PQ

class AnnStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8

  /** Deterministic synthetic vectors spread across directions. */
  private def vecs(ids: Range): Seq[(Long, Seq[Float])] =
    ids.map { i =>
      val v = (0 until dim).map(d => math.sin(0.7 * i + 1.3 * d).toFloat)
      (i.toLong, v)
    }

  private def toDF(rows: Seq[(Long, Seq[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def cfg(work: String, compactEvery: Int = 0) = AnnStreamConfig(
    inputDir = s"$work/in", indexDir = s"$work/index",
    checkpointDir = s"$work/ckpt", dim = dim,
    compactEveryNBatches = compactEvery)

  private val base = vecs(0 until 40)
  private val b1 = vecs(100 until 112)
  private val b2 = vecs(200 until 216)

  test("codebook save/load roundtrip is exact") {
    val work = tmpDir("annstream-cb")
    val c = cfg(work)
    val cb = AnnStream.initialize(spark, toDF(base), c, m = 4, k = 4, iterations = 2)
    val loaded = AnnStream.loadCodebooks(spark, c.indexDir)
    assert(loaded.m == cb.m && loaded.subDim == cb.subDim && loaded.k == cb.k)
    assert(loaded.books.map(_.map(_.toList).toList) ==
      cb.books.map(_.map(_.toList).toList))
  }

  test("streamed codes equal one batch encode of the full corpus") {
    val work = tmpDir("annstream-eq")
    val c = cfg(work)
    val cb = AnnStream.initialize(spark, toDF(base), c, m = 4, k = 4, iterations = 2)
    AnnStream.processBatch(toDF(b1), 0L, cb, c)
    AnnStream.processBatch(toDF(b2), 1L, cb, c)

    val streamed = AnnStream.readCodes(spark, c.indexDir)
      .as[(Long, Seq[Int])].collect().toMap
    val reference = PQ.encode(toDF(base ++ b1 ++ b2), cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(streamed == reference)
  }

  test("candidates from the materialized index equal the inline PQ path") {
    val work = tmpDir("annstream-cand")
    val c = cfg(work)
    val cb = AnnStream.initialize(spark, toDF(base), c, m = 4, k = 4, iterations = 2)
    AnnStream.processBatch(toDF(b1), 0L, cb, c)
    val all = toDF(base ++ b1)
    val queries = all.filter($"vec_id" % 10 === 0)

    val fromIndex = AnnStream.candidates(spark, c.indexDir, queries, nCandidates = 5)
      .as[(Long, Long)].collect().toSet
    val inline = PQ.pqCandidates(all, queries, cb, nCandidates = 5)
      .as[(Long, Long)].collect().toSet
    assert(fromIndex == inline && fromIndex.nonEmpty)
  }

  test("batch replay overwrites its own partition — no duplicate codes") {
    val work = tmpDir("annstream-replay")
    val c = cfg(work)
    val cb = AnnStream.initialize(spark, toDF(base), c, m = 4, k = 4, iterations = 2)
    AnnStream.processBatch(toDF(b1), 0L, cb, c)
    AnnStream.processBatch(toDF(b1), 0L, cb, c) // replay
    val n = AnnStream.readCodes(spark, c.indexDir).count()
    assert(n == (base.size + b1.size).toLong)
  }

  test("in-stream compaction folds old batch dirs; codes unchanged") {
    val work = tmpDir("annstream-compact")
    val c = cfg(work, compactEvery = 2)
    val cb = AnnStream.initialize(spark, toDF(base), c, m = 4, k = 4, iterations = 2)
    AnnStream.processBatch(toDF(b1), 0L, cb, c)
    AnnStream.processBatch(toDF(b2), 1L, cb, c)
    AnnStream.processBatch(toDF(vecs(300 until 305)), 2L, cb, c) // triggers compact(<=1)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(AnnStream.codesDir(c.indexDir)))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted.toSeq
    assert(dirs == Seq("batch=-1", "batch=2"), s"got $dirs")
    val streamed = AnnStream.readCodes(spark, c.indexDir)
      .as[(Long, Seq[Int])].collect().toMap
    val reference = PQ.encode(toDF(base ++ b1 ++ b2 ++ vecs(300 until 305)), cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(streamed == reference)
  }

  test("end-to-end through the streaming engine (file source, two feeds)") {
    val work = tmpDir("annstream-e2e")
    val c = cfg(work)
    val cb = AnnStream.initialize(spark, toDF(base), c, m = 4, k = 4, iterations = 2)

    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def feed(rows: Seq[(Long, Seq[Float])], n: Int): Unit = {
      val staging = tmpDir(s"ann-feed$n")
      toDF(rows).coalesce(1).write.mode("overwrite").parquet(staging)
      fs.mkdirs(new org.apache.hadoop.fs.Path(c.inputDir))
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(staging))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      fs.rename(part, new org.apache.hadoop.fs.Path(s"${c.inputDir}/feed$n.parquet"))
    }

    feed(b1, 0)
    val q = AnnStream.start(spark, c)
    try {
      q.processAllAvailable()
      feed(b2, 1)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = AnnStream.readCodes(spark, c.indexDir)
      .as[(Long, Seq[Int])].collect().toMap
    val reference = PQ.encode(toDF(base ++ b1 ++ b2), cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(streamed == reference)

    // and the query path works over the streamed store
    val queries = toDF(base.take(3))
    val top = AnnStream.topK(spark, c.indexDir, toDF(base ++ b1 ++ b2), queries, k = 3)
    assert(top.count() == 9L)
  }
}

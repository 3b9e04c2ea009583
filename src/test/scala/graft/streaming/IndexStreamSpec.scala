package graft.streaming

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.ext.Retrieval

class IndexStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def writeBatch(dir: String, name: String,
                         rows: Seq[(Long, String)]): Unit = {
    val staging = s"$dir/.staging"
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    val p = new org.apache.hadoop.fs.Path(staging)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val part = fs.listStatus(p).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/$name"))
    fs.delete(p, true)
  }

  private val b0 = Seq(
    (1L, "spark streaming makes incremental indexes easy"),
    (2L, "duckdb verifies the batch semantics exactly"),
    (3L, "bm25 ranks documents by term rarity and saturation"))
  private val b1 = Seq(
    (4L, "incremental indexes answer retrieval queries instantly"),
    (5L, "term rarity drives idf weighting in bm25 scoring"))
  private val b2 = Seq(
    (6L, "the streaming store must equal the batch index"),
    (7L, "spark and duckdb agree on every rounded score"))

  private val queries = Seq(
    (100L, "bm25"), (100L, "term"), (101L, "incremental"),
    (101L, "indexes"), (102L, "duckdb"))

  private def topKRows(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Double, Long)].collect()
      .sortBy(r => (r._1, r._4)).toSeq

  test("maintained index answers BM25 identically to the batch operator") {
    val (in, st, ck) = (tmpDir("idx-in"), tmpDir("idx-st"), tmpDir("idx-ck"))
    val cfg = IndexStreamConfig(in, st, ck, schema, maxFilesPerTrigger = 1)
    writeBatch(in, "b0.parquet", b0)
    val q = IndexStream.start(spark, cfg)
    q.processAllAvailable()
    writeBatch(in, "b1.parquet", b1)
    writeBatch(in, "b2.parquet", b2)
    q.processAllAvailable(); q.stop()

    val qdf = queries.toDF("query_id", "term")
    val streamed = topKRows(IndexStream.topK(spark, st, qdf, k = 3))
    val oneShot = topKRows(Retrieval.bm25TopK(
      (b0 ++ b1 ++ b2).toDF("doc_id", "text"), qdf, k = 3))
    assert(streamed == oneShot,
      "per-document index facts must fold to the exact batch semantics")
    assert(streamed.nonEmpty)
  }

  test("replay overwrites its own batch partition; compaction preserves answers") {
    val (in, st, ck) = (tmpDir("idx2-in"), tmpDir("idx2-st"), tmpDir("idx2-ck"))
    val cfg = IndexStreamConfig(in, st, ck, schema, maxFilesPerTrigger = 1)
    writeBatch(in, "b0.parquet", b0)
    writeBatch(in, "b1.parquet", b1)
    val q = IndexStream.start(spark, cfg)
    q.processAllAvailable(); q.stop()
    val qdf = queries.toDF("query_id", "term")
    val before = topKRows(IndexStream.topK(spark, st, qdf, k = 3))

    // replay batch 0: identical rows land in the same batch=0 partition
    IndexStream.processBatch(b0.toDF("doc_id", "text"), 0L, cfg)
    assert(topKRows(IndexStream.topK(spark, st, qdf, k = 3)) == before,
      "a replayed batch must rewrite, never duplicate")

    IndexStream.compact(spark, st)
    assert(topKRows(IndexStream.topK(spark, st, qdf, k = 3)) == before,
      "compaction must preserve the index contents exactly")
    // the folded generation is live; the absorbed batch dirs LINGER ONE
    // compaction cycle (delayed GC — in-flight readers that resolved
    // paths under the old watermark must still find their files)
    val fs = new org.apache.hadoop.fs.Path(st)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def parts(): Seq[String] = fs.listStatus(new org.apache.hadoop.fs.Path(
        IndexStream.postingsDir(st)))
      .filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
    assert(parts().contains("compacted=1"),
      s"expected the folded generation, got ${parts()}")

    // a replay of a batch the fold absorbed is SKIPPED by the watermark
    // — re-writing its (now gone) partition would duplicate its rows
    IndexStream.processBatch(b1.toDF("doc_id", "text"), 1L, cfg)
    assert(topKRows(IndexStream.topK(spark, st, qdf, k = 3)) == before,
      "a replayed pre-compaction batch must not re-enter the index")
    // while a genuinely NEW batch still lands
    IndexStream.processBatch(b2.toDF("doc_id", "text"), 2L, cfg)
    val withB2 = topKRows(IndexStream.topK(spark, st, qdf, k = 3))
    val oneShot = topKRows(Retrieval.bm25TopK(
      (b0 ++ b1 ++ b2).toDF("doc_id", "text"), qdf, k = 3))
    assert(withB2 == oneShot,
      "post-compaction appends must keep exact batch semantics")

    // the NEXT compaction sweeps what the previous one superseded —
    // the GC lag is exactly one cycle, not unbounded growth
    IndexStream.compact(spark, st)
    assert(topKRows(IndexStream.topK(spark, st, qdf, k = 3)) == withB2,
      "second compaction must preserve contents")
    val after = parts()
    assert(!after.contains("batch=0") && !after.contains("batch=1"),
      s"generation-1's absorbed batches must be swept one cycle later: $after")
    assert(after.contains("compacted=2"), s"new generation live: $after")
  }
}

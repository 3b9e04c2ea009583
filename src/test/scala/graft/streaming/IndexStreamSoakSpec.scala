package graft.streaming

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.ext.Retrieval

/** 40-trigger soak of the streaming BM25 index with in-stream
  * compaction every 10 batches: the maintained store must stay
  * bit-identical to the batch operator across repeated fold cycles,
  * the partition count must stay bounded, and replays across the
  * watermark must stay idempotent. */
class IndexStreamSoakSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("40 batches + periodic compaction: exact, bounded, replay-safe") {
    val (st, ck) = (tmpDir("idxsoak-st"), tmpDir("idxsoak-ck"))
    val cfg = IndexStreamConfig(tmpDir("idxsoak-in"), st, ck, schema,
      compactEveryNBatches = 10)
    val vocab = Seq("spark", "index", "bm25", "stream", "fold", "batch",
      "replay", "watermark", "store", "exact")
    def batchRows(b: Int): Seq[(Long, String)] =
      (0 until 5).map { i =>
        val id = b * 10L + i
        (id, (0 until 8).map(j => vocab(((b + 1) * (i + 3) * (j + 7)) % 10))
          .mkString(" "))
      }
    val all = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    (0 until 40).foreach { b =>
      val rows = batchRows(b)
      all ++= rows
      IndexStream.processBatch(rows.toDF("doc_id", "text"), b.toLong, cfg)
    }
    // replay a pre-watermark batch AND a post-watermark one: neither
    // may change the store (watermark skip / idempotent overwrite)
    IndexStream.processBatch(batchRows(7).toDF("doc_id", "text"), 7L, cfg)
    IndexStream.processBatch(batchRows(35).toDF("doc_id", "text"), 35L, cfg)

    val qdf = Seq((900L, "bm25"), (900L, "watermark"), (901L, "spark"),
      (901L, "fold")).toDF("query_id", "term")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    val streamed = rows(IndexStream.topK(spark, st, qdf, k = 5))
    val oneShot = rows(Retrieval.bm25TopK(all.toSeq.toDF("doc_id", "text"), qdf, k = 5))
    assert(streamed == oneShot,
      "40 folds + 4 compactions + replays must keep exact batch semantics")

    // partition count bounded: last compaction at batch 30 folded
    // 20..29; with one-cycle-delayed GC those linger until the NEXT
    // compaction, so live = 30..39 plus ≤10 lingering = ≤ 21 — bounded
    // by 2 × compactEveryNBatches + 1, never growing with stream length
    val fs = new org.apache.hadoop.fs.Path(st)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(
        IndexStream.postingsDir(st)))
      .filter(_.isDirectory).count(_.getPath.getName.startsWith("batch="))
    assert(parts <= 21, s"partition count must stay bounded, got $parts")
  }
}

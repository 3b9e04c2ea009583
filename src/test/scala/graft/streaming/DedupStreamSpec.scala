package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase

class DedupStreamSpec extends SparkTestBase {
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

  private def cfgFor(in: String, st: String, ck: String) =
    DedupStreamConfig(in, st, ck, schema, idCol = "doc_id",
      textCol = "text", buckets = 16, maxFilesPerTrigger = 1)

  private def batchIndex(rows: Seq[(Long, String)]): Seq[(Long, Long)] =
    rows.toDF("doc_id", "text")
      .groupBy(xxhash64(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("rep_id"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

  private def streamedIndex(st: String): Seq[(Long, Long)] =
    DedupStream.readIndex(spark, st)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

  test("streamed index equals the batch exact-dedup map over everything seen") {
    val (in, st, ck) = (tmpDir("ddp-in"), tmpDir("ddp-st"), tmpDir("ddp-ck"))
    val b0 = (0L until 40L).map(i => (100L + i, s"doc body ${i % 10}"))
    // cross-batch dups of b0's texts, including SMALLER ids for some —
    // the later batch must take over as representative (min-fold)
    val b1 = (0L until 20L).map(i => (if (i < 5) i else 300L + i, s"doc body ${i % 10}"))
    val b2 = (0L until 10L).map(i => (500L + i, s"fresh text $i"))
    writeBatch(in, "b0.parquet", b0)
    val q = DedupStream.start(spark, cfgFor(in, st, ck))
    q.processAllAvailable()
    writeBatch(in, "b1.parquet", b1)
    writeBatch(in, "b2.parquet", b2)
    q.processAllAvailable(); q.stop()

    val streamed = streamedIndex(st)
    val oneShot = batchIndex(b0 ++ b1 ++ b2)
    assert(streamed == oneShot,
      "incremental min-folds must equal the batch operator exactly")
    // the smaller late ids really displaced the earlier representatives
    assert(streamed.exists(_._2 < 5L),
      "a later batch with a smaller id must take over as representative")
  }

  test("replay is idempotent: re-folding a seen batch changes nothing") {
    val (in, st, ck) = (tmpDir("ddp2-in"), tmpDir("ddp2-st"), tmpDir("ddp2-ck"))
    val cfg = cfgFor(in, st, ck)
    val b0 = (0L until 30L).map(i => (i, s"page ${i % 7}"))
    writeBatch(in, "b0.parquet", b0)
    val q = DedupStream.start(spark, cfg)
    q.processAllAvailable(); q.stop()
    val first = streamedIndex(st)
    DedupStream.processBatch(b0.toDF("doc_id", "text"), 0L, cfg)
    assert(streamedIndex(st) == first,
      "min is idempotent — replay must reproduce identical index contents")
  }

  test("a fold rewrites only the buckets the batch touches") {
    val (in, st, ck) = (tmpDir("ddp3-in"), tmpDir("ddp3-st"), tmpDir("ddp3-ck"))
    val cfg = cfgFor(in, st, ck)
    val b0 = (0L until 64L).map(i => (i, s"spread $i")) // populate many buckets
    writeBatch(in, "b0.parquet", b0)
    val q = DedupStream.start(spark, cfg)
    q.processAllAvailable(); q.stop()

    def bucketFiles(): Map[String, Seq[String]] = {
      val root = new org.apache.hadoop.fs.Path(DedupStream.indexDir(st))
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(root).filter(_.isDirectory).map { d =>
        d.getPath.getName ->
          fs.listStatus(d.getPath).map(_.getPath.getName).sorted.toSeq
      }.toMap
    }
    val before = bucketFiles()

    val b1 = Seq((999L, "one new page"))
    val touched = spark.range(1)
      .select(pmod(xxhash64(lit("one new page")), lit(cfg.buckets)).cast("int"))
      .head().getInt(0)
    DedupStream.processBatch(b1.toDF("doc_id", "text"), 1L, cfg)
    val after = bucketFiles()
    before.foreach { case (bucket, files) =>
      if (bucket != s"__bucket=$touched")
        assert(after(bucket) == files,
          s"untouched $bucket must keep its exact files across a fold")
    }
    assert(after.contains(s"__bucket=$touched"))
  }
}

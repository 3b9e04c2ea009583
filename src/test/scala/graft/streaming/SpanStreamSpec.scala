package graft.streaming

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.ext.Dedup

class SpanStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  // width-2 tiles; ids increase with arrival order so streaming
  // first-arrival-wins coincides with batch global min-(doc, idx)
  private val b0 = Seq(
    (1L, "a b x y a b"), // tiles [a b][x y][a b] — internal dup
    (2L, "q r a b"))     // [q r][a b] — [a b] claimed by doc 1
  private val b1 = Seq(
    (10L, "x y fresh one"),   // [x y] claimed by batch 0; rest fresh
    (11L, "q r"),             // fully claimed -> empty
    (12L, "brand new stuff"))

  private def cfg(work: String) = SpanStreamConfig(
    inputDir = s"$work/in", outDir = s"$work/clean",
    checkpointDir = s"$work/ckpt", schema = schema, width = 2,
    maxFilesPerTrigger = 1)

  private def writeFeed(rows: Seq[(Long, String)], dir: String, n: Int): Unit = {
    val staging = tmpDir(s"span-stage$n")
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(staging))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/feed$n.parquet"))
  }

  test("streamed span dedup equals batch dedupTiles when ids follow arrival order") {
    val work = tmpDir("spanstream")
    val c = cfg(work)
    writeFeed(b0, c.inputDir, 0)
    val q = SpanStream.start(spark, c)
    try {
      q.processAllAvailable()
      writeFeed(b1, c.inputDir, 1)
      q.processAllAvailable()
    } finally q.stop()

    val got = SpanStream.readClean(spark, c.outDir)
      .select("doc_id", "n_tiles", "n_kept", "text_clean")
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    val want = Dedup.dedupTiles((b0 ++ b1).toDF("doc_id", "text"),
        "doc_id", "text", width = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == want)
    // the claimed-tile registry holds exactly the distinct tiles
    val reg = SpanStream.readRegistry(spark, c.outDir)
    assert(reg.select("__k").distinct().count() == reg.count(),
      "registry must never double-claim a digest")
  }

  test("replayed batch is idempotent: same output dir, no double-claims") {
    val work = tmpDir("spanstream-replay")
    val c = cfg(work)
    writeFeed(b0, c.inputDir, 0)
    val q = SpanStream.start(spark, c)
    try q.processAllAvailable() finally q.stop()
    val before = SpanStream.readClean(spark, c.outDir)
      .orderBy("doc_id").collect().toSeq
    val regBefore = SpanStream.readRegistry(spark, c.outDir)
      .select("__k").orderBy("__k").collect().toSeq

    // re-deliver batch 0 by hand — the foreachBatch replay path
    SpanStream.processBatch(b0.toDF("doc_id", "text"), 0L, c)
    val after = SpanStream.readClean(spark, c.outDir)
      .orderBy("doc_id").collect().toSeq
    val regAfter = SpanStream.readRegistry(spark, c.outDir)
      .select("__k").orderBy("__k").collect().toSeq
    assert(after == before && regAfter == regBefore)
  }

  test("a later batch never reclaims an earlier batch's tiles") {
    val work = tmpDir("spanstream-order")
    val c = cfg(work)
    writeFeed(b0, c.inputDir, 0)
    val q = SpanStream.start(spark, c)
    try {
      q.processAllAvailable()
      // doc 20 duplicates doc 1's text EXACTLY: every tile already
      // claimed, the cleaned text must be empty
      writeFeed(Seq((20L, "a b x y a b")), c.inputDir, 1)
      q.processAllAvailable()
    } finally q.stop()
    val row = SpanStream.readClean(spark, c.outDir)
      .filter(col("doc_id") === 20L)
      .select("n_tiles", "n_kept", "text_clean")
      .as[(Long, Long, String)].head()
    assert(row == ((3L, 0L, "")))
  }
}

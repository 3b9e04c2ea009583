package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.ext.Dedup

class DocStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("source", StringType)))

  private def doc(id: Long, text: String, source: String = "web") =
    (id, text, source)

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private def nearOf(t: String) = t.replace("today", "tonight")

  // batch 0: three distinct docs (one exact-dup pair inside)
  private val b0 = Seq(
    doc(1, base),
    doc(2, "completely different second document about spark and scala engines"),
    doc(3, base)) // exact dup of 1 within the batch
  // batch 1: exact dup of corpus, near dup of corpus, internal near-dup
  // pair, and one genuinely fresh doc
  private val freshText = "a genuinely new third topic entirely unrelated to anything prior"
  private val b1 = Seq(
    doc(10, base), // exact dup of corpus doc 1
    doc(11, nearOf(base)), // near dup of corpus doc 1
    doc(12, freshText),
    doc(13, nearOf(freshText)), // near dup of 12 within the batch
    doc(14, "yet another unrelated document mentioning databases and storage"))

  private def cfg(work: String) = DocStreamConfig(
    inputDir = s"$work/in", corpusDir = s"$work/corpus",
    checkpointDir = s"$work/ckpt", schema = schema, threshold = 0.5,
    maxFilesPerTrigger = 1)

  // the file-stream source lists files at the top level of inputDir, so
  // each feed is staged as one part file moved into the root
  private def writeFeed(rows: Seq[(Long, String, String)], dir: String, n: Int): Unit = {
    val staging = tmpDir(s"feed-stage$n")
    rows.toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(staging))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/feed$n.parquet"))
  }

  test("streamed corpus equals the sequential batch dedupIncrement reference") {
    val work = tmpDir("docstream")
    val c = cfg(work)
    writeFeed(b0, c.inputDir, 0) // the source dir must exist before start
    val q = DocStream.start(spark, c)
    try {
      q.processAllAvailable()
      writeFeed(b1, c.inputDir, 1)
      q.processAllAvailable()
    } finally q.stop()

    val got = DocStream.readCorpus(spark, c.corpusDir)
    // reference: batch-mode pipeline over the same boundaries
    val r0 = Dedup.dedupCorpus(b0.toDF("doc_id", "text", "source"),
      "doc_id", "text", threshold = 0.5)
    val r1 = Dedup.dedupIncrement(r0, b1.toDF("doc_id", "text", "source"),
      "doc_id", "text", threshold = 0.5)
    val expected = r0.select("doc_id").unionAll(r1.select("doc_id"))
      .as[Long].collect().toSet

    assert(got.select("doc_id").as[Long].collect().toSet == expected)
    // the planted structure itself: 1 survives (3, 10, 11 die), 2 does,
    // 12 survives (13 dies), 14 does
    assert(expected == Set(1L, 2L, 12L, 14L))
    // survivors carry provenance: which micro-batch admitted them
    val byBatch = got.select(col("doc_id").cast("long"), col("batch").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(byBatch(1L) == 0L && byBatch(12L) == 1L)
    // signature table mirrors the corpus rows exactly
    val sigIds = DocStream.readSigs(spark, c.corpusDir)
      .select("id").as[Long].collect().toSet
    assert(sigIds == expected)
  }

  test("compaction merges history into batch=-1; replay and new batches stay correct") {
    val work = tmpDir("docstream-compact")
    val c = cfg(work)
    DocStream.processBatch(b0.toDF("doc_id", "text", "source"), 0L, c)
    DocStream.processBatch(b1.toDF("doc_id", "text", "source"), 1L, c)
    val before = DocStream.readCorpus(spark, c.corpusDir)
      .select("doc_id").as[Long].collect().toSet

    DocStream.compact(spark, c.corpusDir, upToBatch = 1L)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(c.corpusDir))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).toSet
    assert(parts == Set("batch=-1"), s"got $parts")
    assert(DocStream.readCorpus(spark, c.corpusDir)
      .select("doc_id").as[Long].collect().toSet == before)
    assert(DocStream.readSigs(spark, c.corpusDir)
      .select("id").as[Long].collect().toSet == before)

    // a replayed old batch is a no-op against the compacted corpus
    DocStream.processBatch(b1.toDF("doc_id", "text", "source"), 1L, c)
    assert(DocStream.readCorpus(spark, c.corpusDir)
      .select("doc_id").as[Long].collect().toSet == before)

    // and a genuinely new batch still dedups against compacted history
    val b2 = Seq(doc(20, base), // dup of compacted doc 1 -> drop
      doc(21, "an entirely novel post-compaction document about gardens"))
    DocStream.processBatch(b2.toDF("doc_id", "text", "source"), 2L, c)
    assert(DocStream.readCorpus(spark, c.corpusDir)
      .select("doc_id").as[Long].collect().toSet == before + 21L)
  }

  test("replaying a micro-batch is idempotent (overwrite, not double-append)") {
    val work = tmpDir("docstream-replay")
    val c = cfg(work)
    DocStream.processBatch(b0.toDF("doc_id", "text", "source"), 0L, c)
    DocStream.processBatch(b1.toDF("doc_id", "text", "source"), 1L, c)
    val before = DocStream.readCorpus(spark, c.corpusDir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // a restart replays batch 1: same directory rewritten, corpus stable;
    // in particular batch 1's own partial write must not make the replay
    // drop its docs as "duplicates of the corpus"
    DocStream.processBatch(b1.toDF("doc_id", "text", "source"), 1L, c)
    val after = DocStream.readCorpus(spark, c.corpusDir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(after == before)
    assert(after == Seq(1L, 2L, 12L, 14L))
  }
}

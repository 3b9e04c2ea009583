package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.ext.Retrieval

/** The maintained positional index: postings are per-document facts, so
  * searching the store must be BIT-IDENTICAL to the one-shot
  * [[Retrieval.phraseSearch]] over the concatenated corpus — under any
  * batch split, replays, and mid-stream compaction. */
class PosIndexStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  // doc 1 holds the phrase once; doc 2 twice (incl. a later repeat);
  // doc 3 holds a self-overlapping run of "a a a" (two occurrences of
  // "a a"); doc 4 has the tokens permuted (must NOT match); doc 5 null
  private val corpus = Seq(
    (1L, "x quick brown fox y"),
    (2L, "quick brown fox z quick brown fox"),
    (3L, "p a a a q"),
    (4L, "fox brown quick"),
    (5L, null: String))
  private val phrases = Seq(
    (10L, "quick brown fox"), (11L, "a a"), (12L, "no such phrase"))

  private def cfgFor(st: String) = PosIndexStreamConfig(
    s"$st/_in_unused", st, s"$st/_ck_unused", schema)

  private def searched(st: String): Seq[(Long, Long, Long, Long)] =
    PosIndexStream.phraseSearch(spark, st, phrases.toDF("phrase_id", "phrase"))
      .select("phrase_id", "doc_id", "n_matches", "first_pos")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq

  private def oneShot(): Seq[(Long, Long, Long, Long)] =
    Retrieval.phraseSearch(corpus.toDF("doc_id", "text"),
        phrases.toDF("phrase_id", "phrase"))
      .select("phrase_id", "doc_id", "n_matches", "first_pos")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq

  test("maintained search == one-shot under splits, replay, and compaction") {
    val st = tmpDir("pix-st")
    val cfg = cfgFor(st)
    PosIndexStream.processBatch(
      corpus.take(2).toDF("doc_id", "text"), 0L, cfg)
    PosIndexStream.processBatch(
      corpus.slice(2, 3).toDF("doc_id", "text"), 1L, cfg)
    PosIndexStream.processBatch( // at-least-once replay: overwrite, not double
      corpus.slice(2, 3).toDF("doc_id", "text"), 1L, cfg)
    PosIndexStream.compact(spark, st, upToBatch = 1L)
    PosIndexStream.processBatch( // incl. the null-text doc: filtered, not fatal
      corpus.drop(3).toDF("doc_id", "text"), 2L, cfg)

    val got = searched(st)
    assert(got == oneShot(), s"maintained index diverged: $got")
    // the semantics the index must preserve: repeats counted with the
    // FIRST position reported, self-overlapping occurrences both found,
    // permutations rejected, absent phrases absent
    assert(got == Seq((10L, 1L, 1L, 1L), (10L, 2L, 2L, 0L), (11L, 3L, 2L, 1L)))
    val dirs = new java.io.File(PosIndexStream.postingsDir(st))
      .listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs == Seq("batch=-1", "batch=2"),
      s"committed partitions must fold, later ones append: $dirs")
  }

  test("file-source end-to-end: documents arriving as files index without restarts") {
    val (in, st, ck) = (tmpDir("pix-in"), tmpDir("pix-st2"), tmpDir("pix-ck"))
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = s"$in/.staging"
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      val p = new org.apache.hadoop.fs.Path(staging)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val part = fs.listStatus(p).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$in/$name")): Unit
      fs.delete(p, true): Unit
    }
    writeBatch("b0.parquet", corpus.take(2))
    val q = PosIndexStream.start(spark, PosIndexStreamConfig(
      in, st, ck, schema, maxFilesPerTrigger = 1))
    try {
      q.processAllAvailable()
      writeBatch("b1.parquet", corpus.drop(2).filter(_._2 != null))
      q.processAllAvailable()
    } finally q.stop()
    assert(searched(st) == oneShot())
  }
}

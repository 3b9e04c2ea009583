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
    // the folded generation is live and batch=2 appended after it;
    // absorbed batches 0/1 LINGER one GC cycle by design (readers
    // select by watermark, so stragglers are never read)
    assert(dirs.contains("compacted=1") && dirs.contains("batch=2"),
      s"committed partitions must fold, later ones append: $dirs")
    // a replayed pre-watermark batch is SKIPPED — re-appending postings
    // already inside the generation would double-count every occurrence
    PosIndexStream.processBatch(
      corpus.slice(2, 3).toDF("doc_id", "text"), 1L, cfgFor(st))
    assert(searched(st) == oneShot(),
      "a replayed pre-watermark batch must not re-enter the index")
  }

  test("a searcher racing compaction re-snapshots instead of failing") {
    val st = tmpDir("pix-race")
    val cfg = cfgFor(st)
    PosIndexStream.processBatch(
      corpus.filter(_._2 != null).toDF("doc_id", "text"), 0L, cfg)
    val want = oneShot()
    // a compactor thread folds repeatedly (each cycle supersedes the
    // previous generation and GC-sweeps the one before it) while the
    // searcher loops phrase probes — every search must see the full
    // index, either by landing inside a snapshot window or by the
    // action-time retry re-snapshotting after a lost race
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val compactor = new Thread(() => {
      var b = 1L
      while (!stop.get()) {
        try {
          // re-index doc 6/7 noise each cycle so every compact() has
          // something to absorb (and therefore commits + GCs); the
          // noise doc contains no probed phrase, so searches are stable
          PosIndexStream.processBatch(
            Seq((100L + b, s"noise$b filler$b")).toDF("doc_id", "text"), b, cfg)
          PosIndexStream.compact(spark, st, upToBatch = b)
          b += 1
        } catch { case t: Throwable => failed.set(t); stop.set(true) }
      }
    })
    compactor.start()
    try {
      (0 until 12).foreach { _ =>
        val got = searched(st)
        assert(got == want, s"racing searcher saw a torn index: $got")
      }
    } finally { stop.set(true); compactor.join(30000) }
    assert(failed.get() == null, s"compactor thread failed: ${failed.get()}")
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
    val cfg = PosIndexStreamConfig(in, st, ck, schema, maxFilesPerTrigger = 1)
    writeBatch("b0.parquet", corpus.take(2))
    val q = PosIndexStream.start(spark, cfg)
    try {
      q.processAllAvailable()
      writeBatch("b1.parquet", corpus.slice(2, 3))
      q.processAllAvailable()
    } finally q.stop()
    // RESTART on the same checkpoint: the resumed stream must pick up
    // files landed while down (and only those — no re-indexing of
    // already-committed batches, or occurrences would double-count)
    writeBatch("b2.parquet", corpus.drop(3).filter(_._2 != null))
    val q2 = PosIndexStream.start(spark, cfg)
    try q2.processAllAvailable() finally q2.stop()
    assert(searched(st) == oneShot(),
      "restarted stream must resume exactly where the checkpoint left off")
  }
}

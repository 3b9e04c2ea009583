package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.ext.Dedup

/** The streaming decontamination registry: benchmark suites accrete as
  * micro-batches; cutting the corpus against the store must be
  * BIT-IDENTICAL to the one-shot batch pass over the union of every
  * suite seen — under any fold split, replays, and mid-stream
  * compaction (set union is associative + idempotent; the mark join is
  * a semi-join, so pre-compaction cross-batch duplicates are
  * harmless). */
class DecontamStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  // corpus: doc 1 quotes suite A's window; doc 2 quotes suite B's; doc 3
  // quotes C's; doc 4 is clean; doc 5 is shorter than minLen and doc 6
  // null — both must pass through untouched (n_kept == n_tokens / 0)
  private def tok(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")
  private val quoteA = tok("qa", 4)
  private val quoteB = tok("qb", 4)
  private val quoteC = tok("qc", 4)
  private lazy val corpus = Seq(
    (1L, s"${tok("x", 5)} $quoteA ${tok("y", 5)}"),
    (2L, s"${tok("u", 3)} $quoteB ${tok("v", 6)}"),
    (3L, s"$quoteC ${tok("w", 8)}"),
    (4L, tok("clean", 12)),
    (5L, "too short"),
    (6L, null: String)).toDF("doc_id", "text")
  private val suiteA = Seq((100L, s"${tok("fillA", 9)} $quoteA"))
  private val suiteB = Seq((200L, s"$quoteB ${tok("fillB", 9)}"))
  private val suiteC = Seq((300L, s"${tok("fillC", 4)} $quoteC ${tok("gC", 4)}"))

  private def cfgFor(st: String) = DecontamStreamConfig(
    s"$st/_in_unused", st, s"$st/_ck_unused", schema, minLen = 4)

  private def cut(st: String): Seq[(Long, Long, Long, String)] =
    DecontamStream.decontaminate(spark, st, corpus, minLen = 4)
      .select("doc_id", "n_tokens", "n_kept", "text_clean")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq

  private def oneShot(suites: Seq[(Long, String)]): Seq[(Long, Long, Long, String)] =
    Dedup.exactSubstrDecontaminate(corpus, suites.toDF("doc_id", "text"),
        "doc_id", "text", minLen = 4)
      .select("doc_id", "n_tokens", "n_kept", "text_clean")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq

  test("registry folds + replay + compaction cut identically to the one-shot pass") {
    val st = tmpDir("dcs-st")
    val cfg = cfgFor(st)
    DecontamStream.processBatch(suiteA.toDF("doc_id", "text"), 0L, cfg)
    DecontamStream.processBatch(suiteB.toDF("doc_id", "text"), 1L, cfg)
    // replay of batch 1 (at-least-once delivery): overwrite, not double
    DecontamStream.processBatch(suiteB.toDF("doc_id", "text"), 1L, cfg)

    // incremental semantics: two suites registered -> doc 3 still whole
    val after2 = cut(st)
    assert(after2 == oneShot(suiteA ++ suiteB))
    assert(after2.find(_._1 == 3L).get._3 == 12L, "suite C not registered yet")

    // compaction mid-stream, then a third suite lands
    DecontamStream.compact(spark, st, upToBatch = 1L)
    DecontamStream.processBatch(suiteC.toDF("doc_id", "text"), 2L, cfg)

    val got = cut(st)
    val want = oneShot(suiteA ++ suiteB ++ suiteC)
    assert(got == want, s"streamed registry diverged\ngot:  $got\nwant: $want")
    // the quotes really left; clean/short/null docs pass through whole
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._3 == byId(1L)._2 - 4 && !byId(1L)._4.contains("qa0"))
    assert(byId(4L)._3 == 12L && byId(5L)._3 == 2L)
    assert(!byId.contains(6L), "null text is outside the pass, as in the batch operator")
  }

  test("compaction bounds the store: distinct generation, replay-guarded, GC'd one cycle later") {
    val st = tmpDir("dcs-cp")
    val cfg = cfgFor(st)
    // the same suite registered across three batches — the append-only
    // store holds 3x duplicates until compact folds them to the set
    Seq(0L, 1L, 2L).foreach(i =>
      DecontamStream.processBatch(suiteA.toDF("doc_id", "text"), i, cfg))
    val before = DecontamStream.readDigests(spark, st).count()
    DecontamStream.compact(spark, st, upToBatch = 2L)
    val after = DecontamStream.readDigests(spark, st).count()
    assert(before == after * 3, s"3 identical batches: $before vs $after")
    assert(cut(st) == oneShot(suiteA), "compaction must not change the cut")
    def dirs(): Seq[String] = new java.io.File(DecontamStream.digestsDir(st))
      .listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
    // generation live; absorbed batches LINGER one cycle (delayed GC —
    // an in-flight reader that resolved paths pre-commit must still
    // find its files), so readers select by watermark, not listing
    assert(dirs().contains("compacted=2"), s"generation must be live: ${dirs()}")
    // a replay of an absorbed batch is SKIPPED by the watermark guard
    DecontamStream.processBatch(suiteA.toDF("doc_id", "text"), 1L, cfg)
    assert(DecontamStream.readDigests(spark, st).count() == after,
      "a replayed pre-watermark batch must not re-enter the store")
    // a genuinely NEW batch lands; the next compaction absorbs it AND
    // sweeps what the previous one superseded
    DecontamStream.processBatch(suiteB.toDF("doc_id", "text"), 3L, cfg)
    DecontamStream.compact(spark, st, upToBatch = 3L)
    assert(cut(st) == oneShot(suiteA ++ suiteB))
    val d = dirs()
    assert(!d.exists(_.matches("batch=[012]")),
      s"generation-2's absorbed batches must be swept one cycle later: $d")
    assert(d.contains("compacted=3"), s"new generation live: $d")
  }

  test("a reader racing compaction re-snapshots instead of failing") {
    val st = tmpDir("dcs-race")
    val cfg = cfgFor(st)
    DecontamStream.processBatch(suiteA.toDF("doc_id", "text"), 0L, cfg)
    DecontamStream.processBatch(suiteB.toDF("doc_id", "text"), 1L, cfg)
    val want = oneShot(suiteA ++ suiteB)
    // a compactor thread folds repeatedly (each cycle supersedes the
    // previous generation and GC-sweeps the one before it) while the
    // reader loops full decontaminate passes — every read must see the
    // complete registry, either by landing inside a snapshot window or
    // by the action-time retry re-snapshotting after a lost race
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val compactor = new Thread(() => {
      var b = 2L
      while (!stop.get()) {
        try {
          // alternate a tiny new batch with a fold so every compact()
          // call has something to absorb (and therefore commits + GCs)
          DecontamStream.processBatch(suiteC.toDF("doc_id", "text"), b, cfg)
          DecontamStream.compact(spark, st, upToBatch = b)
          b += 1
        } catch { case t: Throwable => failed.set(t); stop.set(true) }
      }
    })
    compactor.start()
    try {
      val wantAll = oneShot(suiteA ++ suiteB ++ suiteC)
      (0 until 12).foreach { _ =>
        val got = cut(st)
        // suite C may or may not be registered yet at this instant, but
        // A and B are immutable history: both states are complete reads
        assert(got == want || got == wantAll,
          s"racing reader saw a torn registry: $got")
      }
    } finally { stop.set(true); compactor.join(30000) }
    assert(failed.get() == null, s"compactor thread failed: ${failed.get()}")
  }

  test("file-source end-to-end: suites arriving as files register without restarts") {
    val (in, st, ck) = (tmpDir("dcs-in"), tmpDir("dcs-st2"), tmpDir("dcs-ck"))
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
    writeBatch("b0.parquet", suiteA)
    val q = DecontamStream.start(spark, DecontamStreamConfig(
      in, st, ck, schema, minLen = 4, maxFilesPerTrigger = 1))
    try {
      q.processAllAvailable()
      writeBatch("b1.parquet", suiteB)
      writeBatch("b2.parquet", suiteC)
      q.processAllAvailable()
    } finally q.stop()
    assert(cut(st) == oneShot(suiteA ++ suiteB ++ suiteC))
  }

  test("an all-short/null benchmark batch registers nothing and breaks nothing") {
    val st = tmpDir("dcs-empty")
    val cfg = cfgFor(st)
    DecontamStream.processBatch(
      Seq((9L, "tiny"), (10L, null: String)).toDF("doc_id", "text"), 0L, cfg)
    assert(!new java.io.File(DecontamStream.digestsDir(st)).exists())
    DecontamStream.processBatch(suiteA.toDF("doc_id", "text"), 1L, cfg)
    assert(cut(st) == oneShot(suiteA))
  }
}

package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.ext.{Unigram, WordPiece}

/** The streaming vocabulary-statistics store: corpus shards accrete as
  * micro-batches; the maintained word counts — and every tokenizer
  * artifact derived from them (WordPiece vocabulary, unigram
  * inventory) — must be BIT-IDENTICAL to the one-shot aggregation over
  * everything ingested, under any fold split, replays (before AND at
  * the compaction watermark), mid-stream compaction, a concurrent
  * reader-vs-compactor race, and the real file-source stream with a
  * checkpoint restart. */
class VocabStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private lazy val corpus = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text").limit(120).cache()

  private def cfgFor(st: String) = VocabStreamConfig(
    s"$st/_in_unused", st, s"$st/_ck_unused", schema)

  private def third(k: Int) = corpus.filter(col("doc_id") % 3 === k)

  private def countsOf(st: String): Map[String, Long] =
    VocabStream.wordCounts(spark, st).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private lazy val oneShot: Map[String, Long] =
    WordPiece.wordCounts(corpus).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("folds + replays + mid-stream compaction ≡ one-shot counts; derived artifacts identical") {
    val st = tmpDir("vcs-base")
    val cfg = cfgFor(st)
    VocabStream.processBatch(third(0), 0L, cfg)
    VocabStream.processBatch(third(1), 1L, cfg)
    // replay BEFORE compaction: idempotent overwrite, counts cannot double
    VocabStream.processBatch(third(1), 1L, cfg)
    VocabStream.compact(spark, st, upToBatch = 1L)
    // replay AT the watermark: the guard must skip it outright
    VocabStream.processBatch(third(0), 0L, cfg)
    VocabStream.processBatch(third(2), 2L, cfg)
    assert(countsOf(st) == oneShot,
      "maintained counts must equal the one-shot aggregation")
    // identical counts force identical DERIVED artifacts
    assert(VocabStream.wordPieceVocab(spark, st) == WordPiece.trainVocab(corpus))
    assert(VocabStream.unigramPieces(spark, st) == Unigram.trainPieces(corpus))
    // second compaction absorbs batch 2 and pre-sums per word: one row
    // per word in the generation, counts unchanged
    VocabStream.compact(spark, st, upToBatch = 2L)
    assert(countsOf(st) == oneShot)
    val gen = spark.read.parquet(s"${VocabStream.countsDir(st)}/compacted=2")
    assert(gen.groupBy("word").count().filter(col("count") > 1).isEmpty,
      "the folded generation must carry one pre-summed row per word")
  }

  test("a reader racing compaction re-snapshots instead of failing") {
    val st = tmpDir("vcs-race")
    val cfg = cfgFor(st)
    VocabStream.processBatch(third(0), 0L, cfg)
    VocabStream.processBatch(third(1), 1L, cfg)
    val want01 = WordPiece.wordCounts(third(0).unionByName(third(1)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // each compactor iteration legitimately ingests one more copy of
    // `extra` under a FRESH batch id (counts are additive facts, not a
    // set) — so a CONSISTENT read shows the immutable base history
    // exactly, plus (zzq, zzr) = (2m, m) for some m ≥ 0; anything else
    // (a missing base word, a half-visible extra batch, a double-read
    // generation) is a torn read
    val extra = Seq((900001L, "zzq zzq zzr")).toDF("doc_id", "text")
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val compactor = new Thread(() => {
      var b = 2L
      while (!stop.get()) {
        try {
          VocabStream.processBatch(extra, b, cfg)
          VocabStream.compact(spark, st, upToBatch = b)
          b += 1
        } catch { case t: Throwable => failed.set(t); stop.set(true) }
      }
    })
    compactor.start()
    try {
      (0 until 10).foreach { _ =>
        val got = countsOf(st)
        val zzq = got.getOrElse("zzq", 0L)
        val zzr = got.getOrElse("zzr", 0L)
        assert(zzq == 2 * zzr,
          s"racing reader saw a half-visible extra batch: zzq=$zzq zzr=$zzr")
        assert(got - "zzq" - "zzr" == want01,
          s"racing reader saw torn base counts (distinct words: ${got.size})")
      }
    } finally { stop.set(true); compactor.join(30000) }
    assert(failed.get() == null, s"compactor thread failed: ${failed.get()}")
  }

  test("file-source end-to-end with a checkpoint RESTART") {
    val (in, st, ck) = (tmpDir("vcs-in"), tmpDir("vcs-st"), tmpDir("vcs-ck"))
    def writeShard(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val staging = s"$in/.staging"
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val p = new org.apache.hadoop.fs.Path(staging)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val part = fs.listStatus(p).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$in/$name")): Unit
      fs.delete(p, true): Unit
    }
    writeShard("s0.parquet", third(0))
    val cfg = VocabStreamConfig(in, st, ck, schema, maxFilesPerTrigger = 1)
    val q1 = VocabStream.start(spark, cfg)
    try q1.processAllAvailable() finally q1.stop()
    // restart from the checkpoint; two more shards arrive
    writeShard("s1.parquet", third(1))
    writeShard("s2.parquet", third(2))
    val q2 = VocabStream.start(spark, cfg)
    try q2.processAllAvailable() finally q2.stop()
    assert(countsOf(st) == oneShot,
      "counts across a checkpoint restart must equal the one-shot aggregation")
    assert(VocabStream.wordPieceVocab(spark, st) == WordPiece.trainVocab(corpus))
  }

  test("an all-empty batch writes nothing and an empty store reads empty") {
    val st = tmpDir("vcs-empty")
    val cfg = cfgFor(st)
    assert(countsOf(st).isEmpty, "an untouched store must read as empty")
    VocabStream.processBatch(
      Seq((1L, null: String), (2L, "")).toDF("doc_id", "text"), 0L, cfg)
    assert(!new java.io.File(VocabStream.countsDir(st)).exists())
    VocabStream.processBatch(third(0), 1L, cfg)
    assert(countsOf(st) ==
      WordPiece.wordCounts(third(0)).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
  }
}

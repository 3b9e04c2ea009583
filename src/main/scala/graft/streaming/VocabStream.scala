package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Config for the streaming vocabulary-statistics store. `textCol`
  * must stay constant for the life of a store directory (the counts
  * are whitespace-token facts of that column). */
final case class VocabStreamConfig(
    inputDir: String, storeDir: String, checkpointDir: String,
    schema: StructType, textCol: String = "text",
    maxFilesPerTrigger: Int = 100)

/** Streaming vocabulary-statistics store: exact per-word counts
  * maintained incrementally as corpus shards arrive — the substrate
  * every frequency-derived tokenizer artifact (WordPiece vocabulary,
  * unigram piece inventory, token spectra, budget accounting) reads
  * from, without ever re-scanning the historical corpus. A pipeline
  * that re-derives its tokenizer as the corpus grows consults this
  * store, not the corpus.
  *
  * Why this folds exactly: the state is a MULTISET of word counts and
  * addition is ASSOCIATIVE and COMMUTATIVE — fold order and batch
  * boundaries cannot change any total; replay safety is the Ingest
  * `batch=<id>` overwrite discipline (a re-delivered micro-batch
  * rewrites its own partial-count partition with identical content)
  * plus the [[GenerationStore]] watermark guard (a batch at or below
  * the compaction watermark is already inside the folded generation
  * and is SKIPPED). Readers sum partials per word, so duplicate rows
  * across batch partitions never exist and partial granularity is
  * read-invisible; [[compact]]'s fold transform pre-sums per word —
  * read-equivalent by the same associativity, it only bounds store
  * size and listing cost.
  *
  * The derivation seam: [[wordPieceVocab]] and [[unigramPieces]] run
  * the EXACT SAME derivations as the one-shot trainers
  * ([[graft.ext.WordPiece.vocabFrameFromCounts]],
  * [[graft.ext.Unigram.pieceFrameFromCounts]]) over the maintained
  * counts — identical counts ⇒ identical artifacts, so the maintained
  * path answers the one-shot oracles VERBATIM (q194/q195 gate it
  * against q188's and q191's DuckDB replays).
  *
  * Scale shape: a trigger writes O(distinct words in batch) partial
  * rows and reads NOTHING; the read-side sum shuffles on a key space
  * the size of the language's vocabulary; derivations collect a
  * bounded frame. Compaction runs through the reader-safe
  * [[GenerationStore]] swap (watermark snapshot + one-cycle-delayed GC
  * + action-time retry), so it is safe concurrent with readers. */
object VocabStream {

  private val TableName = "_word_counts"

  def countsDir(storeDir: String): String = s"$storeDir/$TableName"

  private val CountsSchema = StructType(Seq(
    StructField("word", StringType), StructField("n", LongType)))

  private def frames(storeDir: String): Seq[GenFrame] = Seq(
    // pre-sum per word at fold time: read-equivalent (readers sum
    // anyway), store size converges to the true vocabulary size
    GenFrame(countsDir(storeDir), Seq("word", "n"),
      _.groupBy("word").agg(sum("n").as("n"))))

  /** Exact word counts over everything ever ingested: partials summed
    * under ONE watermark snapshot and MATERIALIZED inside it
    * (localCheckpoint), so the returned frame has no validity window.
    * An empty store reads as an empty frame. */
  def wordCounts(spark: SparkSession, storeDir: String): DataFrame =
    GenerationStore.withSnapshot(spark, storeDir) { wm =>
      GenerationStore.frameAtOrEmpty(spark, frames(storeDir).head, wm,
          CountsSchema)
        .groupBy("word").agg(sum("n").as("n"))
        .localCheckpoint(eager = true)
    }

  /** The WordPiece vocabulary derived from the maintained counts —
    * bit-identical to [[graft.ext.WordPiece.trainVocab]] over the
    * ingested corpus (the collect materializes inside the snapshot). */
  def wordPieceVocab(spark: SparkSession, storeDir: String,
                     topWords: Int = 16, topAffixes: Int = 8,
                     affixLens: Seq[Int] = Seq(2, 3, 4)): graft.ext.WordPiece.Vocab =
    graft.ext.WordPiece.collectVocab(
      graft.ext.WordPiece.vocabFrameFromCounts(
        wordCounts(spark, storeDir), topWords, topAffixes, affixLens))

  /** The unigram piece inventory derived from the maintained counts —
    * bit-identical to [[graft.ext.Unigram.trainPieces]] over the
    * ingested corpus. */
  def unigramPieces(spark: SparkSession, storeDir: String,
                    topSub: Int = 24, maxLen: Int = 4): Seq[(String, Long)] =
    graft.ext.Unigram.collectPieces(
      graft.ext.Unigram.pieceFrameFromCounts(
        wordCounts(spark, storeDir), topSub, maxLen))

  /** The character-grain BPE merge table derived from the maintained
    * counts — bit-identical to [[graft.ext.TextAnalysis
    * .bpeMergesFromCounts]] over the one-shot aggregation of the
    * ingested corpus: the trainer is a pure function of the word-count
    * multiset, which the store folds additively, so identical counts
    * force the identical merge table (q197 gates it against the
    * one-shot spectrum-replay oracle verbatim). Completes the
    * maintained-tokenizer family: one store now serves WordPiece,
    * unigram AND BPE artifacts without re-scanning the corpus. */
  def bpeMerges(spark: SparkSession, storeDir: String,
                rounds: Int = 48, batchCap: Int = 16): DataFrame =
    graft.ext.TextAnalysis.bpeMergesFromCounts(
      wordCounts(spark, storeDir), rounds, batchCap)

  def start(spark: SparkSession, cfg: VocabStreamConfig): StreamingQuery =
    spark.readStream
      .schema(cfg.schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.inputDir)
      .writeStream
      .queryName(s"graft-vocab-${CdcStream.streamId()}")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) => processBatch(batch, id, cfg))
      .start()

  /** One micro-batch of corpus documents. Public so tests, batch
    * backfills, and the declared-query gate can drive exact batch
    * boundaries. */
  def processBatch(batch: DataFrame, batchId: Long,
                   cfg: VocabStreamConfig): Unit = {
    val spark = batch.sparkSession
    // a batch at or below the compaction watermark is ALREADY folded
    if (batchId <= GenerationStore.readWatermark(spark, cfg.storeDir)) return
    val counts = graft.ext.WordPiece.wordCounts(batch, cfg.textCol).persist()
    try {
      // an all-empty batch writes nothing (replay of it is a no-op)
      if (!counts.isEmpty)
        counts.write.mode("overwrite")
          .parquet(s"${countsDir(cfg.storeDir)}/batch=$batchId")
    } finally counts.unpersist(false)
  }

  /** Fold committed `batch <= upToBatch` partitions (plus the previous
    * generation) into a new per-word-summed generation via the
    * reader-safe [[GenerationStore.compact]] swap. Safe concurrent with
    * readers; an in-stream caller passes `batchId − 1`. */
  def compact(spark: SparkSession, storeDir: String,
              upToBatch: Long = Long.MaxValue): Unit =
    GenerationStore.compact(spark, storeDir, frames(storeDir), upToBatch)
}

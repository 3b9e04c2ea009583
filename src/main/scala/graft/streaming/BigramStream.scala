package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Config for the streaming bigram-statistics store. `textCol` must
  * stay constant for the life of a store directory. */
final case class BigramStreamConfig(
    inputDir: String, storeDir: String, checkpointDir: String,
    schema: StructType, textCol: String = "text",
    maxFilesPerTrigger: Int = 100)

/** Streaming bigram-statistics store: exact adjacent-bigram counts
  * maintained incrementally as corpus shards arrive — the sufficient
  * statistic of every bigram language model, so LM-based curation
  * (perplexity filtering, Kneser-Ney scoring) re-derives its CURRENT
  * model as the corpus grows without rescanning history. The bigram
  * sibling of [[VocabStream]], and the deeper point of q202: the
  * ENTIRE interpolated-KN model — raw counts, history totals, both
  * continuation-count tables, the count-of-counts discount — is a
  * pure function of the bigram-count multiset ([[graft.ext.NgramLM
  * .knLogLikFromCounts]] is the shared derivation seam), and that
  * multiset is ADDITIVE, so the maintained model equals the one-shot
  * model bit-for-bit. Continuation counts themselves (distinct-left /
  * distinct-right tallies) are NOT additive — maintaining them
  * directly would double-count re-observed pairs — which is exactly
  * why the store keeps the count frame and derives the distincts at
  * read time, where they are bigram-vocabulary-sized.
  *
  * Fold/replay/compaction discipline: [[VocabStream]]'s verbatim —
  * addition is associative and commutative, replay is the `batch=<id>`
  * idempotent overwrite plus the [[GenerationStore]] watermark guard,
  * readers sum partials, compaction pre-sums per (w1, w2) through the
  * reader-safe generational swap.
  *
  * Scale shape: a trigger writes O(distinct bigrams in batch) partial
  * rows and reads NOTHING; the read-side sum shuffles on the bigram
  * vocabulary; model derivation stays bigram-vocabulary-sized. */
object BigramStream {

  private val TableName = "_bigram_counts"

  def countsDir(storeDir: String): String = s"$storeDir/$TableName"

  private val CountsSchema = StructType(Seq(
    StructField("w1", StringType), StructField("w2", StringType),
    StructField("n", LongType)))

  private def frames(storeDir: String): Seq[GenFrame] = Seq(
    GenFrame(countsDir(storeDir), Seq("w1", "w2", "n"),
      _.groupBy("w1", "w2").agg(sum("n").as("n"))))

  /** Exact bigram counts over everything ever ingested: partials
    * summed under ONE watermark snapshot and materialized inside it.
    * An empty store reads as an empty frame. */
  def bigramCounts(spark: SparkSession, storeDir: String): DataFrame =
    GenerationStore.withSnapshot(spark, storeDir) { wm =>
      GenerationStore.frameAtOrEmpty(spark, frames(storeDir).head, wm,
          CountsSchema)
        .groupBy("w1", "w2").agg(sum("n").as("n"))
        .localCheckpoint(eager = true)
    }

  /** Kneser-Ney document scores against the MAINTAINED model —
    * bit-identical to [[graft.ext.NgramLM.knLogLik]] trained one-shot
    * on the ingested corpus (identical counts ⇒ identical model ⇒
    * identical scores; q202 gates it against q201's oracle verbatim). */
  def knLogLik(spark: SparkSession, storeDir: String, docs: DataFrame,
               idCol: String = "doc_id", textCol: String = "text",
               scale: Int = 4): DataFrame =
    graft.ext.NgramLM.knLogLikFromCounts(docs,
      bigramCounts(spark, storeDir), idCol, textCol, scale)

  /** ENTROPY-PRUNED Kneser-Ney scores against the maintained model —
    * the deployment model derived from the store: the pruned model
    * (loss table, kept set, renormalized γ) is a pure function of the
    * additive count multiset exactly like the full model, so the
    * maintained pruned scores answer the one-shot pruned oracle
    * verbatim (q206 gates it against q205's). */
  def knPrunedLogLik(spark: SparkSession, storeDir: String, docs: DataFrame,
                     eps: Double, idCol: String = "doc_id",
                     textCol: String = "text", scale: Int = 4): DataFrame =
    graft.ext.NgramLM.knPrunedLogLikFromCounts(docs,
      bigramCounts(spark, storeDir), eps, idCol, textCol, scale)

  def start(spark: SparkSession, cfg: BigramStreamConfig): StreamingQuery =
    spark.readStream
      .schema(cfg.schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.inputDir)
      .writeStream
      .queryName(s"graft-bigram-${CdcStream.streamId()}")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) => processBatch(batch, id, cfg))
      .start()

  /** One micro-batch of corpus documents. Public so tests, batch
    * backfills, and the declared-query gate can drive exact batch
    * boundaries. The partial is [[graft.ext.NgramLM.corpusBigrams]] —
    * counts only, no per-document grouping — so the store ingests a
    * corpus regardless of how (or whether) its documents are keyed,
    * and the batch costs ONE shuffle instead of two (ADVICE r13). */
  def processBatch(batch: DataFrame, batchId: Long,
                   cfg: BigramStreamConfig): Unit = {
    val spark = batch.sparkSession
    if (batchId <= GenerationStore.readWatermark(spark, cfg.storeDir)) return
    val counts = graft.ext.NgramLM.corpusBigrams(batch, textCol = cfg.textCol)
      .persist()
    try {
      if (!counts.isEmpty)
        counts.write.mode("overwrite")
          .parquet(s"${countsDir(cfg.storeDir)}/batch=$batchId")
    } finally counts.unpersist(false)
  }

  /** Fold committed partials into a pre-summed generation via the
    * reader-safe [[GenerationStore.compact]] swap. */
  def compact(spark: SparkSession, storeDir: String,
              upToBatch: Long = Long.MaxValue): Unit =
    GenerationStore.compact(spark, storeDir, frames(storeDir), upToBatch)
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Config for the streaming trigram-statistics store. `textCol` must
  * stay constant for the life of a store directory. */
final case class TrigramStreamConfig(
    inputDir: String, storeDir: String, checkpointDir: String,
    schema: StructType, textCol: String = "text",
    maxFilesPerTrigger: Int = 100)

/** Streaming trigram-statistics store — [[BigramStream]]'s discipline
  * one order higher, maintaining the sufficient statistic of the
  * TRIGRAM interpolated-KN model (q203) as corpus shards arrive.
  *
  * The same additivity argument carries verbatim: every frame of the
  * two-level model — the distinct-trigram type table, both history
  * totals, the continuation-bigram table ĉ(w2,w3) = N1+(·,w2,w3), the
  * continuation distribution, both count-of-counts discounts — is a
  * pure function of the trigram-count MULTISET
  * ([[graft.ext.NgramLM.kn3LogLikFromCounts]] is the shared
  * derivation seam), and that multiset is ADDITIVE, so the maintained
  * model equals the one-shot model bit-for-bit (q204 answers q203's
  * oracle verbatim). The type-level quantities themselves (ĉ, every
  * N1+, n1/n2) are NOT additive — a re-observed trigram must not
  * re-count its type — which is exactly why the store keeps the count
  * frame and derives the type table at read time, where it is
  * trigram-vocabulary-sized.
  *
  * Fold/replay/compaction discipline: [[VocabStream]]'s verbatim —
  * addition is associative and commutative, replay is the `batch=<id>`
  * idempotent overwrite plus the [[GenerationStore]] watermark guard,
  * readers sum partials, compaction pre-sums per (w1, w2, w3) through
  * the reader-safe generational swap.
  *
  * Scale shape: a trigger writes O(distinct trigrams in batch) partial
  * rows via ONE shuffle ([[graft.ext.NgramLM.corpusTrigrams]] — no
  * per-document axis, no dependence on any id column) and reads
  * NOTHING; the read-side sum shuffles on the trigram vocabulary;
  * model derivation stays trigram-vocabulary-sized. */
object TrigramStream {

  private val TableName = "_trigram_counts"

  def countsDir(storeDir: String): String = s"$storeDir/$TableName"

  private val CountsSchema = StructType(Seq(
    StructField("w1", StringType), StructField("w2", StringType),
    StructField("w3", StringType), StructField("n", LongType)))

  private def frames(storeDir: String): Seq[GenFrame] = Seq(
    GenFrame(countsDir(storeDir), Seq("w1", "w2", "w3", "n"),
      _.groupBy("w1", "w2", "w3").agg(sum("n").as("n"))))

  /** Exact trigram counts over everything ever ingested: partials
    * summed under ONE watermark snapshot and materialized inside it.
    * An empty store reads as an empty frame. */
  def trigramCounts(spark: SparkSession, storeDir: String): DataFrame =
    GenerationStore.withSnapshot(spark, storeDir) { wm =>
      GenerationStore.frameAtOrEmpty(spark, frames(storeDir).head, wm,
          CountsSchema)
        .groupBy("w1", "w2", "w3").agg(sum("n").as("n"))
        .localCheckpoint(eager = true)
    }

  /** Trigram Kneser-Ney document scores against the MAINTAINED model —
    * bit-identical to [[graft.ext.NgramLM.kn3LogLik]] trained one-shot
    * on the ingested corpus (identical counts ⇒ identical model ⇒
    * identical scores; q204 gates it against q203's oracle verbatim). */
  def kn3LogLik(spark: SparkSession, storeDir: String, docs: DataFrame,
                idCol: String = "doc_id", textCol: String = "text",
                scale: Int = 4): DataFrame =
    graft.ext.NgramLM.kn3LogLikFromCounts(docs,
      trigramCounts(spark, storeDir), idCol, textCol, scale)

  /** Entropy-pruned trigram-KN scores against the maintained model —
    * [[BigramStream.knPrunedLogLik]]'s argument one order up (q208
    * gates it against q207's one-shot oracle verbatim). */
  def kn3PrunedLogLik(spark: SparkSession, storeDir: String, docs: DataFrame,
                      eps: Double, idCol: String = "doc_id",
                      textCol: String = "text", scale: Int = 4): DataFrame =
    graft.ext.NgramLM.kn3PrunedLogLikFromCounts(docs,
      trigramCounts(spark, storeDir), eps, idCol, textCol, scale)

  def start(spark: SparkSession, cfg: TrigramStreamConfig): StreamingQuery =
    spark.readStream
      .schema(cfg.schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.inputDir)
      .writeStream
      .queryName(s"graft-trigram-${CdcStream.streamId()}")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) => processBatch(batch, id, cfg))
      .start()

  /** One micro-batch of corpus documents. Public so tests, batch
    * backfills, and the declared-query gate can drive exact batch
    * boundaries. */
  def processBatch(batch: DataFrame, batchId: Long,
                   cfg: TrigramStreamConfig): Unit = {
    val spark = batch.sparkSession
    if (batchId <= GenerationStore.readWatermark(spark, cfg.storeDir)) return
    val counts = graft.ext.NgramLM.corpusTrigrams(batch, textCol = cfg.textCol)
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

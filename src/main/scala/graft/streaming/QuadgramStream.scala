package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Config for the streaming 4-gram-statistics store. `textCol` must
  * stay constant for the life of a store directory. */
final case class QuadgramStreamConfig(
    inputDir: String, storeDir: String, checkpointDir: String,
    schema: StructType, textCol: String = "text",
    maxFilesPerTrigger: Int = 100)

/** Streaming 4-gram-statistics store — [[TrigramStream]]'s discipline
  * one order higher, maintaining the sufficient statistic of the
  * 4-gram interpolated-KN model (q211) as corpus shards arrive.
  *
  * The additivity argument carries verbatim once more: every frame of
  * the THREE-level model — the distinct-4-gram type table, the ĉ3
  * continuation table (= COUNT(*) per (w2,w3,w4) over the type table),
  * the ĉ2 continuation-of-continuations table (= COUNT(*) per (w3,w4)
  * over ĉ3), both intermediate history totals, the continuation
  * distribution, and all three count-of-counts discounts — is a pure
  * function of the 4-gram-count MULTISET
  * ([[graft.ext.NgramLM.kn4LogLikFromCounts]] is the shared derivation
  * seam), and that multiset is ADDITIVE, so the maintained model
  * equals the one-shot model bit-for-bit (q215 answers q211's oracle
  * verbatim). No type-level quantity is additive — which is exactly
  * why the store keeps the count frame and derives the type tables at
  * read time, where they are 4-gram-vocabulary-sized.
  *
  * Fold/replay/compaction discipline: [[VocabStream]]'s verbatim —
  * addition is associative and commutative, replay is the `batch=<id>`
  * idempotent overwrite plus the [[GenerationStore]] watermark guard,
  * readers sum partials, compaction pre-sums per (w1..w4) through the
  * reader-safe generational swap.
  *
  * Scale shape: a trigger writes O(distinct 4-grams in batch) partial
  * rows via ONE shuffle ([[graft.ext.NgramLM.corpusQuadgrams]] — no
  * per-document axis, no dependence on any id column) and reads
  * NOTHING; the read-side sum shuffles on the 4-gram vocabulary;
  * model derivation stays 4-gram-vocabulary-sized. */
object QuadgramStream {

  private val TableName = "_quadgram_counts"

  def countsDir(storeDir: String): String = s"$storeDir/$TableName"

  private val CountsSchema = StructType(Seq(
    StructField("w1", StringType), StructField("w2", StringType),
    StructField("w3", StringType), StructField("w4", StringType),
    StructField("n", LongType)))

  private def frames(storeDir: String): Seq[GenFrame] = Seq(
    GenFrame(countsDir(storeDir), Seq("w1", "w2", "w3", "w4", "n"),
      _.groupBy("w1", "w2", "w3", "w4").agg(sum("n").as("n"))))

  /** Exact 4-gram counts over everything ever ingested: partials
    * summed under ONE watermark snapshot and materialized inside it.
    * An empty store reads as an empty frame. */
  def quadgramCounts(spark: SparkSession, storeDir: String): DataFrame =
    GenerationStore.withSnapshot(spark, storeDir) { wm =>
      GenerationStore.frameAtOrEmpty(spark, frames(storeDir).head, wm,
          CountsSchema)
        .groupBy("w1", "w2", "w3", "w4").agg(sum("n").as("n"))
        .localCheckpoint(eager = true)
    }

  /** 4-gram Kneser-Ney document scores against the MAINTAINED model —
    * bit-identical to [[graft.ext.NgramLM.kn4LogLik]] trained one-shot
    * on the ingested corpus (identical counts ⇒ identical model ⇒
    * identical scores; q215 gates it against q211's oracle verbatim). */
  def kn4LogLik(spark: SparkSession, storeDir: String, docs: DataFrame,
                idCol: String = "doc_id", textCol: String = "text",
                scale: Int = 4): DataFrame =
    graft.ext.NgramLM.kn4LogLikFromCounts(docs,
      quadgramCounts(spark, storeDir), idCol, textCol, scale)

  /** Entropy-pruned 4-gram-KN scores against the maintained model —
    * [[TrigramStream.kn3PrunedLogLik]]'s argument one order up (q217
    * gates it against q216's one-shot oracle verbatim). */
  def kn4PrunedLogLik(spark: SparkSession, storeDir: String, docs: DataFrame,
                      eps: Double, idCol: String = "doc_id",
                      textCol: String = "text", scale: Int = 4): DataFrame =
    graft.ext.NgramLM.kn4PrunedLogLikFromCounts(docs,
      quadgramCounts(spark, storeDir), eps, idCol, textCol, scale)

  def start(spark: SparkSession, cfg: QuadgramStreamConfig): StreamingQuery =
    spark.readStream
      .schema(cfg.schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.inputDir)
      .writeStream
      .queryName(s"graft-quadgram-${CdcStream.streamId()}")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) => processBatch(batch, id, cfg))
      .start()

  /** One micro-batch of corpus documents. Public so tests, batch
    * backfills, and the declared-query gate can drive exact batch
    * boundaries. */
  def processBatch(batch: DataFrame, batchId: Long,
                   cfg: QuadgramStreamConfig): Unit = {
    val spark = batch.sparkSession
    if (batchId <= GenerationStore.readWatermark(spark, cfg.storeDir)) return
    val counts = graft.ext.NgramLM.corpusQuadgrams(batch, textCol = cfg.textCol)
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

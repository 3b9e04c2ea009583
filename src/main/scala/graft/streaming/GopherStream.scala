package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Config for the streaming per-source quality-rule-card store.
  * `textCol`/`sourceCol` must stay constant for the life of a store
  * directory (the counts are rule facts of those columns). */
final case class GopherStreamConfig(
    inputDir: String, storeDir: String, checkpointDir: String,
    schema: StructType, idCol: String = "doc_id", textCol: String = "text",
    sourceCol: String = "source", maxFilesPerTrigger: Int = 100)

/** Streaming PER-SOURCE Gopher rule-card store: for every (source,
  * rule) the exact document and failure counts, maintained
  * incrementally as corpus shards arrive. The complement to
  * [[DriftStream]]'s PSI monitor, which is GLOBAL and SCALAR (one
  * quality-score histogram over the whole stream): when a single
  * crawler regresses on a single rule — one source's alpha-ratio
  * failures spike while every other signal holds — the PSI needle
  * barely moves, but this card names the source AND the rule. The two
  * monitors share nothing and answer different pages: "did the corpus
  * drift?" (PSI) vs "which feed broke which rule?" (this).
  *
  * Why this folds exactly: the state is per-(source, rule) COUNTS and
  * addition is associative and commutative — the [[VocabStream]]
  * discipline verbatim. Replay safety is the `batch=<id>` idempotent
  * overwrite plus the [[GenerationStore]] watermark guard; readers sum
  * partials, so partial granularity is read-invisible and
  * [[compact]]'s per-(source, rule) pre-sum is read-equivalent.
  *
  * Scale shape: a trigger writes O(sources × rules) partial rows (the
  * rule card is a map-only projection of the batch — [[graft.ext
  * .TextAnalysis.gopherRules]] — followed by one map-side-combinable
  * aggregation) and reads NOTHING; the read-side sum shuffles on a key
  * space of sources × 7 rules. The per-batch partials double as the
  * drift TIME SERIES: `batchLog` reads them with the batch id as a
  * partition column, so "which batch did source X start failing rule
  * Y" is one filtered scan. */
object GopherStream {

  private val TableName = "_rule_counts"

  def countsDir(storeDir: String): String = s"$storeDir/$TableName"

  /** stack() order below; also the rule vocabulary readers can rely on. */
  val Rules: Seq[String] = Seq("keep", "r_alpha_ratio", "r_dominance",
    "r_mean_word_len", "r_repetition", "r_stopwords", "r_word_count")

  private val CountsSchema = StructType(Seq(
    StructField("source", StringType), StructField("rule", StringType),
    StructField("n", LongType), StructField("n_fail", LongType)))

  private def frames(storeDir: String): Seq[GenFrame] = Seq(
    GenFrame(countsDir(storeDir), Seq("source", "rule", "n", "n_fail"),
      _.groupBy("source", "rule")
        .agg(sum("n").as("n"), sum("n_fail").as("n_fail"))))

  /** The maintained rule card: per (source, rule) the exact document
    * and failure counts over everything ever ingested — partials summed
    * under ONE watermark snapshot and materialized inside it. An empty
    * store reads as an empty frame. */
  def ruleCard(spark: SparkSession, storeDir: String): DataFrame =
    GenerationStore.withSnapshot(spark, storeDir) { wm =>
      GenerationStore.frameAtOrEmpty(spark, frames(storeDir).head, wm,
          CountsSchema)
        .groupBy("source", "rule")
        .agg(sum("n").as("n"), sum("n_fail").as("n_fail"))
        .localCheckpoint(eager = true)
    }

  /** The drift time series: every NOT-YET-COMPACTED batch's partial
    * card with its batch id — (batch, source, rule, n, n_fail). The
    * glob pins the read to `batch=*` partitions: after a [[compact]]
    * the store dir also holds a `compacted=N` generation (a different
    * partition column — an unfiltered read would fail discovery), and
    * folded batches are by definition no longer part of the per-batch
    * series. An empty selection reads as an empty frame. */
  def batchLog(spark: SparkSession, storeDir: String): DataFrame = {
    val base = countsDir(storeDir)
    val fs = new Path(base).getFileSystem(
      spark.sessionState.newHadoopConf())
    val dirs = if (!fs.exists(new Path(base))) Array.empty[String]
      else fs.listStatus(new Path(base))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
        .map(_.getPath.toString)
    if (dirs.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(StructField("batch", LongType) +: CountsSchema.fields.toSeq))
    else spark.read.option("basePath", base).parquet(dirs.toIndexedSeq: _*)
      .select(col("batch").cast("long").as("batch"),
        col("source"), col("rule"), col("n"), col("n_fail"))
  }

  def start(spark: SparkSession, cfg: GopherStreamConfig): StreamingQuery =
    spark.readStream
      .schema(cfg.schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.inputDir)
      .writeStream
      .queryName(s"graft-gopher-${CdcStream.streamId()}")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) => processBatch(batch, id, cfg))
      .start()

  /** One micro-batch of corpus documents: rule card → per-(source,
    * rule) counts → idempotent `batch=<id>` partial. Public so tests,
    * batch backfills, and the declared-query gate can drive exact batch
    * boundaries. */
  def processBatch(batch: DataFrame, batchId: Long,
                   cfg: GopherStreamConfig): Unit = {
    val spark = batch.sparkSession
    if (batchId <= GenerationStore.readWatermark(spark, cfg.storeDir)) return
    val card = graft.ext.TextAnalysis.gopherRules(batch, cfg.idCol,
      cfg.textCol, carryCols = Seq(cfg.sourceCol))
    val counts = card
      .select(col(cfg.sourceCol).cast("string").as("source"),
        expr("""stack(7, 'keep', keep,
                'r_alpha_ratio', r_alpha_ratio, 'r_dominance', r_dominance,
                'r_mean_word_len', r_mean_word_len,
                'r_repetition', r_repetition, 'r_stopwords', r_stopwords,
                'r_word_count', r_word_count) AS (rule, pass)"""))
      .groupBy("source", "rule")
      .agg(count(lit(1)).as("n"),
        sum(when(!col("pass"), 1L).otherwise(0L)).as("n_fail"))
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

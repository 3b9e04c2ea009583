package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Config for the streaming positional index. `idCol`/`textCol` must
  * stay constant for the life of a store directory. */
final case class PosIndexStreamConfig(
    inputDir: String, storeDir: String, checkpointDir: String,
    schema: StructType, idCol: String = "doc_id", textCol: String = "text",
    maxFilesPerTrigger: Int = 100)

/** Streaming POSITIONAL index: the (doc, position, term) posting frame
  * maintained as document files arrive — the exact-ordered-retrieval
  * sibling of [[IndexStream]]'s BM25 store. BM25 answers "which docs
  * share these terms"; this answers "which docs contain this exact
  * phrase, where" over everything ever ingested — the store behind
  * quote attribution, exact-span provenance, and contamination
  * forensics at corpus scale.
  *
  * Why this folds exactly: a document's positional postings are
  * PER-DOCUMENT facts that never update — the maintained frame is the
  * UNION of every batch's postings, and [[graft.ext.Retrieval
  * .phraseSearch]]'s anchor algebra (term equi-join + per-anchor count)
  * is grouping-only over that union, so the maintained search is
  * BIT-IDENTICAL to the one-shot pass over the concatenated corpus
  * (PosIndexStreamSpec pins it; q186 gates it against q174's full
  * DuckDB recompute).
  *
  * Scale shape — the [[IndexStream]] discipline: a trigger APPENDS
  * O(batch tokens) under `batch=<id>` and reads NOTHING; replay = the
  * Ingest overwrite discipline plus the [[GenerationStore]] watermark
  * guard (a re-delivered micro-batch rewrites its own partition; one at
  * or below the compaction watermark is skipped — already folded, and
  * re-appending would double-count every occurrence). [[compact]]
  * merges committed partitions into a new generation through the
  * reader-safe generational swap (watermark snapshot + one-cycle-
  * delayed GC + action-time retry), so reader listings stay bounded and
  * compaction can run concurrently with searches. Phrase search reads
  * only the probed terms' posting rows through the term equi-join —
  * never a per-doc scan per phrase. */
object PosIndexStream {

  private val TableName = "_pos_postings"

  def postingsDir(storeDir: String): String = s"$storeDir/$TableName"

  private def frames(storeDir: String): Seq[GenFrame] = Seq(
    GenFrame(postingsDir(storeDir), Seq("doc_id", "tpos", "term")))

  /** The maintained positional posting frame: (doc_id, tpos, term).
    * LAZY — valid for ONE compaction cycle (the [[GenerationStore]]
    * delayed-GC window); a longer-lived reader re-calls this per
    * action, or uses [[phraseSearch]], which materializes under the
    * snapshot and retries. */
  def readPostings(spark: SparkSession, storeDir: String): DataFrame =
    GenerationStore.withSnapshot(spark, storeDir)(wm =>
      GenerationStore.frameAt(spark, frames(storeDir).head, wm))

  def start(spark: SparkSession, cfg: PosIndexStreamConfig): StreamingQuery =
    spark.readStream
      .schema(cfg.schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.inputDir)
      .writeStream
      .queryName(s"graft-posindex-${CdcStream.streamId()}")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) => processBatch(batch, id, cfg))
      .start()

  /** One micro-batch of documents. Public so tests, batch backfills,
    * and the declared-query gate can drive exact batch boundaries. */
  def processBatch(batch: DataFrame, batchId: Long,
                   cfg: PosIndexStreamConfig): Unit = {
    val spark = batch.sparkSession
    // a batch at or below the compaction watermark is ALREADY folded —
    // re-writing its (swept) partition would double-count its postings
    if (batchId <= GenerationStore.readWatermark(spark, cfg.storeDir)) return
    val postings = batch.filter(col(cfg.textCol).isNotNull)
      .select(col(cfg.idCol).as("doc_id"),
        posexplode(split(col(cfg.textCol), " ")).as(Seq("tpos", "term")))
      .persist()
    try {
      // an all-null batch posts nothing: skip the write — an all-empty
      // store would otherwise break schema inference on the first read
      if (!postings.isEmpty)
        postings.write.mode("overwrite")
          .parquet(s"${postingsDir(cfg.storeDir)}/batch=$batchId")
    } finally postings.unpersist(false)
  }

  /** Merge every committed `batch <= upToBatch` partition (plus the
    * previous generation) into a new generation — the small-file bound
    * for a long-running index, via the reader-safe
    * [[GenerationStore.compact]] discipline: generation write beside
    * live data, watermark commit, one-cycle-delayed GC, action-time
    * reader retry. Safe to run while searches are active; an in-stream
    * caller passes `batchId − 1` so the in-flight batch is never
    * folded. */
  def compact(spark: SparkSession, storeDir: String,
              upToBatch: Long = Long.MaxValue): Unit =
    GenerationStore.compact(spark, storeDir, frames(storeDir), upToBatch)

  /** Exact ordered-phrase search over everything ever indexed —
    * identical algebra to [[graft.ext.Retrieval.phraseSearch]] over the
    * concatenation of every batch: (phrase_id, doc_id, n_matches,
    * first_pos). The phrases view carries (phrase_id, phrase). The
    * result is MATERIALIZED under one watermark snapshot (bounded:
    * matching docs per phrase), so it has no validity window and a
    * compaction racing the scan retries inside this call. */
  def phraseSearch(spark: SparkSession, storeDir: String,
                   phrases: DataFrame,
                   phraseIdCol: String = "phrase_id",
                   phraseCol: String = "phrase"): DataFrame =
    GenerationStore.withSnapshot(spark, storeDir) { wm =>
      graft.ext.Retrieval.phraseSearchFromPostings(
        GenerationStore.frameAt(spark, frames(storeDir).head, wm),
        phrases, phraseIdCol, phraseCol).localCheckpoint(true)
    }
}

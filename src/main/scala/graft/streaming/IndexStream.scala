package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.ext.Retrieval

/** Config for the streaming BM25 index. Column names must stay constant
  * for the life of a store directory. */
final case class IndexStreamConfig(
    inputDir: String, storeDir: String, checkpointDir: String,
    schema: StructType, idCol: String = "doc_id", textCol: String = "text",
    maxFilesPerTrigger: Int = 100,
    /** > 0: every N micro-batches, fold the accumulated batch
      * partitions inside the trigger (foreachBatch serializes, so no
      * reader/writer race) — bounds file listings for long streams. */
    compactEveryNBatches: Int = 0)

/** Streaming BM25 index maintenance: the (postings, doc-length) pair
  * [[Retrieval.buildIndex]] defines, maintained incrementally as
  * document files arrive — the "retrieve over everything we have ever
  * ingested, right now" store of a RAG / decontamination stack, kept
  * current without ever rescanning or re-tokenizing history.
  *
  * Why this folds exactly: both index frames are PER-DOCUMENT facts —
  * (doc_id, term, tf) and (doc_id, dl) are functions of one document's
  * text alone — so ingesting a batch appends its documents' rows and
  * touches nothing else; df, N, and avgdl are derived at query time
  * from the stored frames ([[Retrieval.bm25TopKFromIndex]]), so the
  * maintained index answers queries BIT-IDENTICALLY to the batch
  * operator over everything seen (IndexStreamSpec pins streamed ≡
  * one-shot).
  *
  * Replay discipline — the [[graft.cdc.Ingest]] `batch=<id>` pattern:
  * each trigger overwrites its OWN `batch=<id>` partition of both
  * frames, so a replayed micro-batch rewrites identical files instead
  * of duplicating rows. Compaction preserves that invariant with the
  * [[GenerationStore]] WATERMARK: the fold records the highest batch id
  * it absorbed, and a replayed batch at or below the watermark is
  * SKIPPED (its rows are already inside the folded partition —
  * re-writing them would duplicate). Documents are assumed unique
  * across batches (the file source delivers each file once; an
  * at-least-once upstream runs [[DedupStream]] first — the standard
  * layering).
  *
  * Scale shape: per-trigger cost is O(|batch| tokens) — one tokenize,
  * one map-side-combinable tf count, two partition-dir writes; nothing
  * reads existing state. Readers see one directory listing per frame;
  * long-running stores bound file counts with [[compact]] (the
  * reader-safe generational discipline, shared with [[DecontamStream]]
  * and [[PosIndexStream]] via [[GenerationStore]]). */
object IndexStream {

  def postingsDir(storeDir: String): String = s"$storeDir/_postings"
  def doclenDir(storeDir: String): String = s"$storeDir/_doclen"

  private def frames(storeDir: String): Seq[GenFrame] = Seq(
    GenFrame(postingsDir(storeDir), Seq("doc_id", "term", "tf")),
    GenFrame(doclenDir(storeDir), Seq("doc_id", "dl")))

  /** LAZY postings frame — valid for ONE compaction cycle. The returned
    * DataFrame pins directory paths, not data: the delayed GC keeps the
    * superseded generation on disk for one further [[compact]], so an
    * action on this frame is safe until the SECOND compaction after it
    * was built. A longer-lived reader must re-call this per action (or
    * use [[topK]], which materializes under the snapshot and retries). */
  def readPostings(spark: SparkSession, storeDir: String): DataFrame =
    GenerationStore.withSnapshot(spark, storeDir)(wm =>
      GenerationStore.frameAt(spark, frames(storeDir).head, wm))

  /** LAZY doc-length frame — same one-compaction-cycle validity window
    * as [[readPostings]]. */
  def readDocLens(spark: SparkSession, storeDir: String): DataFrame =
    GenerationStore.withSnapshot(spark, storeDir)(wm =>
      GenerationStore.frameAt(spark, frames(storeDir)(1), wm))

  /** BM25 top-k over the maintained index — identical scoring to
    * [[Retrieval.bm25TopK]] over the concatenation of every batch.
    * Both frames are resolved under a SINGLE watermark snapshot, and the
    * result is MATERIALIZED inside that snapshot (k rows per query —
    * bounded by construction), so the returned frame is independent of
    * the store's files: unlike the lazy readers, it has no validity
    * window, and the race-retry genuinely covers the whole read — a
    * compaction committing mid-scan surfaces here, not at some later
    * caller action the retry can't see. */
  def topK(spark: SparkSession, storeDir: String, queries: DataFrame,
           k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    GenerationStore.withSnapshot(spark, storeDir) { wm =>
      val Seq(tf, dl) = frames(storeDir)
      Retrieval.bm25TopKFromIndex(
        GenerationStore.frameAt(spark, tf, wm),
        GenerationStore.frameAt(spark, dl, wm),
        queries, k, k1, b).localCheckpoint(true)
    }

  def start(spark: SparkSession, cfg: IndexStreamConfig): StreamingQuery =
    spark.readStream
      .schema(cfg.schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.inputDir)
      .writeStream
      .queryName(s"graft-index-${CdcStream.streamId()}")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) => processBatch(batch, id, cfg))
      .start()

  /** Fold one document batch into the store — the foreachBatch body,
    * public so batch-mode callers (and the driver-gate query q168) can
    * drive the same fold path without a streaming query. */
  def processBatch(batch: DataFrame, batchId: Long,
                   cfg: IndexStreamConfig): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // a batch at or below the compaction watermark is ALREADY folded —
    // re-writing its partition would duplicate its rows
    if (batchId <= GenerationStore.readWatermark(spark, cfg.storeDir)) return
    val (tf, dl) = Retrieval.buildIndex(batch, cfg.idCol, cfg.textCol)
    // overwrite THIS batch's partition only: a replay rewrites its own
    // files; other batches' partitions are never listed or touched
    tf.write.mode("overwrite")
      .parquet(s"${postingsDir(cfg.storeDir)}/batch=$batchId")
    dl.write.mode("overwrite")
      .parquet(s"${doclenDir(cfg.storeDir)}/batch=$batchId")
    // in-stream compaction: foreachBatch serializes triggers, so the
    // fold can never race a concurrent writer; the IN-FLIGHT batch is
    // excluded (upToBatch = batchId − 1) — folding a batch whose
    // checkpoint has not committed would let its replay double-count
    if (cfg.compactEveryNBatches > 0 && batchId > 0 &&
        batchId % cfg.compactEveryNBatches == 0)
      compact(spark, cfg.storeDir, upToBatch = batchId - 1)
  }

  /** Fold committed `batch=<id>` partitions (ids ≤ `upToBatch`) plus
    * the previous generation into a new `compacted=<upTo>` generation —
    * the reader-safe [[GenerationStore.compact]] discipline (generation
    * write beside live data, watermark commit, one-cycle-delayed GC). */
  def compact(spark: SparkSession, storeDir: String,
              upToBatch: Long = Long.MaxValue): Unit =
    GenerationStore.compact(spark, storeDir, frames(storeDir), upToBatch)
}

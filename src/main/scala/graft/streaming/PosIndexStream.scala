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
  * Ingest overwrite discipline (a re-delivered micro-batch rewrites its
  * own partition); [[compact]] merges committed partitions into
  * `batch=-1` through the crash-safe manifest swap so reader listings
  * stay bounded. Phrase search reads only the probed terms' posting
  * rows through the term equi-join — never a per-doc scan per phrase. */
object PosIndexStream {

  private val TableName = "_pos_postings"

  def postingsDir(storeDir: String): String = s"$storeDir/$TableName"

  /** The maintained positional posting frame: (doc_id, tpos, term). */
  def readPostings(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(postingsDir(storeDir))
      .select("doc_id", "tpos", "term")

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
    require(batchId != graft.cdc.Ingest.CompactedBatchId,
      s"batch id $batchId is reserved for compacted history")
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

  /** Merge every committed `batch <= upToBatch` partition into
    * `batch=-1` — the small-file bound for a long-running index. Rides
    * [[graft.cdc.Ingest.compactBatches]]'s crash-safe manifest swap —
    * crash-safe for WRITERS; a reader scanning the store mid-swap can
    * hit vanished files, so schedule compaction between reads (the
    * stream's own foreachBatch is the natural slot), like any storage
    * maintenance job. */
  def compact(spark: SparkSession, storeDir: String, upToBatch: Long): Unit =
    graft.cdc.Ingest.compactBatches(spark, storeDir, TableName, upToBatch)

  /** Exact ordered-phrase search over everything ever indexed —
    * identical algebra to [[graft.ext.Retrieval.phraseSearch]] over the
    * concatenation of every batch: (phrase_id, doc_id, n_matches,
    * first_pos). The phrases view carries (phrase_id, phrase). */
  def phraseSearch(spark: SparkSession, storeDir: String,
                   phrases: DataFrame,
                   phraseIdCol: String = "phrase_id",
                   phraseCol: String = "phrase"): DataFrame =
    graft.ext.Retrieval.phraseSearchFromPostings(
      readPostings(spark, storeDir), phrases, phraseIdCol, phraseCol)
}

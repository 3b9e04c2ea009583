package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
  * of duplicating rows. Compaction preserves that invariant with a
  * WATERMARK: the fold records the highest batch id it absorbed, and a
  * replayed batch at or below the watermark is SKIPPED (its rows are
  * already inside the folded partition — re-writing them would
  * duplicate). Documents are assumed unique across batches (the file
  * source delivers each file once; an at-least-once upstream runs
  * [[DedupStream]] first — the standard layering).
  *
  * Scale shape: per-trigger cost is O(|batch| tokens) — one tokenize,
  * one map-side-combinable tf count, two partition-dir writes; nothing
  * reads existing state. Readers see one directory listing per frame;
  * long-running stores bound file counts with [[compact]] (the
  * Ingest-compaction discipline applied to index partitions). */
object IndexStream {

  def postingsDir(storeDir: String): String = s"$storeDir/_postings"
  def doclenDir(storeDir: String): String = s"$storeDir/_doclen"

  def readPostings(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(postingsDir(storeDir))
      .select("doc_id", "term", "tf")

  def readDocLens(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(doclenDir(storeDir)).select("doc_id", "dl")

  /** BM25 top-k over the maintained index — identical scoring to
    * [[Retrieval.bm25TopK]] over the concatenation of every batch. */
  def topK(spark: SparkSession, storeDir: String, queries: DataFrame,
           k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    Retrieval.bm25TopKFromIndex(readPostings(spark, storeDir),
      readDocLens(spark, storeDir), queries, k, k1, b)

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

  private def watermarkPath(storeDir: String) =
    new Path(s"$storeDir/_compacted_watermark")

  private def readWatermark(spark: SparkSession, storeDir: String): Long = {
    val p = watermarkPath(storeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
                                      cfg: IndexStreamConfig): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // a batch at or below the compaction watermark is ALREADY folded —
    // re-writing its partition would duplicate its rows
    if (batchId <= readWatermark(spark, cfg.storeDir)) return
    val (tf, dl) = Retrieval.buildIndex(batch, cfg.idCol, cfg.textCol)
    // overwrite THIS batch's partition only: a replay rewrites its own
    // files; other batches' partitions are never listed or touched
    tf.write.mode("overwrite")
      .parquet(s"${postingsDir(cfg.storeDir)}/batch=$batchId")
    dl.write.mode("overwrite")
      .parquet(s"${doclenDir(cfg.storeDir)}/batch=$batchId")
    // in-stream compaction: foreachBatch serializes triggers, so the
    // fold can never race a concurrent writer here
    if (cfg.compactEveryNBatches > 0 && batchId > 0 &&
        batchId % cfg.compactEveryNBatches == 0)
      compact(spark, cfg.storeDir)
  }

  /** Fold all accumulated `batch=<id>` partitions of both frames into
    * one, preserving contents exactly — run periodically so reader-side
    * file listings stay bounded regardless of trigger count. Records
    * the highest absorbed batch id as the replay watermark (see the
    * class doc). Run it from INSIDE the stream (`compactEveryNBatches`)
    * or with the stream quiesced — an external call racing a live
    * trigger could interleave with that trigger's partition write. */
  def compact(spark: SparkSession, storeDir: String): Unit = {
    val pRoot = new Path(postingsDir(storeDir))
    val pFs = pRoot.getFileSystem(spark.sessionState.newHadoopConf())
    val maxBatch =
      if (!pFs.exists(pRoot)) -1L
      else pFs.listStatus(pRoot).filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith("batch="))
        .map(_.stripPrefix("batch=").toLong).foldLeft(-1L)(math.max)
    if (maxBatch < 0) return
    Seq(postingsDir(storeDir) -> Seq("doc_id", "term", "tf"),
        doclenDir(storeDir) -> Seq("doc_id", "dl")).foreach {
      case (dir, cols) =>
        val root = new Path(dir)
        val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(root)) {
          val folded = spark.read.parquet(dir)
            .select(cols.map(col): _*)
            .localCheckpoint(true) // materialize BEFORE the dir is replaced
          val tmp = new Path(s"$dir.__compact_tmp")
          if (fs.exists(tmp)) fs.delete(tmp, true)
          folded.write.parquet(s"${tmp.toString}/batch=0")
          fs.delete(root, true)
          require(fs.rename(tmp, root), s"index compaction swap failed: $dir")
        }
    }
    // watermark LAST: if the fold crashes mid-way, replays still target
    // their own (surviving or rewritten) partitions — never duplicated
    val wm = watermarkPath(storeDir)
    val fs = wm.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(wm, true)
    try out.write(maxBatch.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}

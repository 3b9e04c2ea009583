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

  /** The dirs a reader trusts: the CURRENT compacted generation (named
    * by the watermark it absorbed) plus every batch partition ABOVE the
    * watermark. Partitions at or below it are pre-GC stragglers from a
    * crashed compaction — their rows already live in the generation
    * dir, so reading them would double-count. */
  private def liveDirs(spark: SparkSession, dir: String, wm: Long): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Seq.empty
    else {
      val names = fs.listStatus(root).filter(_.isDirectory)
        .map(_.getPath.getName).toSeq
      val gen = names.filter(_ == s"compacted=$wm")
      val batches = names.filter(_.startsWith("batch="))
        .filter(n => scala.util.Try(n.stripPrefix("batch=").toLong)
          .toOption.exists(_ > wm))
      (gen ++ batches).map(n => s"$dir/$n")
    }
  }

  private def frameAt(spark: SparkSession, dir: String,
                      cols: Seq[String], wm: Long): DataFrame = {
    val dirs = liveDirs(spark, dir, wm)
    require(dirs.nonEmpty, s"empty index store: $dir")
    spark.read.parquet(dirs: _*).selectExpr(cols: _*)
  }

  /** Run `f` against ONE watermark snapshot shared by every frame the
    * query reads — so a topK can never mix generations — and retry when
    * a concurrent [[compact]] committed between the snapshot and the
    * path resolution (detected: the selected dirs are gone AND the
    * watermark moved). GC keeps each superseded generation alive for
    * one extra compaction cycle, so a reader that resolved its paths
    * before the commit still finds its files during the action. */
  /** A vanished-file failure, at any wrapping depth: path resolution
    * throws FileNotFound/AnalysisException directly, but a file swept
    * MID-SCAN surfaces as a SparkException whose cause chain carries
    * the FNF — both mean the same race and both must retry. */
  @scala.annotation.tailrec
  private def isFileGone(e: Throwable): Boolean = e match {
    case null => false
    case _: java.io.FileNotFoundException => true
    case _: org.apache.spark.sql.AnalysisException => true
    case other => isFileGone(other.getCause)
  }

  private def withSnapshot[T](spark: SparkSession, storeDir: String)
                             (f: Long => T): T = {
    var attempts = 0
    while (true) {
      val wm = readWatermark(spark, storeDir)
      try return f(wm)
      catch {
        case e: Throwable if isFileGone(e) && attempts < 3 &&
            readWatermark(spark, storeDir) != wm =>
          attempts += 1 // compaction raced us — re-snapshot and retry
      }
    }
    sys.error("unreachable")
  }

  /** LAZY postings frame — valid for ONE compaction cycle. The returned
    * DataFrame pins directory paths, not data: the delayed GC keeps the
    * superseded generation on disk for one further [[compact]], so an
    * action on this frame is safe until the SECOND compaction after it
    * was built. A longer-lived reader must re-call this per action (or
    * use [[topK]], which materializes under the snapshot and retries). */
  def readPostings(spark: SparkSession, storeDir: String): DataFrame =
    withSnapshot(spark, storeDir)(wm =>
      frameAt(spark, postingsDir(storeDir), Seq("doc_id", "term", "tf"), wm))

  /** LAZY doc-length frame — same one-compaction-cycle validity window
    * as [[readPostings]]. */
  def readDocLens(spark: SparkSession, storeDir: String): DataFrame =
    withSnapshot(spark, storeDir)(wm =>
      frameAt(spark, doclenDir(storeDir), Seq("doc_id", "dl"), wm))

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
    withSnapshot(spark, storeDir) { wm =>
      Retrieval.bm25TopKFromIndex(
        frameAt(spark, postingsDir(storeDir), Seq("doc_id", "term", "tf"), wm),
        frameAt(spark, doclenDir(storeDir), Seq("doc_id", "dl"), wm),
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

  private def watermarkPath(storeDir: String) =
    new Path(s"$storeDir/_compacted_watermark")

  /** Watermark file: line 1 = current generation, line 2 = the previous
    * one (-1 if none). The previous generation's dirs are still on disk
    * — GC is delayed one compaction cycle so in-flight readers that
    * resolved paths under the old watermark finish their action. */
  private def readWatermarks(spark: SparkSession, storeDir: String): (Long, Long) = {
    val p = watermarkPath(storeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) (-1L, -1L)
    else {
      val in = fs.open(p)
      val lines = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.split("\n")
      finally in.close()
      (lines(0).trim.toLong,
        if (lines.length > 1) lines(1).trim.toLong else -1L)
    }
  }

  private def readWatermark(spark: SparkSession, storeDir: String): Long =
    readWatermarks(spark, storeDir)._1

  /** Fold one document batch into the store — the foreachBatch body,
    * public so batch-mode callers (and the driver-gate query q168) can
    * drive the same fold path without a streaming query. */
  def processBatch(batch: DataFrame, batchId: Long,
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
    // fold can never race a concurrent writer; the IN-FLIGHT batch is
    // excluded (upToBatch = batchId − 1) — folding a batch whose
    // checkpoint has not committed would let its replay double-count
    if (cfg.compactEveryNBatches > 0 && batchId > 0 &&
        batchId % cfg.compactEveryNBatches == 0)
      compact(spark, cfg.storeDir, upToBatch = batchId - 1)
  }

  /** Fold every committed `batch=<id>` partition with id ≤ `upToBatch`
    * (plus the previous generation) into a NEW `compacted=<upToBatch>`
    * generation dir per frame — run periodically so reader-side file
    * listings stay bounded regardless of trigger count.
    *
    * Crash-safe by GENERATIONS, not in-place swaps: nothing live is
    * deleted before the commit point. The new generation is written
    * beside the live data; the COMMIT is the watermark write (readers
    * and the replay guard consult it); absorbed batch dirs and the old
    * generation are garbage-collected AFTER the commit, and a crash
    * anywhere leaves either the old state fully live (pre-commit) or
    * the new one with harmless stragglers the next GC sweep removes
    * (readers select by watermark, so stragglers are never read).
    *
    * `upToBatch = Long.MaxValue` (the external-call default) folds
    * everything on disk — only valid with the stream quiesced; the
    * in-stream path passes `batchId − 1` so the in-flight batch (whose
    * checkpoint has not committed) can never be folded and then
    * replay-duplicated. */
  def compact(spark: SparkSession, storeDir: String,
              upToBatch: Long = Long.MaxValue): Unit = {
    val frames = Seq(postingsDir(storeDir) -> Seq("doc_id", "term", "tf"),
      doclenDir(storeDir) -> Seq("doc_id", "dl"))
    val (wm0, prev0) = readWatermarks(spark, storeDir)
    val pRoot = new Path(postingsDir(storeDir))
    val fs = pRoot.getFileSystem(spark.sessionState.newHadoopConf())
    // sweep only what the PREVIOUS generation superseded (one-cycle GC
    // delay): dirs the current generation superseded may still be held
    // by an in-flight reader that snapshotted before the last commit
    gc(spark, storeDir, prev0)
    if (!fs.exists(pRoot)) return
    val absorbable = fs.listStatus(pRoot).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .flatMap(n => scala.util.Try(n.stripPrefix("batch=").toLong).toOption)
      .filter(b => b > wm0 && b <= upToBatch)
    if (absorbable.isEmpty) return
    val newWm = absorbable.max
    frames.foreach { case (dir, cols) =>
      // previous generation + the committed batches being absorbed;
      // batches ABOVE upToBatch (e.g. the in-flight one) stay live
      val selected = liveDirs(spark, dir, wm0).filter { p =>
        val n = p.substring(p.lastIndexOf('/') + 1)
        !n.startsWith("batch=") ||
          n.stripPrefix("batch=").toLong <= upToBatch
      }
      val folded = spark.read.parquet(selected: _*).selectExpr(cols: _*)
      // written BESIDE the live data — nothing is deleted pre-commit;
      // a crashed partial generation is invisible (watermark still old)
      // and overwritten by the next attempt
      folded.write.mode("overwrite").parquet(s"$dir/compacted=$newWm")
    }
    // COMMIT: the watermark flips readers and the replay guard to the
    // new generation; created via create+rename so a torn write can
    // never look committed
    val wm = watermarkPath(storeDir)
    val tmp = new Path(wm.getParent, wm.getName + ".inprogress")
    val out = fs.create(tmp, true)
    try out.write(s"$newWm\n$wm0".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(wm, false)
    require(fs.rename(tmp, wm), s"watermark commit failed: $wm")
    // delayed GC: sweep what the OLD watermark superseded; dirs this
    // commit superseded (gen wm0 + batches ≤ newWm) survive until the
    // next compaction so concurrent readers' resolved paths stay valid
    gc(spark, storeDir, wm0)
  }

  /** Delete partitions the watermark has superseded: batch dirs ≤ wm
    * and compacted generations < wm. Pure garbage collection — readers
    * never select these — so a crash mid-sweep is harmless. */
  private def gc(spark: SparkSession, storeDir: String, wm: Long): Unit = {
    if (wm < 0) return
    Seq(postingsDir(storeDir), doclenDir(storeDir)).foreach { dir =>
      val root = new Path(dir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(root)) {
        fs.listStatus(root).filter(_.isDirectory).foreach { st =>
          val n = st.getPath.getName
          val stale =
            (n.startsWith("batch=") && scala.util.Try(
              n.stripPrefix("batch=").toLong).toOption.exists(_ <= wm)) ||
            (n.startsWith("compacted=") && scala.util.Try(
              n.stripPrefix("compacted=").toLong).toOption.exists(_ < wm))
          if (stale) fs.delete(st.getPath, true)
        }
      }
    }
  }
}

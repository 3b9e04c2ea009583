package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.cdc.Ingest
import graft.ext.Dedup

/** Config for the streaming deduplicating corpus builder.
  *
  * `bands` × `rowsPerBand` fixes the MinHash signature length; the
  * values must stay constant for the life of a corpus directory (the
  * stored signature table is built with them). `batch` is a reserved
  * partition-column name in `corpusDir`. */
final case class DocStreamConfig(
    inputDir: String, corpusDir: String, checkpointDir: String,
    schema: StructType, idCol: String = "doc_id", textCol: String = "text",
    shingleSize: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
    threshold: Double = 0.7, seed: Long = 42L, maxBucketSize: Int = 10000,
    maxFilesPerTrigger: Int = 100)

/** Streaming incremental corpus dedup: new-document files land in
  * `inputDir`; every micro-batch is deduplicated against BOTH itself and
  * the standing corpus, and only the survivors append. The continuous
  * version of the nightly [[Dedup.dedupIncrement]] workflow.
  *
  * Scale shape per trigger (corpus size N, batch size b ≪ N):
  *  - the corpus contributes its stored SIGNATURE table (id, text-hash,
  *    minhash sig ≈ 0.5 KB/doc — three orders of magnitude smaller than
  *    the text): the exact pre-pass is an anti join on the 8-byte hash,
  *    the LSH cross pass band-explodes signatures only, and corpus text
  *    is read back just for the docs that became candidates
  *    ([[Dedup.crossNearDupPairsPresigged]]) — no corpus-side kernel
  *    recompute, ever;
  *  - survivors and THEIR signatures append under `batch=<id>` with
  *    idempotent per-batch overwrite — the same restart discipline as
  *    the CDC ingest sink ([[graft.cdc.Ingest.appendBatch]]): a replayed
  *    micro-batch rewrites its own directory and nothing else. The
  *    in-flight batch's own partition is excluded from the corpus read,
  *    so a retry after a partial write cannot see the batch as a
  *    duplicate of itself.
  */
object DocStream {

  def sigDir(corpusDir: String): String = s"$corpusDir/_sigs"

  /** The standing corpus (documents + their `batch` provenance).
    * `_sigs` is underscore-hidden from parquet discovery. */
  def readCorpus(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.option("basePath", corpusDir).parquet(corpusDir)

  def readSigs(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.option("basePath", sigDir(corpusDir)).parquet(sigDir(corpusDir))

  def start(spark: SparkSession, cfg: DocStreamConfig): StreamingQuery =
    spark.readStream
      .schema(cfg.schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.inputDir)
      .writeStream
      .queryName(s"graft-doc-dedup-${graft.streaming.CdcStream.streamId()}")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) => processBatch(batch, id, cfg))
      .start()

  /** Reserved partition id the compactor merges history into. Negative,
    * so it can never collide with a streaming batch id: a REPLAYED batch
    * overwrites its own `batch=<id>` dir, and merging history into a
    * replayable id would let that overwrite destroy other batches'
    * rows. */
  val CompactedBatch: Long = -1L

  /** Merge every `batch <= upToBatch` partition (and the compacted
    * partition itself) into `batch=-1`, in BOTH the corpus and the
    * signature store, then delete the merged dirs. A long-running stream
    * otherwise accretes one directory per trigger and file listing —
    * not data — becomes the per-trigger cost.
    *
    * Replay safety after compaction: a re-delivered old batch excludes
    * only its own (now absent) partition, sees its documents already in
    * `batch=-1`, drops everything as duplicates, and writes an empty
    * dir — a no-op, exactly like a replay before compaction. */
  def compact(spark: SparkSession, corpusDir: String, upToBatch: Long): Unit = {
    require(upToBatch >= 0)
    // delegate to Ingest's MANIFEST-protocol compactor (same batch=<id>
    // layout): the hand-rolled version here deleted sources AFTER the
    // rename with no recovery — a crash in the window either duplicated
    // every absorbed document (sources + batch=-1 both live) or lost
    // batch=-1 outright when the next run swept the tmp dir. The
    // manifest makes every crash point re-runnable. `upToBatch` must
    // stay at or below the stream's committed frontier (the in-stream
    // caller passes batchId − 1), so a replay can never target an
    // absorbed partition.
    val root = new Path(corpusDir)
    Ingest.compactBatches(spark, root.getParent.toString, root.getName, upToBatch)
    Ingest.compactBatches(spark, corpusDir, "_sigs", upToBatch)
  }

  /** One micro-batch: dedup within the batch, then against the corpus,
    * then append survivors + their signatures. Public so tests (and
    * batch backfills) can drive exact batch boundaries. */
  def processBatch(batch: DataFrame, batchId: Long, cfg: DocStreamConfig): Unit = {
    val spark = batch.sparkSession
    val numHashes = cfg.bands * cfg.rowsPerBand
    val fs = new Path(cfg.corpusDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val haveCorpus = fs.exists(new Path(sigDir(cfg.corpusDir)))

    val survivors =
      if (!haveCorpus)
        Dedup.dedupCorpus(batch, cfg.idCol, cfg.textCol, cfg.shingleSize,
          cfg.bands, cfg.rowsPerBand, cfg.threshold, cfg.seed, cfg.maxBucketSize)
      else {
        // a replayed batch must not dedup against its own partial write
        val sigs = readSigs(spark, cfg.corpusDir)
          .filter(col("batch") =!= batchId).drop("batch")
          .localCheckpoint(true) // feeds hash anti join AND the band join
        val fresh = batch
          .withColumn("__th", xxhash64(col(cfg.textCol)))
          .join(sigs.select(col("th").as("__th")).distinct(), Seq("__th"), "left_anti")
          .drop("__th")
        val within = Dedup.dedupCorpus(fresh, cfg.idCol, cfg.textCol,
            cfg.shingleSize, cfg.bands, cfg.rowsPerBand, cfg.threshold,
            cfg.seed, cfg.maxBucketSize)
          .localCheckpoint(true) // cross pass + final anti join consume it
        val corpusDocs = readCorpus(spark, cfg.corpusDir)
          .filter(col("batch") =!= batchId)
        val crossDups = Dedup.crossNearDupPairsPresigged(sigs, corpusDocs,
            within, cfg.idCol, cfg.textCol, cfg.shingleSize, cfg.bands,
            cfg.rowsPerBand, cfg.threshold, cfg.seed, cfg.maxBucketSize)
          .select(col("incoming_id").as(cfg.idCol)).distinct()
        within.join(crossDups, Seq(cfg.idCol), "left_anti")
      }

    // materialize once; both writes read it
    val out = survivors.localCheckpoint(true)
    out.write.mode("overwrite")
      .parquet(s"${cfg.corpusDir}/batch=$batchId")
    Dedup.signatures(out, cfg.idCol, cfg.textCol, cfg.shingleSize,
        numHashes, cfg.seed)
      .write.mode("overwrite")
      .parquet(s"${sigDir(cfg.corpusDir)}/batch=$batchId")
  }
}

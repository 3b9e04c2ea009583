package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Config for the streaming decontamination registry. `minLen` and
  * `textCol` must stay constant for the life of a store directory (the
  * stored digests are keyed by them — mixing window widths in one store
  * would cut against a set no single benchmark suite defines). */
final case class DecontamStreamConfig(
    inputDir: String, storeDir: String, checkpointDir: String,
    schema: StructType, textCol: String = "text", minLen: Int = 8,
    maxFilesPerTrigger: Int = 100)

/** Streaming decontamination registry: the forbidden-window digest set
  * maintained incrementally as BENCHMARK suites arrive — the "is this
  * span quoted anywhere in anything we evaluate on, as of now" store a
  * training-data pipeline consults before every release cut. Benchmarks
  * accrete (a new eval suite lands, an existing one adds items); the
  * registry turns q172's batch pass into `decontaminate(corpus)` against
  * everything ever registered, without re-sharding the historical
  * suites.
  *
  * Why this folds exactly: the state is the SET of distinct
  * minLen-token window digests ([[graft.ext.Dedup.benchGramDigests]]),
  * and set union is ASSOCIATIVE and IDEMPOTENT — fold order, batch
  * boundaries, and re-delivery cannot change the set, so the maintained
  * registry cuts BIT-IDENTICALLY to the one-shot
  * [[graft.ext.Dedup.exactSubstrDecontaminate]] over the union of every
  * suite seen (DecontamStreamSpec pins it; q185 gates it against q172's
  * full DuckDB recompute).
  *
  * Scale shape — the [[IndexStream]] discipline, not the bucket-fold
  * one: a digest is a PER-WINDOW fact that never updates, so a trigger
  * APPENDS O(batch windows) under `batch=<id>` and reads NOTHING; the
  * mark join downstream is a semi-join, so cross-batch duplicate
  * digests are semantically harmless and need no fold. Replay = the
  * Ingest `batch=<id>` overwrite discipline (a re-delivered micro-batch
  * rewrites its own partition, never doubling the store); [[compact]]
  * folds committed partitions into `batch=-1` WITH a global distinct,
  * so reader listings stay bounded and the store size converges to the
  * true set size even under heavy cross-suite overlap. Store rows are
  * 16-byte truncated sha2-256 digests ([[graft.ext.Dedup]]'s gramKeys)
  * — the registry for a million-item benchmark battery is a few
  * hundred MB, broadcast-joinable at read time. */
object DecontamStream {

  private val TableName = "_bench_digests"

  def digestsDir(storeDir: String): String = s"$storeDir/$TableName"

  /** Every registered forbidden-window digest (`__k` binary; duplicates
    * across batch partitions possible until [[compact]] — harmless to
    * every consumer by the semi-join contract). An empty registry (no
    * batch has ever written digests — reachable when every batch was
    * all-short/null) reads as an empty frame, so the cut is a no-op
    * instead of a path-not-found failure. */
  def readDigests(spark: SparkSession, storeDir: String): DataFrame = {
    val dir = digestsDir(storeDir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__k",
            org.apache.spark.sql.types.BinaryType))))
    else spark.read.parquet(dir).select("__k")
  }

  def start(spark: SparkSession, cfg: DecontamStreamConfig): StreamingQuery =
    spark.readStream
      .schema(cfg.schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.inputDir)
      .writeStream
      .queryName(s"graft-decontam-${CdcStream.streamId()}")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) => processBatch(batch, id, cfg))
      .start()

  /** One micro-batch of benchmark documents. Public so tests, batch
    * backfills, and the declared-query gate can drive exact batch
    * boundaries. */
  def processBatch(batch: DataFrame, batchId: Long,
                   cfg: DecontamStreamConfig): Unit = {
    require(batchId != graft.cdc.Ingest.CompactedBatchId,
      s"batch id $batchId is reserved for compacted history")
    val digests = graft.ext.Dedup
      .benchGramDigests(batch, cfg.textCol, cfg.minLen).persist()
    try {
      // a batch of only sub-minLen/null docs registers nothing: skip the
      // write — an all-empty store would otherwise break schema
      // inference on the first read (and replay of an empty batch is a
      // no-op either way)
      if (!digests.isEmpty)
        digests.write.mode("overwrite")
          .parquet(s"${digestsDir(cfg.storeDir)}/batch=$batchId")
    } finally digests.unpersist(false)
  }

  /** Merge every committed `batch <= upToBatch` partition into
    * `batch=-1` and globally distinct the digests — the small-file AND
    * store-size bound for a long-running registry. Rides
    * [[graft.cdc.Ingest.compactBatches]]'s crash-safe manifest swap —
    * crash-safe for WRITERS; a reader scanning the store mid-swap can
    * hit vanished files, so schedule compaction between reads (the
    * stream's own foreachBatch is the natural slot), like any storage
    * maintenance job. */
  def compact(spark: SparkSession, storeDir: String, upToBatch: Long): Unit =
    graft.cdc.Ingest.compactBatches(spark, storeDir, TableName, upToBatch,
      transform = Some(_.distinct()))

  /** q172's surgery against everything ever registered: every corpus
    * token covered by a registered minLen-window is cut (all
    * occurrences, any alignment) — (doc_id, n_tokens, n_kept,
    * text_clean). `minLen` must equal the store's config (the digests
    * are keyed by it). */
  def decontaminate(spark: SparkSession, storeDir: String, corpus: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    minLen: Int = 8): DataFrame =
    graft.ext.Dedup.exactSubstrDecontaminateAgainst(corpus,
      readDigests(spark, storeDir), idCol, textCol, minLen)
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

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
  * Ingest `batch=<id>` overwrite discipline plus the [[GenerationStore]]
  * watermark guard (a re-delivered micro-batch rewrites its own
  * partition; one at or below the compaction watermark is skipped —
  * already folded). [[compact]] folds committed partitions into a new
  * generation WITH a global distinct, so reader listings stay bounded
  * and the store size converges to the true set size even under heavy
  * cross-suite overlap — through the reader-safe generational swap
  * (watermark snapshot + one-cycle-delayed GC + action-time retry), so
  * compaction can run concurrently with readers. Store rows are 16-byte
  * truncated sha2-256 digests ([[graft.ext.Dedup]]'s gramKeys) — the
  * registry for a million-item benchmark battery is a few hundred MB,
  * broadcast-joinable at read time. */
object DecontamStream {

  private val TableName = "_bench_digests"

  def digestsDir(storeDir: String): String = s"$storeDir/$TableName"

  private val DigestSchema = StructType(Seq(StructField("__k", BinaryType)))

  private def frames(storeDir: String): Seq[GenFrame] = Seq(
    // global distinct at fold time: duplicates across batch partitions
    // are read-harmless (semi-join) but pure store bloat — compaction
    // is where the store converges to the true set size
    GenFrame(digestsDir(storeDir), Seq("__k"), _.distinct()))

  /** Every registered forbidden-window digest (`__k` binary; duplicates
    * across batch partitions possible until [[compact]] — harmless to
    * every consumer by the semi-join contract). An empty registry (no
    * batch has ever written digests — reachable when every batch was
    * all-short/null) reads as an empty frame, so the cut is a no-op
    * instead of a path-not-found failure. LAZY — valid for ONE
    * compaction cycle (the [[GenerationStore]] delayed-GC window); a
    * longer-lived reader re-calls this per action, or uses
    * [[decontaminate]], which pins the registry under the snapshot. */
  def readDigests(spark: SparkSession, storeDir: String): DataFrame =
    GenerationStore.withSnapshot(spark, storeDir)(wm =>
      GenerationStore.frameAtOrEmpty(spark, frames(storeDir).head, wm,
        DigestSchema))

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
    val spark = batch.sparkSession
    // a batch at or below the compaction watermark is ALREADY folded —
    // re-appending it would only re-bloat what compaction deduped
    if (batchId <= GenerationStore.readWatermark(spark, cfg.storeDir)) return
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

  /** Fold every committed `batch <= upToBatch` partition (plus the
    * previous generation) into a new globally-distinct generation — the
    * small-file AND store-size bound for a long-running registry, via
    * the reader-safe [[GenerationStore.compact]] discipline: the new
    * generation lands beside live data, the watermark write is the
    * commit, superseded dirs are GC'd one cycle later, and concurrent
    * readers re-snapshot on a lost race. Safe to run while readers are
    * active; an in-stream caller passes `batchId − 1` so the in-flight
    * batch is never folded. */
  def compact(spark: SparkSession, storeDir: String,
              upToBatch: Long = Long.MaxValue): Unit =
    GenerationStore.compact(spark, storeDir, frames(storeDir), upToBatch)

  /** q172's surgery against everything ever registered: every corpus
    * token covered by a registered minLen-window is cut (all
    * occurrences, any alignment) — (doc_id, n_tokens, n_kept,
    * text_clean). `minLen` must equal the store's config (the digests
    * are keyed by it). The registry side is MATERIALIZED under one
    * watermark snapshot (bounded: the digest set is benchmark-sized,
    * broadcast-joinable by design), so the returned corpus frame is
    * independent of the store's files — no validity window, and a
    * compaction racing the registry read retries inside this call. */
  def decontaminate(spark: SparkSession, storeDir: String, corpus: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    minLen: Int = 8): DataFrame = {
    val digests = GenerationStore.withSnapshot(spark, storeDir)(wm =>
      GenerationStore.frameAtOrEmpty(spark, frames(storeDir).head, wm,
        DigestSchema).localCheckpoint(true))
    graft.ext.Dedup.exactSubstrDecontaminateAgainst(corpus,
      digests, idCol, textCol, minLen)
  }
}

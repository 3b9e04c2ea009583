package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.ext.{PQ, Similarity}

/** Config for the streaming ANN index maintainer. The codebook is
  * frozen at [[AnnStream.initialize]] time — PQ codes are only
  * comparable under ONE codebook, so the stream never refits; refitting
  * is an offline rebuild (fit → re-encode → swap directories), the
  * standard IVF/PQ operational pattern. */
final case class AnnStreamConfig(
    inputDir: String,
    indexDir: String,
    checkpointDir: String,
    dim: Int = 64,
    idCol: String = "vec_id",
    vecCol: String = "embedding",
    maxFilesPerTrigger: Int = 10,
    /** In-stream codes-dir compaction period (micro-batches); 0 = off. */
    compactEveryNBatches: Int = 0) {
  def schema: StructType = StructType(Seq(
    StructField(idCol, LongType), StructField(vecCol, ArrayType(FloatType))))
}

/** Streaming maintenance of a product-quantization ANN index — the
  * embedding-side sibling of [[DocStream]]'s signature store: new
  * vectors land in `inputDir`, each micro-batch encodes them against
  * the FROZEN codebook and appends only their 8-byte-per-vector codes.
  *
  * Scale shape per trigger (index size N, batch b ≪ N):
  *  - the standing index is never read, never re-encoded — the trigger
  *    cost is O(b): encode is one map-side pass of codegen'd
  *    nearest-centroid kernels, and the append touches one `batch=<id>`
  *    directory (idempotent overwrite, the same restart discipline as
  *    [[graft.cdc.Ingest.appendBatch]]);
  *  - queries scan the CODES store (≈32× smaller than raw vectors —
  *    [[PQ]]'s memory contract) via [[PQ.pqCandidatesFromCodes]]; the
  *    raw corpus is joined back only to exact-re-rank final candidates;
  *  - the codebook loads ONCE at stream start and is closed over by the
  *    trigger lambda — no per-trigger store reads (the round-4 ingest
  *    bench showed per-trigger re-reads dominating small batches).
  */
object AnnStream {

  def codesDir(indexDir: String): String = s"$indexDir/codes"
  /** Underscore-hidden from parquet partition discovery. */
  def codebookDir(indexDir: String): String = s"$indexDir/_codebook"

  /** Persist the frozen codebook as a one-row parquet (engine-native —
    * no ad-hoc serialization format): (m, subDim, k, flat) where
    * flat(s·k + j) = centroid j of subspace s. */
  def saveCodebooks(spark: SparkSession, cb: PQ.Codebooks, indexDir: String): Unit = {
    import spark.implicits._
    Seq((cb.m, cb.subDim, cb.k, cb.books.flatten.map(_.toArray).toArray))
      .toDF("m", "subDim", "k", "flat")
      .coalesce(1).write.mode("overwrite").parquet(codebookDir(indexDir))
  }

  def loadCodebooks(spark: SparkSession, indexDir: String): PQ.Codebooks = {
    val r = spark.read.parquet(codebookDir(indexDir)).head()
    val m = r.getAs[Int]("m"); val subDim = r.getAs[Int]("subDim")
    val k = r.getAs[Int]("k")
    // parquet hands back mutable.ArraySeq elements — deep-convert so the
    // Codebooks invariant (immutable Seq) holds for every consumer
    val flat = r.getSeq[scala.collection.Seq[Float]](r.fieldIndex("flat"))
      .map(_.toIndexedSeq)
    PQ.Codebooks(m, subDim, k, flat.grouped(k).map(_.toIndexedSeq).toIndexedSeq)
  }

  /** Fit the codebook on the base corpus, persist it, and encode the
    * base into the index's COMPACTED partition (`batch=-1` — a
    * non-replayable id, so no streaming batch overwrite can destroy the
    * base codes). Call once before [[start]]. */
  def initialize(spark: SparkSession, base: DataFrame, cfg: AnnStreamConfig,
                 m: Int = 8, k: Int = 16, iterations: Int = 3,
                 seed: Long = 42L): PQ.Codebooks = {
    val cb = PQ.fit(base, cfg.idCol, cfg.vecCol, cfg.dim, m, k, iterations, seed)
    saveCodebooks(spark, cb, cfg.indexDir)
    PQ.encode(base, cb, cfg.idCol, cfg.vecCol)
      .write.mode("overwrite")
      .parquet(s"${codesDir(cfg.indexDir)}/batch=${graft.cdc.Ingest.CompactedBatchId}")
    cb
  }

  def start(spark: SparkSession, cfg: AnnStreamConfig): StreamingQuery = {
    // frozen codebook: load once, close over it — not per trigger
    val cb = loadCodebooks(spark, cfg.indexDir)
    spark.readStream
      .schema(cfg.schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.inputDir)
      .writeStream
      .queryName(s"graft-ann-index-${graft.streaming.CdcStream.streamId()}")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) => processBatch(batch, id, cb, cfg))
      .start()
  }

  /** One micro-batch: encode against the frozen codebook, append codes
    * under `batch=<id>` (idempotent overwrite), periodically fold old
    * batch dirs into the compacted partition. Public so tests and batch
    * backfills can drive exact batch boundaries. */
  def processBatch(batch: DataFrame, batchId: Long, cb: PQ.Codebooks,
                   cfg: AnnStreamConfig): Unit = {
    PQ.encode(batch, cb, cfg.idCol, cfg.vecCol)
      .write.mode("overwrite")
      .parquet(s"${codesDir(cfg.indexDir)}/batch=$batchId")
    if (cfg.compactEveryNBatches > 0 && batchId > 0 &&
        batchId % cfg.compactEveryNBatches == 0) {
      // ids strictly below the in-flight one can never race a replay
      // overwrite (same argument as Ingest.compactBatches' contract)
      graft.cdc.Ingest.compactBatches(batch.sparkSession, cfg.indexDir,
        "codes", batchId - 1)
    }
  }

  /** The standing codes table (base + every streamed batch). */
  def readCodes(spark: SparkSession, indexDir: String): DataFrame = {
    val dir = codesDir(indexDir)
    spark.read.option("basePath", dir).parquet(dir).drop("batch")
  }

  /** ADC candidates over the materialized index. */
  def candidates(spark: SparkSession, indexDir: String, queries: DataFrame,
                 nCandidates: Int, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame =
    PQ.pqCandidatesFromCodes(readCodes(spark, indexDir), queries,
      loadCodebooks(spark, indexDir), nCandidates, idCol, vecCol)

  /** Approximate top-k over the materialized index: ADC candidates from
    * the codes store, exact cosine re-rank against `corpus` (the raw
    * vectors — touched only for the k·refine survivors). */
  def topK(spark: SparkSession, indexDir: String, corpus: DataFrame,
           queries: DataFrame, k: Int, refine: Int = 4,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Similarity.rankCandidates(
      candidates(spark, indexDir, queries, k * refine, idCol, vecCol),
      corpus, queries, k, idCol, vecCol)

  /** True while the index directory has been initialized. */
  def exists(spark: SparkSession, indexDir: String): Boolean = {
    val p = new Path(codebookDir(indexDir))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}

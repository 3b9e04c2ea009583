package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.ext.Dedup

/** Config for the streaming span-dedup corpus builder. `width` must
  * stay constant for the life of an output directory (the tile registry
  * is keyed by `width`-token tile digests). */
final case class SpanStreamConfig(
    inputDir: String, outDir: String, checkpointDir: String,
    schema: StructType, idCol: String = "doc_id", textCol: String = "text",
    width: Int = 8, maxFilesPerTrigger: Int = 100)

/** Streaming C4-style span dedup ([[Dedup.dedupTiles]] as ingest):
  * new-document files land in `inputDir`; every micro-batch removes
  * tiles already claimed — by an earlier batch OR by an earlier
  * occurrence within the same batch — and appends the cleaned documents.
  * First-arrival-wins replaces batch mode's global min-(doc, idx) rule:
  * the stream cannot know about documents that have not arrived, which
  * is exactly C4's semantics applied in arrival order (feed batches in
  * id order and the two modes agree — pinned by SpanStreamSpec).
  *
  * Scale shape per trigger (corpus tiles N, batch tiles b ≪ N):
  *  - state is the TILE REGISTRY: one 256-bit digest per claimed tile —
  *    no tile text, no document bodies; the cross check is a digest
  *    anti-join (b vs N keys), never a text comparison;
  *  - within-batch winners are the same map-side min-struct aggregation
  *    as batch mode;
  *  - cleaned docs + newly-claimed digests append under `batch=<id>`
  *    with idempotent per-batch overwrite — the CDC sink's restart
  *    discipline: a replayed batch excludes its OWN registry partition,
  *    recomputes against everyone else's claims, and overwrites only
  *    its own directories. */
object SpanStream {

  def registryDir(outDir: String): String = s"$outDir/_tiles"

  /** The cleaned corpus (doc_id, n_tiles, n_kept, text_clean + batch). */
  def readClean(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("basePath", outDir).parquet(outDir)

  def readRegistry(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("basePath", registryDir(outDir))
      .parquet(registryDir(outDir))

  def start(spark: SparkSession, cfg: SpanStreamConfig): StreamingQuery =
    spark.readStream
      .schema(cfg.schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.inputDir)
      .writeStream
      .queryName(s"graft-span-dedup-${CdcStream.streamId()}")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) => processBatch(batch, id, cfg))
      .start()

  /** One micro-batch. Public so tests and batch backfills can drive
    * exact batch boundaries. */
  def processBatch(batch: DataFrame, batchId: Long, cfg: SpanStreamConfig): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(cfg.outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val haveRegistry = fs.exists(new Path(registryDir(cfg.outDir)))

    // tiles feed the winner agg AND the keep-flag join — one compute
    val tiles = Dedup.tileFrame(batch, cfg.idCol, cfg.textCol, cfg.width)
      .localCheckpoint(true)
    val firstInBatch = tiles.groupBy("__k")
      .agg(min(struct(col("doc_id"), col("idx"))).as("__first"))
    // digests claimed by OTHER batches (a replayed batch must not see
    // its own partial write)
    val claimable =
      if (!haveRegistry) firstInBatch
      else firstInBatch.join(
        readRegistry(spark, cfg.outDir)
          .filter(col("batch") =!= batchId).select("__k").distinct(),
        Seq("__k"), "left_anti")
    val out = tiles
      .join(claimable, Seq("__k"), "left")
      .withColumn("__keep", col("__first").isNotNull &&
        col("doc_id") === col("__first.doc_id") &&
        col("idx") === col("__first.idx"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tiles"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("idx"), col("tile"))))),
          s => s.getField("tile")), " ").as("text_clean"))
      .localCheckpoint(true)

    out.write.mode("overwrite")
      .parquet(s"${cfg.outDir}/batch=$batchId")
    claimable.select("__k").write.mode("overwrite")
      .parquet(s"${registryDir(cfg.outDir)}/batch=$batchId")
  }
}

package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch CDC ingest: parse a directory of (gzipped) JSONL envelope logs,
  * route every record to its registry table, append.
  *
  * This is the Spark restatement of the reference's whole main path
  * (S1–S11, SURVEY.md §2.1) minus its de-optimizations: the registry is a
  * closure constant instead of a per-record fetch, and the write is one
  * columnar append per table per (micro-)batch instead of a fresh pipeline
  * per record (`dataflow-cdc-stream.py:82-94`).
  *
  * Idempotence: each batch writes into `<table>/batch=<id>` with overwrite,
  * so a replayed batch (streaming restart, at-least-once file delivery
  * upstream) lands in the same directory and cannot double-append. Readers
  * just scan `<warehouse>/<table>` and see `batch` as a partition column.
  *
  * Scale posture: routing is N registry-filters over one cached parsed
  * frame — each filter prunes on a low-cardinality `object` column; at
  * 1000-executor scale the parsed frame would additionally be
  * `repartition($"object")`-ed only if per-table output files must be
  * consolidated (a shuffle we avoid by default).
  */
object Ingest {

  val UnknownTableDir = "_dead_letter"

  def readLines(spark: SparkSession, inputDir: String): DataFrame =
    spark.read.text(inputDir) // .gz handled transparently by the text source

  def parse(spark: SparkSession, inputDir: String): DataFrame =
    Envelope.parse(readLines(spark, inputDir))

  /** Route one parsed batch: per registry table an append, unknown objects
    * to the dead letter (reference drops-with-a-log at
    * `dataflow-cdc-stream.py:96-97`; we keep the data instead of stdout).
    */
  def appendBatch(parsed: DataFrame, registry: Map[String, TableSpec],
                  warehouseDir: String, batchId: Long): Unit = {
    val cached = parsed.cache()
    try {
      registry.values.foreach { spec =>
        Envelope.project(cached, spec)
          .write.mode("overwrite")
          .parquet(s"$warehouseDir/${spec.logicalName}/batch=$batchId")
      }
      val known = registry.keySet.toSeq
      val dead = cached.filter(col("object").isNull || !col("object").isin(known: _*))
      // dead letter keeps the raw line — fully replayable once the
      // registry learns the table
      dead.select(col("object"), col("_raw"))
        .write.mode("overwrite")
        .parquet(s"$warehouseDir/$UnknownTableDir/batch=$batchId")
    } finally cached.unpersist()
  }

  /** One-shot batch ingest of a directory. */
  def ingestDir(spark: SparkSession, inputDir: String,
                registry: Map[String, TableSpec], warehouseDir: String): Unit =
    appendBatch(parse(spark, inputDir), registry, warehouseDir, batchId = 0L)

  /** Read back a versioned table written by `appendBatch`. */
  def readTable(spark: SparkSession, warehouseDir: String, logicalName: String): DataFrame =
    spark.read.parquet(s"$warehouseDir/$logicalName").drop("batch")
}

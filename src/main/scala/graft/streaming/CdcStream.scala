package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.cdc.{Envelope, Ingest, TableSpec}

/** Structured Streaming CDC pipeline: watch a directory for (gzipped)
  * JSONL Datastream logs, parse, route to per-table append sinks.
  *
  * Reference pipeline stages S1–S11 (SURVEY.md §3.1) collapse to:
  * file source (its own new-file discovery subsumes the reference's
  * Pub/Sub notification hop) → envelope parse → optional
  * dedup-within-watermark → `foreachBatch` router.
  *
  * Delivery semantics: the file source + checkpoint give exactly-once
  * *batch replay*; `Ingest.appendBatch` writes `batch=<id>` dirs with
  * overwrite, so replays are idempotent — strictly stronger than the
  * reference, whose per-record side pipelines double-write on retry
  * (SURVEY.md §2.2 "streaming stateful ops").
  */
final case class CdcStreamConfig(
    inputDir: String,
    warehouseDir: String,
    checkpointDir: String,
    registry: Map[String, TableSpec],
    maxFilesPerTrigger: Int = 1000,
    trigger: Trigger = Trigger.AvailableNow(),
    /** e.g. Some("1 hour"): drop duplicate (object, payload, event-time)
      * records within the watermark — protects against duplicate file
      * delivery from an at-least-once upstream. */
    dedupWithinWatermark: Option[String] = None,
    /** table → primary key columns: tables listed here get an
      * incrementally-maintained current-state snapshot
      * (SnapshotMaintainer) folded per micro-batch. */
    snapshotKeys: Map[String, Seq[String]] = Map.empty,
    /** partition versioned tables by event-time date (`_dt`) so
      * asOf/changesBetween prune directories (Versioned.asOfPruned). */
    partitionByDate: Boolean = false)

object CdcStream {

  def start(spark: SparkSession, cfg: CdcStreamConfig): StreamingQuery = {
    val lines = spark.readStream
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .text(cfg.inputDir)

    val parsed = Envelope.parse(lines)

    val deduped = cfg.dedupWithinWatermark match {
      case Some(delay) =>
        parsed
          .withColumn("_event_ts", col("source_timestamp").cast("timestamp"))
          .withWatermark("_event_ts", delay)
          .dropDuplicatesWithinWatermark("object", "payload", "_event_ts")
          .drop("_event_ts")
      case None => parsed
    }

    val registry = cfg.registry // stable closure constant, serialized once

    deduped.writeStream
      .queryName("graft-cdc-stream")
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(cfg.trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val df = batch.toDF()
        Ingest.appendBatch(df, registry, cfg.warehouseDir, batchId,
          partitionByDate = cfg.partitionByDate)
        cfg.snapshotKeys.foreach { case (table, pk) =>
          registry.get(table).foreach { spec =>
            graft.cdc.SnapshotMaintainer.update(df.sparkSession, cfg.warehouseDir,
              table, graft.cdc.Envelope.project(df, spec), pk)
          }
        }
      }
      .start()
  }

  /** Run to completion over currently-available files (AvailableNow). */
  def runOnce(spark: SparkSession, cfg: CdcStreamConfig): Unit = {
    val q = start(spark, cfg.copy(trigger = Trigger.AvailableNow()))
    q.awaitTermination()
  }
}

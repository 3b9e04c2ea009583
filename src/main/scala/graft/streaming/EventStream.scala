package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time streaming aggregations over the `events` stream shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference contemplated windowing but never implemented it (unused
  * window/trigger imports, `dataflow-cdc-stream.py:2,7` — SURVEY.md §2.1);
  * these are the first-class streaming operators our engine ships instead:
  * watermarked tumbling windows, session windows, and stream dedup. Batch
  * equivalence is pinned by tests (same aggregates computed with the batch
  * `window()` operator must match the streaming run bit-for-bit).
  */
object EventStream {

  /** The events schema with `ts` as raw parquet nanos (LongType) — what a
    * streaming scan of the driver corpus must declare (see Tables.events:
    * Spark's vectorized reader rejects TIMESTAMP(NANOS)). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of an events parquet directory (ns → µs timestamps). */
  def readStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 100): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling event-time window counts/sums per event_type, watermarked.
    * Partial aggregation is map-side (hash agg); state is bounded by the
    * watermark horizon. */
  def tumblingAgg(events: DataFrame, windowLen: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
           sum(col("value").cast(DecimalType(18, 2))).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("cnt"), col("sum_value"))

  /** Session windows per user: events within `gap` of each other merge
    * into one session (native session_window operator — the streaming
    * form of the q16 lag-based batch sessionization). */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n_events"))

  /** Exactly-once-per-event stream: drop duplicate event_ids within the
    * watermark horizon (at-least-once upstream protection). */
  def dedupedStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}

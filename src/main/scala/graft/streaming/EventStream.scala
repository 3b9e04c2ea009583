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

  /** Declared schema when the input directory has no files yet to sniff
    * (start-before-produce): the `events` stream shape with `ts` as
    * TIMESTAMP (µs) — what current driver corpora carry after the
    * normalization below, so late-arriving files of either µs encoding
    * read correctly. */
  val fallbackSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of an events parquet directory, tolerant of every
    * `ts` physical encoding the corpus has shipped with: a streaming
    * source needs a DECLARED schema, so the footer of the existing data
    * is sniffed with a zero-row batch read and the stream declares
    * exactly what is on disk —
    *  - TIMESTAMP(NANOS) (read as LongType under `nanosAsLong`; Spark's
    *    vectorized reader rejects nanos): converted ns → µs timestamps;
    *  - TIMESTAMP / TIMESTAMP_NTZ (µs): passed through unchanged, so
    *    streaming and batch ([[graft.core.Tables.events]]) agree on the
    *    column type and parity joins compare equal.
    *
    * A start-before-produce stream (directory empty or absent, nothing
    * to sniff) falls back to [[fallbackSchema]] rather than throwing;
    * pass `schemaHint` to declare the encoding explicitly instead. */
  def readStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 100,
                 schemaHint: Option[StructType] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val onDisk = schemaHint.getOrElse {
      try spark.read.parquet(dir).schema
      catch { case _: org.apache.spark.sql.AnalysisException => fallbackSchema }
    }
    val raw = spark.readStream
      .schema(onDisk)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
    onDisk("ts").dataType match {
      case LongType =>
        // integer `div`, not `/`: nanos ~1.7e18 exceed double's mantissa
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // watermarks demand TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
        // on NTZ); session tz is pinned UTC, so the cast is value-identical
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
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

  /** Sliding event-time windows (length > slide ⇒ overlapping): each
    * event contributes to length/slide windows. Same operator the batch
    * q53 verifies against DuckDB. */
  def slidingAgg(events: DataFrame, windowLen: String = "1 hour",
                 slide: String = "30 minutes",
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"), col("cnt"))

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
  /** Per-window trending items: the k most frequent event types in each
    * tumbling window — CHAINED streaming aggregations (counts, then the
    * bounded [[graft.functions.TopK]] heap per window), which Spark's
    * multiple-stateful-operator support runs in append mode: each
    * stage's state evicts at the shared watermark, and a window's top-k
    * emits once, when the watermark passes window end.
    *
    * Scale shape: stage 1 shuffles (window, type) partial counts
    * (map-side combined); stage 2 shuffles O(windows × types) count
    * rows into O(windows) bounded heaps — the same O(groups × k)
    * discipline as the batch heavy hitters (q73), never a per-window
    * sort. Works identically on a batch frame (spec pins streaming ≡
    * batch). */
  def windowedTopK(events: DataFrame, k: Int = 3,
                   windowLen: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("window"))
      .agg(graft.functions.TopK.top_k_str(k)(col("event_type"),
        col("cnt").cast("double")).as("top"))
      .select(col("window.start").as("win_start"), explode(col("top")).as("t"))
      .select(col("win_start"), col("t.id").as("event_type"),
        col("t.score").cast("long").as("cnt"))

  def dedupedStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked STREAM-STREAM interval join: purchases matched to the
    * same user's views at most `horizon` before them. Both sides carry
    * watermarks and the join condition bounds purchase time against view
    * time from BOTH directions, so each side's state store evicts rows
    * once the other stream's watermark passes the interval — without the
    * two-sided bound, state grows without limit (Spark would accept the
    * query and leak). Output columns: (user_id, view_id, purchase_id,
    * view_ts, purchase_ts) — identical to the batch interval join the
    * spec runs over the same data.
    *
    * Scale shape: the join keys on user_id, so both streams shuffle by
    * user once and state is per-key in the store; the time-range
    * residual evaluates post-equi-match, the same discipline as the
    * batch [[graft.ext.RangeJoin]] granule join. */
  def viewPurchaseJoin(views: DataFrame, purchases: DataFrame,
                       horizon: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame = {
    val v = views.select(col("user_id"),
        col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    v.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") < col("view_ts") + expr(s"INTERVAL $horizon"))
      .select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")
  }

  /** Per-trigger stream-static enrichment against a MAINTAINED snapshot
    * ([[graft.cdc.SnapshotMaintainer]]): each micro-batch re-reads the
    * snapshot — a FRESH read inside foreachBatch, so pk-buckets swapped
    * by a concurrent CDC fold between triggers are visible — left-joins
    * the batch on `joinKeys`, and hands the enriched frame to `sink`.
    *
    * The fresh-read-per-trigger is the point: a static DataFrame built
    * once outside the stream captures its file listing at plan time and
    * would serve batch-0's dimension state forever. At scale the join is
    * broadcast when the snapshot is small, shuffle otherwise — standard
    * AQE choice per batch; the snapshot side can also be read bucketed
    * for a co-located join. */
  def enrichWithSnapshot(stream: DataFrame, warehouseDir: String,
                         table: String, joinKeys: Seq[String],
                         sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val snap = graft.cdc.SnapshotMaintainer
        .read(batch.sparkSession, warehouseDir, table)
      sink(batch.join(snap, joinKeys, "left"), id)
    }

  // ------------------------------------------------------------ custom state

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp)
  case class OpenSession(startMs: Long, lastMs: Long, n: Long)
  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)

  /** Custom stateful sessionization via `flatMapGroupsWithState`: per-user
    * state carries the open session; a session CLOSES (and emits) when a
    * later event of the same user arrives more than `gapMs` after it —
    * i.e. gap detection is event-driven, so the operator's output is
    * deterministic under ordered arrival. The final open session per user
    * stays in state (a production deployment adds an EventTimeTimeout so
    * idle sessions also close at the watermark; the built-in
    * `session_window` path in [[sessionAgg]] is the fully-managed
    * alternative — this operator exists for session shapes the built-in
    * can't express, e.g. carrying custom per-session accumulators). */
  def statefulSessions(events: org.apache.spark.sql.Dataset[UserEvent],
                       gapMs: Long = 30L * 60 * 1000)
      : org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def fn(uid: Long, it: Iterator[UserEvent],
           state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      val sorted = it.toIndexedSeq.sortBy(_.ts.getTime)
      var open = state.getOption
      val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      sorted.foreach { e =>
        val t = e.ts.getTime
        open = open match {
          case Some(s) if t - s.lastMs > gapMs =>
            out += ClosedSession(uid, new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.lastMs), s.n)
            Some(OpenSession(t, t, 1))
          case Some(s) => Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
          case None => Some(OpenSession(t, t, 1))
        }
      }
      open.foreach(state.update)
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** [[statefulSessions]] with an event-time timeout: an idle session also
    * closes (and emits) once the watermark passes `last event + gapMs`, so
    * a user's FINAL session isn't stuck in state forever — the semantics a
    * production sessionizer actually wants. Input must carry a watermark
    * on `ts` (`withWatermark`), which is what makes the timeout fire. */
  def statefulSessionsWithTimeout(events: org.apache.spark.sql.Dataset[UserEvent],
                                  gapMs: Long = 30L * 60 * 1000)
      : org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def fn(uid: Long, it: Iterator[UserEvent],
           state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        // watermark passed lastMs + gapMs with no newer event: the open
        // session is definitively over (no on-time event can extend it)
        val s = state.get
        state.remove()
        return Iterator.single(ClosedSession(uid, new java.sql.Timestamp(s.startMs),
          new java.sql.Timestamp(s.lastMs), s.n))
      }
      val sorted = it.toIndexedSeq.sortBy(_.ts.getTime)
      var open = state.getOption
      val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      sorted.foreach { e =>
        val t = e.ts.getTime
        open = open match {
          case Some(s) if t - s.lastMs > gapMs =>
            out += ClosedSession(uid, new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.lastMs), s.n)
            Some(OpenSession(t, t, 1))
          case Some(s) => Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
          case None => Some(OpenSession(t, t, 1))
        }
      }
      open.foreach { s =>
        state.update(s)
        // timeout must sit strictly beyond the current watermark or Spark
        // rejects it (a late event can't re-open an already-closed gap)
        state.setTimeoutTimestamp(
          math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  case class UserTotals(user_id: Long, n_events: Long, last_ts: java.sql.Timestamp)

  /** Running per-user totals via `mapGroupsWithState` — the 1-output-per-
    * key-per-batch state shape (vs flatMap's 0..n): each micro-batch
    * emits every touched user's updated lifetime counters. Update mode
    * downstream sees the latest totals; state is one small struct per
    * user. */
  def runningTotals(events: org.apache.spark.sql.Dataset[UserEvent])
      : org.apache.spark.sql.Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

    def fn(uid: Long, it: Iterator[UserEvent],
           state: GroupState[UserTotals]): UserTotals = {
      var n = state.getOption.map(_.n_events).getOrElse(0L)
      var last = state.getOption.map(_.last_ts.getTime).getOrElse(Long.MinValue)
      it.foreach { e => n += 1; last = math.max(last, e.ts.getTime) }
      val updated = UserTotals(uid, n, new java.sql.Timestamp(last))
      state.update(updated)
      updated
    }

    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.core.Tables

class EventStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** The streaming file source wants a DIRECTORY; the corpus is a single
    * parquet file. Stage a copy under a temp dir once per suite. */
  private lazy val eventsDir: String = {
    val d = tmpDir("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$d/events.parquet"))
    d
  }

  /** Run a streaming aggregation to completion in complete mode against a
    * memory sink and return the final table. */
  private def runComplete(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  private def assertSameRows(a: DataFrame, b: DataFrame, hint: String): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$hint: streaming/batch mismatch " +
        s"(streaming-only=${a.exceptAll(b).count()}, batch-only=${b.exceptAll(a).count()})")
  }

  test("streaming tumbling window == batch window() over the same parquet") {
    val streaming = runComplete(
      EventStream.tumblingAgg(EventStream.readStream(spark, eventsDir)),
      "tumbling_out")
    val batch = EventStream.tumblingAgg(Tables.events(spark, dir))
    // batch path: same operator tree, no watermark needed in batch mode
    assertSameRows(streaming, batch, "tumbling")
    assert(streaming.count() > 0)
  }

  test("streaming sliding windows == batch window(len, slide) over the same parquet") {
    val streaming = runComplete(
      EventStream.slidingAgg(EventStream.readStream(spark, eventsDir)),
      "sliding_out")
    val batch = EventStream.slidingAgg(Tables.events(spark, dir))
    assertSameRows(streaming, batch, "sliding")
    // every event lands in exactly 2 windows: total count doubles
    val total = streaming.agg(org.apache.spark.sql.functions.sum("cnt")).head().getLong(0)
    assert(total == 2 * Tables.events(spark, dir).count())
  }

  test("streaming session windows == batch session_window over same data") {
    val streaming = runComplete(
      EventStream.sessionAgg(EventStream.readStream(spark, eventsDir)),
      "session_out")
    val batch = EventStream.sessionAgg(Tables.events(spark, dir))
    assertSameRows(streaming, batch, "session")
  }

  test("session window counts agree with the lag-based batch sessionization (q16)") {
    val streaming = runComplete(
      EventStream.sessionAgg(EventStream.readStream(spark, eventsDir)),
      "session_out2")
    val perUserStream = streaming.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"))
    val perUserBatch = graft.SparkEntry.queries("q16_sessionize")(spark, dir)
    assertSameRows(
      perUserStream.select($"user_id", $"n_sessions".cast("long")),
      perUserBatch.select($"user_id", $"n_sessions"),
      "session-vs-lag")
  }

  test("flatMapGroupsWithState sessionization: closed sessions == batch sessions minus open tail") {
    // split events into 3 time-ordered files so state must survive batches
    val tmp = tmpDir("stateful-sessions")
    val ev = Tables.events(spark, dir).select($"user_id", $"ts").cache()
    val bounds = ev.selectExpr("percentile(unix_micros(ts), array(0.33, 0.66)) AS p")
      .head().getSeq[Double](0).map(_.toLong)
    ev.filter(unix_micros($"ts") <= bounds(0)).write.parquet(s"$tmp/f=1")
    ev.filter(unix_micros($"ts") > bounds(0) && unix_micros($"ts") <= bounds(1))
      .write.parquet(s"$tmp/f=2")
    ev.filter(unix_micros($"ts") > bounds(1)).write.parquet(s"$tmp/f=3")

    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(tmp)
      .as[EventStream.UserEvent]
    val q = EventStream.statefulSessions(stream).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("stateful_sessions")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val emitted = spark.table("stateful_sessions")
      .select("user_id", "n_events").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap

    // batch truth: all sessions per user, minus each user's final session
    // (still open in state at stream end — event-driven close semantics)
    val batchSessions = EventStream.sessionAgg(Tables.events(spark, dir))
      .orderBy("user_id", "session_start")
      .select("user_id", "n_events").as[(Long, Long)]
      .collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq).toMap
    val expected = batchSessions.collect {
      case (u, ns) if ns.length > 1 => u -> ns.dropRight(1).sorted
    }.toMap
    // sessionAgg orders by session_start already via orderBy above
    assert(emitted == expected,
      s"diff keys: ${(emitted.keySet ++ expected.keySet).filter(k => emitted.get(k) != expected.get(k)).take(5)}")
  }

  test("event-time timeout closes a user's final session without a successor event") {
    val tmp = tmpDir("timeout-sessions")
    def write(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("user_id", "s")
        .select($"user_id", $"s".cast("timestamp").as("ts"))
        .write.parquet(s"$tmp/$name")
    // user 1's only session ends at 10:10; user 2's far-future event
    // advances the watermark well past 10:10 + gap
    write("f=1", Seq(1L -> "2026-01-01 10:00:00", 1L -> "2026-01-01 10:10:00"))

    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(tmp)
      .withWatermark("ts", "0 seconds")
      .as[EventStream.UserEvent]
    val q = EventStream.statefulSessionsWithTimeout(stream).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("timeout_sessions")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
      .start()
    try {
      q.processAllAvailable() // batch 1: u1 session opens, timeout armed
      write("f=2", Seq(2L -> "2026-01-01 20:00:00"))
      q.processAllAvailable() // batch 2: watermark -> 20:00 after this
      // the timeout fires in a subsequent (possibly no-data) micro-batch
      val deadline = System.currentTimeMillis() + 30000
      def emitted() = spark.table("timeout_sessions")
        .select("user_id", "n_events").as[(Long, Long)].collect().toSet
      while (emitted().isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); q.processAllAvailable()
      }
      // user 1 emits VIA TIMEOUT (no successor u1 event exists); user 2's
      // open session is within gap of the watermark and must NOT emit
      val diag = q.recentProgress.map(pr =>
        s"batch=${pr.batchId} rows=${pr.numInputRows} wm=${Option(pr.eventTime.get("watermark")).getOrElse("-")} " +
        s"state=${pr.stateOperators.map(so => s"rows=${so.numRowsTotal},updated=${so.numRowsUpdated},removed=${so.numRowsRemoved}").mkString}").mkString("\n")
      assert(emitted() == Set((1L, 2L)), s"got ${emitted()}\n$diag")
    } finally q.stop()
  }

  test("windowedTopK: chained streaming aggs emit the batch top-k per window") {
    // append mode: a window's top-k emits once the watermark passes its
    // end, so feed the real events as batch 0 and two far-future flush
    // events as separate later batches — the first advances the
    // watermark past every real window, the next gives append mode a
    // batch in which to emit them. The flush windows themselves stay
    // unemitted (watermark never passes them), so streaming output must
    // equal the batch operator over the ORIGINAL events exactly.
    val d2 = tmpDir("events-topk")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$d2/a_events.parquet"))
    val maxMicros = Tables.events(spark, dir)
      .agg(max(unix_micros(col("ts").cast("timestamp")))).head().getLong(0)
    // stage flushes as later-listed files (file source orders by path);
    // ts must carry the SAME physical type as the corpus file (the
    // stream declares the on-disk schema) — LocalDateTime ⇒ TIMESTAMP_NTZ
    (0 until 2).foreach { i =>
      val src = tmpDir(s"flush-stage$i")
      val flushMicros = maxMicros + (i + 10) * 3600L * 1000000L
      val flushTs = java.time.LocalDateTime.ofEpochSecond(
        flushMicros / 1000000L, ((flushMicros % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
      Seq((999999L + i, flushTs, 999999L + i, "flush", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(src)
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(src))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$d2/z_flush$i.parquet"))
    }

    val streamed = {
      val q = EventStream.windowedTopK(
          EventStream.readStream(spark, d2, maxFilesPerTrigger = 1), k = 3)
        .writeStream.outputMode("append").format("memory")
        .queryName("topk_out").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table("topk_out")
    }
    val batch = EventStream.windowedTopK(Tables.events(spark, dir), k = 3)
    assertSameRows(streamed, batch, "windowedTopK")
    assert(streamed.count() > 0)
  }

  test("dropDuplicatesWithinWatermark removes replayed events") {
    // duplicate the batch by writing the same 200 events twice into a
    // watched dir (Spark-written parquet: use the written schema, not the
    // raw-nanos corpus schema)
    val tmp = tmpDir("dup-events")
    val src = Tables.events(spark, dir).limit(200).cache()
    src.write.mode("append").parquet(tmp)
    src.write.mode("append").parquet(tmp) // same 200 events again
    val streamed = EventStream.dedupedStream(
      spark.readStream.schema(src.schema).parquet(tmp))
    val q = streamed.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("dedup_out")
    assert(got.count() == 200, s"expected 200 unique events, got ${got.count()}")
    assert(got.select("event_id").distinct().count() == 200)
  }
  test("mapGroupsWithState running totals converge to batch counts across batches") {
    val tmp = tmpDir("running-totals")
    val ev = Tables.events(spark, dir).select($"user_id", $"ts").cache()
    val mid = ev.selectExpr("percentile(unix_micros(ts), 0.5) AS p").head().getDouble(0).toLong
    ev.filter(unix_micros($"ts") <= mid).write.parquet(s"$tmp/f=1")
    ev.filter(unix_micros($"ts") > mid).write.parquet(s"$tmp/f=2")

    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(tmp)
      .as[EventStream.UserEvent]
    val q = EventStream.runningTotals(stream).toDF()
      .writeStream.outputMode("update").format("memory")
      .queryName("running_totals")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    // LAST emission per user (update stream) == batch lifetime counts
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val finalTotals = spark.table("running_totals")
      .withColumn("__max_n", max($"n_events").over(w))
      .filter($"n_events" === $"__max_n")
      .select($"user_id", $"n_events").distinct()
      .as[(Long, Long)].collect().toMap
    val batch = ev.groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(finalTotals == batch)
    ev.unpersist()
  }

  test("stream-stream interval join == batch interval join over the same parquet") {
    val views = EventStream.readStream(spark, eventsDir)
      .filter($"event_type" === "view")
    val purchases = EventStream.readStream(spark, eventsDir)
      .filter($"event_type" === "purchase")
    val q = EventStream.viewPurchaseJoin(views, purchases)
      .writeStream.outputMode("append").format("memory")
      .queryName("vp_join")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streaming = spark.table("vp_join")

    val ev = Tables.events(spark, dir)
    val batch = ev.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("view_ts"))
      .join(ev.filter($"event_type" === "purchase")
          .select($"user_id".as("p_user_id"), $"event_id".as("purchase_id"),
            $"ts".as("purchase_ts")),
        $"user_id" === $"p_user_id" &&
          $"purchase_ts" >= $"view_ts" &&
          $"purchase_ts" < $"view_ts" + expr("INTERVAL 1 HOUR"))
      .select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")
    assertSameRows(streaming, batch, "stream-stream join")
    assert(streaming.count() > 0, "join must produce real matches")
  }

  test("readStream: start-before-produce (empty dir) falls back to the declared schema") {
    val dir = tmpDir("events-empty")
    val s = EventStream.readStream(spark, dir) // must not throw
    assert(s.isStreaming)
    assert(s.schema == EventStream.fallbackSchema)
    // an explicit hint wins over both sniffing and the fallback
    val hinted = EventStream.readStream(spark, dir,
      schemaHint = Some(EventStream.fallbackSchema))
    assert(hinted.schema == EventStream.fallbackSchema)
  }

}

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
}

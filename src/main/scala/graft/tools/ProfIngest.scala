package graft.tools

// Throwaway component-timing harness for the ingest hot path (not part of
// the library surface; used to attribute ingest+fold seconds to stages).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc._

object ProfIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("prof-ingest").toString
    val inDir = s"$work/in"
    val n = IngestBench.writeEnvelopes(spark, sfDir, inDir, 4)
    println(s"records=$n")
    def time(label: String)(f: => Unit): Unit = {
      System.gc(); val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: $s%.2f s => ${n / s}%.0f rps")
    }
    spark.read.text(inDir).limit(100).count()
    time("1 raw text count")(spark.read.text(inDir).count(): Unit)
    time("2 envelope parse agg")(
      Envelope.parse(spark.read.text(inDir)).agg(count(col("object"))).collect(): Unit)
    val registry = Registry.fromJson(IngestBench.registryJson)
    val spec = registry("orders_cdc")
    time("3 parse+project agg")(
      Envelope.project(Envelope.parse(spark.read.text(inDir)), spec)
        .agg(count(lit(1))).collect(): Unit)
    time("4 parse+project parquet write")(
      Envelope.project(Envelope.parse(spark.read.text(inDir)), spec)
        .write.mode("overwrite").parquet(s"$work/w4"): Unit)
    time("5 full ingestDir")(Ingest.ingestDir(spark, inDir, registry, s"$work/wh"))
    time("6 full ingestDir again")(Ingest.ingestDir(spark, inDir, registry, s"$work/wh2"))
    val fused = new org.apache.spark.sql.types.StructType()
      .add("object", "string").add("source_timestamp", "string")
      .add("source_metadata",
        new org.apache.spark.sql.types.StructType().add("change_type", "string"))
      .add("payload", spec.payloadSchema)
    time("7 fused single-parse agg")(
      spark.read.text(inDir).select(from_json(col("value"), fused).as("e"))
        .select(col("e.payload.*"),
          col("e.source_metadata.change_type").as("action"),
          col("e.source_timestamp").cast("timestamp").as("update_date"))
        .agg(count(lit(1))).collect(): Unit)
    time("8 fused single-parse parquet write")(
      spark.read.text(inDir).select(from_json(col("value"), fused).as("e"))
        .select(col("e.payload.*"),
          col("e.source_metadata.change_type").as("action"),
          col("e.source_timestamp").cast("timestamp").as("update_date"))
        .write.mode("overwrite").parquet(s"$work/w8"): Unit)
    def stream(label: String, maxFiles: Int, withFold: Boolean): Unit = {
      val d = s"$work/s-${label.hashCode.abs}"
      time(label)(graft.streaming.CdcStream.runOnce(spark,
        graft.streaming.CdcStreamConfig(inDir, s"$d/wh", s"$d/ck", registry,
          maxFilesPerTrigger = maxFiles,
          snapshotKeys =
            if (withFold) Map("orders_cdc" -> Seq("o_orderkey")) else Map.empty)))
    }
    stream("9  stream nofold mf=32", 32, withFold = false)
    stream("10 stream nofold mf=64", 64, withFold = false)
    stream("11 stream fold   mf=64", 64, withFold = true)
    stream("12 stream fold   mf=32", 32, withFold = true)
    stream("13 stream nofold mf=32 again", 32, withFold = false)

    // direct fold (no streaming): write one batch dir, then time update()
    // phases — first fold (no existing snapshot) and second fold (all 64
    // buckets exist).
    locally {
      val d = s"$work/direct"
      Ingest.ingestDir(spark, inDir, registry, s"$d/wh")
      val batch = spark.read.parquet(s"$d/wh/${spec.physicalName}/batch=0")
      time("14 direct fold #1 (empty snapshot)")(
        graft.cdc.SnapshotMaintainer.update(spark, s"$d/wh", "orders_cdc",
          batch, Seq("o_orderkey")))
      time("15 direct fold #2 (64 buckets exist)")(
        graft.cdc.SnapshotMaintainer.update(spark, s"$d/wh", "orders_cdc",
          batch, Seq("o_orderkey")))
      val files = new java.io.File(
        s"$d/wh/_snapshot/orders_cdc").listFiles()
      val nFiles = Option(files).map(_.flatMap(b =>
        Option(b.listFiles()).getOrElse(Array.empty)).length).getOrElse(-1)
      println(s"snapshot part files total: $nFiles")
    }
    new java.lang.ProcessBuilder("rm", "-rf", work).start().waitFor(): Unit
    spark.stop()
  }
}

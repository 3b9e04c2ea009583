package graft.tools

import org.apache.spark.sql.SparkSession

/** Depth benchmark for the batched BPE trainer: train `rounds` merges
  * (default 1024) over the documents table and print one JSON line.
  * The sequential trainer's ~1.5 s/merge job overhead put deep
  * vocabularies out of reach; the batched loop's target is 1024 merges
  * at sf0.1 in under 60 s. */
object BpeDepthBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val rounds = args.lift(1).map(_.toInt).getOrElse(1024)
    val batchCap = args.lift(2).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.documents(spark, sfDir)
    val t0 = System.nanoTime()
    val merges = graft.ext.TextAnalysis.bpeMergesBatched(
      docs, rounds = rounds, batchCap = batchCap)
    val n = merges.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"bpe_depth_train","value":$secs%.2f,"unit":"sec","merges":$n,"rounds":$rounds,"batch_cap":$batchCap,"merges_per_sec":${n / secs}%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}

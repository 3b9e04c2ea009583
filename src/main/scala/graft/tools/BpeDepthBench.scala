package graft.tools

import org.apache.spark.sql.SparkSession

/** Depth benchmark for the batched BPE trainer: train `rounds` merges
  * (default 1024) over the documents table and print one JSON line
  * (also appended to `bench_bpe_depth.json`, or args(3)). Logs the
  * per-pass adoption rate — adopted ÷ batchCap is how much of each
  * Spark job the greedy non-conflict rule kept, the depth-efficiency
  * signal. The sequential trainer's ~1.5 s/merge job overhead put deep
  * vocabularies out of reach; the batched loop's target is 1024 merges
  * at sf0.1 in under 60 s, and vocabulary-scale depth (≥8k merges, a
  * larger batchCap) within ~5× that wall. */
object BpeDepthBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val rounds = args.lift(1).map(_.toInt).getOrElse(1024)
    val batchCap = args.lift(2).map(_.toInt).getOrElse(64)
    val outPath = args.lift(3).getOrElse("bench_bpe_depth.json")
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
    val (res, toksFrame) = graft.ext.TextAnalysis.bpeTrainBatched(
      docs, "doc_id", "text", rounds = rounds, batchCap = batchCap)
    toksFrame.unpersist(false)
    val table = res.merges.map(m => (m._2, m._3))
    val n = table.size
    val secs = (System.nanoTime() - t0) / 1e9
    // per-pass adoption: each pass is one pair-count Spark job; the
    // greedy non-conflict rule adopts up to batchCap merges from it
    res.adoptedPerWindow.zipWithIndex.foreach { case (a, i) =>
      System.err.println(f"[bpe-depth] pass ${i + 1}%3d: adopted $a%4d / $batchCap (${100.0 * a / batchCap}%.0f%%)")
    }
    val passes = res.adoptedPerWindow.size
    val meanAdopt =
      if (passes == 0) 0.0 else res.adoptedPerWindow.sum.toDouble / passes
    val minAdopt = if (passes == 0) 0 else res.adoptedPerWindow.min

    // ENCODE-side depth check: applying the full trained table through
    // the rank-routing indexed kernel must cost ~the same as applying
    // its first 8 merges (depth-independence); the sequential kernel at
    // full depth shows the O(merges × tokens) cost it replaces.
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    def timeEncode(t: Seq[(String, String)], indexed: Boolean): Double = {
      val toks = split(col("text"), " ")
      val enc = if (indexed)
        VectorFunctions.bpe_apply_merges_indexed(toks, t.map(_._1), t.map(_._2))
      else VectorFunctions.bpe_apply_merges(toks, t.map(_._1), t.map(_._2))
      val s0 = System.nanoTime()
      docs.select(size(enc).as("n")).agg(sum(col("n"))).head(): Unit
      (System.nanoTime() - s0) / 1e9
    }
    // codegen/JIT warm-up for BOTH kernels, so neither timed figure
    // carries first-use compilation cost (an unwarmed sequential kernel
    // would inflate the reported sequential-vs-indexed gap)
    timeEncode(table.take(8), indexed = true): Unit
    timeEncode(table.take(8), indexed = false): Unit
    val idx8 = timeEncode(table.take(8), indexed = true)
    val idxFull = timeEncode(table, indexed = true)
    val seqFull = timeEncode(table, indexed = false)

    val json = f"""{"metric":"bpe_depth_train","value":$secs%.2f,"unit":"sec","merges":$n,"rounds":$rounds,"batch_cap":$batchCap,"passes":$passes,"mean_adopted_per_pass":$meanAdopt%.1f,"min_adopted_per_pass":$minAdopt,"merges_per_sec":${n / secs}%.1f,"encode_indexed_8_secs":$idx8%.2f,"encode_indexed_full_secs":$idxFull%.2f,"encode_sequential_full_secs":$seqFull%.2f,"sf":"$sfDir"}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      json + "\n", java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND): Unit
    spark.stop()
  }
}

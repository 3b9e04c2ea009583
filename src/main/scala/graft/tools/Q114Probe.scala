package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnosis probe for q114 (dup_pagerank) — the round-11 verdict's
  * open item: q114 measured 3.93 s (r10) → 6.5–8.8 s (r11) with NO code
  * change. This probe splits the wall between the tile-edge build and
  * the 5 PageRank rounds, repeated 3× in one JVM. Measured r12 at sf0.1:
  *
  *   rep1  edges=3.57 s  pr5=4.46 s   (cold: codegen compile + 11
  *                                     sequential job round-trips)
  *   rep2  edges=0.75 s  pr5=2.25 s
  *   rep3  edges=0.62 s  pr5=1.84 s
  *
  * i.e. ~70% of the single-sample wall is FIRST-RUN fixed latency
  * (whole-stage codegen compilation of the tile/edge expressions, and
  * the scheduler round-trips of q114's 11 sequential actions), not data
  * work — the plan itself does ~2.5 s of work at sf0.1 and scales at
  * 0.12 per-row (×10 table). A latency-dominated query's single sample
  * is hostage to JVM/JIT state, which drifts as the suite grows; the
  * r12 bench's median-of-N mode (queries + queries_cold maps) makes
  * both figures visible per round. */
object Q114Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.core.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    spark.read.parquet(s"$sfDir/region.parquet").count()
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val edges = graft.ext.Dedup.tileDupEdges(
        graft.core.Tables.documents(spark, sfDir), "doc_id", "text", width = 8)
        .localCheckpoint(true)
      val t1 = System.nanoTime()
      val n = edges.count()
      val t2 = System.nanoTime()
      val r = graft.ext.PageRank.ranks(edges, iterations = 5)
      r.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"[probe] rep$rep edges=${(t1 - t0) / 1e9}%.2f s (n=$n, count ${(t2 - t1) / 1e9}%.2f s) pr5=${(t3 - t2) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

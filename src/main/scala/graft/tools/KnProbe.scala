package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time the kn4 pipeline's component stages in isolation so
  * the optimization target inside the 8-9 s pruned-4-gram queries is
  * named (gram build vs type table vs kept/loss chain vs scoring). */
object KnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b = b.config(k.trim, v.trim)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, sfDir)
    docs.write.format("noop").mode("overwrite").save()

    def time(name: String)(f: => Unit): Unit = {
      for (rep <- 1 to 2) {
        System.gc()
        val t0 = System.nanoTime()
        f
        println(f"[knprobe] $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("docQuadgrams")(noop(graft.ext.NgramLM.docQuadgrams(docs)))
    time("c1234")(noop(graft.ext.NgramLM.docQuadgrams(docs)
      .groupBy("w1", "w2", "w3", "w4").agg(sum("n").as("c1234"))))
    time("kn4PruneEntries")(noop(graft.ext.NgramLM.kn4PruneEntries(docs, 1e-4)))
    time("kn4LogLik")(noop(graft.ext.NgramLM.kn4LogLik(docs, docs)))
    time("kn4PrunedLogLik")(noop(graft.ext.NgramLM.kn4PrunedLogLik(docs, docs, 1e-4)))
    spark.stop()
  }
}

package graft.core

import org.apache.spark.sql.SparkSession

import graft.functions.VectorFunctions

/** Canonical session factory for the engine.
  *
  * Defaults tuned for correctness-parity and local[N] execution: UTC
  * session timezone (oracle parity), AQE on (runtime broadcast/skew
  * re-planning — the 100 TB safety net), shuffle partitions sized to the
  * machine rather than Spark's default 200. Custom SQL functions
  * (cosine_similarity, dot_product, simhash64, token_fingerprint64) are
  * registered so the pure-SQL surface reaches them too.
  */
object GraftSession {

  def create(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
             appName: String = "graft",
             shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // scalar kernels AND the point-in-time TVFs (snapshot / as_of /
      // changes_between / scd2) — withExtensions only binds at session
      // construction, so it must happen here, not in enableSqlSurface
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    VectorFunctions.registerAll(spark)
    spark
  }

  /** Register the driver corpus as temp views + custom functions on an
    * existing session, enabling the `spark.sql(...)` query surface —
    * including the versioned CDC table `orders_v` (the q17 changelog),
    * so the point-in-time TVFs work out of the box:
    * `SELECT * FROM as_of('orders_v', TIMESTAMP '1998-01-01')`. */
  def enableSqlSurface(spark: SparkSession, dir: String): SparkSession = {
    VectorFunctions.registerAll(spark)
    Tables.registerViews(spark, dir)
    graft.cdc.VersionedSql.register("orders_v",
      graft.cdc.Changelog.fromOrders(spark, dir), Seq("pk"))
    spark
  }
}

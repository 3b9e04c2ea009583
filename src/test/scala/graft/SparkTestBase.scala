package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One local session per suite; UTC + AQE, small shuffle partitions. */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

object SparkTestBase {
  // Per-JVM scratch root for the maintained-store gate queries: two
  // concurrently-running test JVMs on one checkout would otherwise race
  // on <repo>/target/stream_gate (each JVM's ensureStore deletes and
  // rebuilds the same dirs — a reader in the other JVM sees vanished
  // files). Driver-contract mains (Verify/Bench) keep the user.dir
  // default; only tests isolate.
  locally {
    if (!sys.props.contains("graft.work.dir")) {
      sys.props("graft.work.dir") =
        java.nio.file.Files.createTempDirectory("graft-test-work").toString
    }
  }

  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    // catalog tables (bucketed layouts) land in a scratch dir, not ./spark-warehouse
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-test-wh").toString)
    .config("spark.ui.enabled", "false")
    // the engine's full surface (native fns, TVFs, optimizer rules) —
    // the same extensions every driver-contract session (Bench, Verify,
    // GraftSession) loads. Required since q219 entered the contract: its
    // SQL face resolves the kn_model_score TVF, so the shared test
    // session must carry the registry; without this the "every declared
    // query runs" gate depended on SUITE ORDERING (green only when an
    // extensions-loaded spec session happened to become the default
    // session first).
    .withExtensions(new graft.core.GraftExtensions)
    .getOrCreate()
}

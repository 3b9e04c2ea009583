package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.cdc.{Fixtures, Ingest, SnapshotMaintainer, Versioned}

/** In-stream compaction (CdcStreamConfig.compactEveryNBatches): a long
  * stream must keep its directory count bounded WITHOUT changing anything
  * a reader sees — table contents, maintained snapshot, or point-in-time
  * queries. */
class CdcCompactionSpec extends SparkTestBase {

  private def mkFile(i: Int): Seq[String] = {
    val ts = f"2026-01-01T${10 + i}%02d:00:00.000Z"
    Seq(
      Fixtures.envelope("products", ts, if (i == 0) "insert" else "update",
        s"""{"product_id":"p${i % 2}","category":"c$i","weight_g":${100 + i}.0,"photos_qty":$i}"""),
      Fixtures.envelope("users", ts, if (i == 0) "insert" else "update",
        s"""{"user_id":7,"email":"u$i@x.io","balance":$i.5}"""),
      Fixtures.envelope("mystery", ts, "insert", s"""{"x":$i}"""))
  }

  test("compactEveryNBatches: bounded dirs, identical reads/folds/as-of") {
    val in = tmpDir("cc-in")
    val whC = tmpDir("cc-wh-compact"); val ckC = tmpDir("cc-ck-compact")
    val whP = tmpDir("cc-wh-plain");   val ckP = tmpDir("cc-ck-plain")
    (0 until 6).foreach(i =>
      Fixtures.writeLines(in, f"log-$i%03d.jsonl", mkFile(i), gzip = false))

    val base = CdcStreamConfig(in, whC, ckC, Fixtures.registry,
      maxFilesPerTrigger = 1, partitionByDate = true,
      snapshotKeys = Map("products" -> Seq("product_id")))
    CdcStream.runOnce(spark, base.copy(compactEveryNBatches = 2))
    CdcStream.runOnce(spark, base.copy(warehouseDir = whP, checkpointDir = ckP))

    // 6 one-file triggers; compaction at batches 2 and 4 → the compacted
    // table may hold at most batch=-1 plus the batches after the last
    // compaction point, never the uncompacted one-dir-per-trigger count
    val phys = Fixtures.registry("products").physicalName
    def batchDirs(wh: String): Seq[String] =
      new java.io.File(s"$wh/$phys").listFiles().toSeq
        .map(_.getName).filter(_.startsWith("batch="))
    assert(batchDirs(whP).size == 6)
    assert(batchDirs(whC).size <= 3, s"dirs not bounded: ${batchDirs(whC)}")
    assert(batchDirs(whC).contains("batch=-1"))

    for (t <- Seq("products", "users")) {
      val a = Ingest.readTable(spark, whC, Fixtures.registry(t))
      val b = Ingest.readTable(spark, whP, Fixtures.registry(t))
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"table $t diverged after compaction")
    }

    // dead letter compacted and content-identical too
    val dlA = spark.read.parquet(s"$whC/${Ingest.UnknownTableDir}").select("object", "_raw")
    val dlB = spark.read.parquet(s"$whP/${Ingest.UnknownTableDir}").select("object", "_raw")
    assert(dlA.exceptAll(dlB).isEmpty && dlB.exceptAll(dlA).isEmpty)

    // maintained snapshot unaffected (it lives outside batch= dirs)
    val snapC = SnapshotMaintainer.read(spark, whC, "products").orderBy("product_id")
    val snapP = SnapshotMaintainer.read(spark, whP, "products").orderBy("product_id")
    assert(snapC.collect().toSeq == snapP.collect().toSeq)

    // point-in-time over the compacted changelog == over the plain one
    val t = lit("2026-01-01T13:30:00").cast("timestamp")
    def asOf(wh: String) = Versioned.asOf(
        Ingest.readTable(spark, wh, Fixtures.registry("users"))
          .withColumn("update_date", col("update_date").cast("timestamp")),
        t, Seq("user_id"))
      .orderBy("user_id")
    assert(asOf(whC).collect().toSeq == asOf(whP).collect().toSeq)
  }

  test("compaction is idempotent and safe to re-run on a compact table") {
    val in = tmpDir("cc2-in"); val wh = tmpDir("cc2-wh"); val ck = tmpDir("cc2-ck")
    (0 until 4).foreach(i =>
      Fixtures.writeLines(in, f"log-$i%03d.jsonl", mkFile(i), gzip = false))
    CdcStream.runOnce(spark, CdcStreamConfig(in, wh, ck, Fixtures.registry,
      maxFilesPerTrigger = 1))
    val phys = Fixtures.registry("products").physicalName
    val before = Ingest.readTable(spark, wh, Fixtures.registry("products")).collect().toSet
    Ingest.compactBatches(spark, wh, phys, upToBatch = 3)
    Ingest.compactBatches(spark, wh, phys, upToBatch = 3) // no-op re-run
    val after = Ingest.readTable(spark, wh, Fixtures.registry("products")).collect().toSet
    assert(after == before)
    val dirs = new java.io.File(s"$wh/$phys").listFiles()
      .map(_.getName).filter(_.startsWith("batch="))
    assert(dirs.toSeq == Seq("batch=-1"))
  }
}

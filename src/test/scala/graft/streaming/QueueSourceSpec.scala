package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.cdc.{Fixtures, Ingest}
import graft.sources.{QueueSource => QueueLog}

/** The queue-shaped S1 seam, E2E: envelope records stream from an
  * offset-addressed queue (graft.sources.QueueSourceProvider — Kafka's
  * offset semantics without a broker: global monotonic offsets,
  * checkpointed ranges, bounded admission) through the FULL CdcStream
  * pipeline into the same warehouse assertions as the file-source parity
  * tests, including an offsets-resume restart. */
class QueueSourceSpec extends SparkTestBase {

  private def envLines(lo: Int, hi: Int): Seq[String] =
    (lo until hi).flatMap { i =>
      val ts = f"2026-01-01T10:${i % 60}%02d:${i / 60}%02d.000Z"
      Seq(
        Fixtures.envelope("products", ts, if (i == 0) "insert" else "update",
          s"""{"product_id":"p${i % 5}","category":"c$i","weight_g":$i.0,"photos_qty":$i}"""),
        Fixtures.envelope("users", ts, if (i == 0) "insert" else "update",
          s"""{"user_id":${i % 7},"email":"u$i@x.io","balance":$i.25}"""))
    }

  test("queue E2E: bounded admission batches, warehouse parity with file source") {
    val qdir = tmpDir("qs-queue")
    val whQ = tmpDir("qs-wh"); val ckQ = tmpDir("qs-ck")
    val whF = tmpDir("qs-wh-file"); val ckF = tmpDir("qs-ck-file")
    val fdir = tmpDir("qs-files")

    val lines = envLines(0, 60) // 120 records
    // queue side: 4 segments of 30; file side: same lines
    lines.grouped(30).zipWithIndex.foreach { case (seg, i) =>
      QueueLog.appendSegment(qdir, f"$i%06d.seg", seg)
    }
    Fixtures.writeLines(fdir, "all.jsonl", lines, gzip = false)

    // 25 records per trigger -> the 120 records need >= 5 micro-batches:
    // admission control (Kafka's maxOffsetsPerTrigger seam) is really
    // bounding each batch, visible as distinct batch= dirs
    CdcStream.runOnce(spark, CdcStreamConfig(qdir, whQ, ckQ, Fixtures.registry,
      source = Some(QueueSource(qdir, maxRecordsPerTrigger = 25L)),
      snapshotKeys = Map("users" -> Seq("user_id"))))
    CdcStream.runOnce(spark, CdcStreamConfig(fdir, whF, ckF, Fixtures.registry,
      snapshotKeys = Map("users" -> Seq("user_id"))))

    val phys = Fixtures.registry("users").physicalName
    val batchDirs = new java.io.File(s"$whQ/$phys").listFiles().toSeq
      .map(_.getName).filter(_.startsWith("batch="))
    assert(batchDirs.size >= 5,
      s"25-record admission over 120 records must yield >= 5 batches, got $batchDirs")

    for (t <- Seq("products", "users")) {
      val a = Ingest.readTable(spark, whQ, Fixtures.registry(t))
      val b = Ingest.readTable(spark, whF, Fixtures.registry(t))
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"table $t: queue-source warehouse != file-source warehouse")
    }
  }

  test("queue E2E: restart resumes from the committed offset — no dupes, no gaps") {
    val qdir = tmpDir("qsr-queue")
    val wh = tmpDir("qsr-wh"); val ck = tmpDir("qsr-ck")

    QueueLog.appendSegment(qdir, "000000.seg", envLines(0, 20))
    val cfg = CdcStreamConfig(qdir, wh, ck, Fixtures.registry,
      source = Some(QueueSource(qdir, maxRecordsPerTrigger = 7L)))
    CdcStream.runOnce(spark, cfg)

    val phys = Fixtures.registry("users").physicalName
    def userRows() = Ingest.readTable(spark, wh, Fixtures.registry("users"))
    assert(userRows().count() == 20)

    // producer appends two more segments while the stream is DOWN;
    // restart with the same checkpoint must process exactly the new 20
    QueueLog.appendSegment(qdir, "000001.seg", envLines(20, 30))
    QueueLog.appendSegment(qdir, "000002.seg", envLines(30, 40))
    CdcStream.runOnce(spark, cfg)

    val rows = userRows()
    assert(rows.count() == 40, "restart must resume at the committed offset")
    assert(rows.select("email").distinct().count() == 40,
      "no record may be consumed twice across the restart")
    // and a THIRD run with nothing new appended is a no-op
    CdcStream.runOnce(spark, cfg)
    assert(userRows().count() == 40)
  }
}

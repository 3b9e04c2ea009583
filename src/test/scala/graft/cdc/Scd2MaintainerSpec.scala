package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Maintained SCD2 ≡ the batch operator over the full history, under
  * replay, out-of-order versions, and random batch splits; folds touch
  * only their pk-hash buckets. */
class Scd2MaintainerSpec extends SparkTestBase {
  import spark.implicits._

  private val pk = Seq("id")

  private def batchDf(rows: (Long, String, String, String)*): DataFrame =
    rows.toDF("id", "action", "update_date", "payload")

  private type R = (Long, String, String, String, String, String, Boolean)

  private def maintained(wh: String): Seq[R] =
    Scd2Maintainer.read(spark, wh, "t")
      .select($"id", $"action", $"update_date", $"payload",
        $"valid_from", $"valid_to", $"is_current")
      .as[R].collect().sortBy(r => (r._1, r._5, r._2)).toSeq

  private def batchScd2(all: Seq[(Long, String, String, String)]): Seq[R] =
    Versioned.scd2(batchDf(all: _*), pk)
      .select($"id", $"action", $"update_date", $"payload",
        $"valid_from", $"valid_to", $"is_current")
      .as[R].collect().sortBy(r => (r._1, r._5, r._2)).toSeq

  test("folds equal the batch SCD2; late data inserts mid-timeline") {
    val wh = "file:" + tmpDir("scd2-wh")
    val b0 = Seq(
      (1L, "insert", "2026-01-01T10:00:00", "a1"),
      (2L, "insert", "2026-01-01T10:00:00", "b1"))
    val b1 = Seq(
      (1L, "update", "2026-01-01T12:00:00", "a3"),
      (2L, "delete", "2026-01-01T11:30:00", null.asInstanceOf[String]))
    // LATE: an 11:00 version for key 1 arrives after its 12:00 update —
    // the fold must close it against 12:00, not append it as current
    val b2 = Seq((1L, "update", "2026-01-01T11:00:00", "a2"))
    Scd2Maintainer.update(spark, wh, "t", batchDf(b0: _*), pk)
    Scd2Maintainer.update(spark, wh, "t", batchDf(b1: _*), pk)
    Scd2Maintainer.update(spark, wh, "t", batchDf(b2: _*), pk)

    assert(maintained(wh) == batchScd2(b0 ++ b1 ++ b2))
    val cur = maintained(wh).filter(_._7)
    assert(cur.map(r => r._1 -> r._4) == Seq(1L -> "a3"),
      "only key 1's 12:00 version is current; key 2 is deleted")
    val late = maintained(wh).find(r => r._1 == 1L && r._4 == "a2").get
    assert(late._5 == "2026-01-01T11:00:00" && late._6 == "2026-01-01T12:00:00",
      "the late version must be closed against its successor")
  }

  test("maintained equals batch over random splits and orders; replay is a no-op") {
    val rng = new scala.util.Random(13)
    val all = (0 until 120).map { i =>
      val id = (i % 17).toLong
      val ts = f"2026-02-${1 + i / 40}%02dT${8 + (i * 7) % 12}%02d:${(i * 13) % 60}%02d:00"
      val action = if (i % 19 == 3) "delete" else if (i % 5 == 0) "insert" else "update"
      (id, action, ts, if (action == "delete") null.asInstanceOf[String] else s"v$i")
    }.distinct
    val shuffled = rng.shuffle(all)
    val wh = "file:" + tmpDir("scd2rand-wh")
    val batches = shuffled.grouped(25).toSeq
    batches.foreach(b => Scd2Maintainer.update(spark, wh, "t", batchDf(b: _*), pk))
    assert(maintained(wh) == batchScd2(all),
      "random split/order folds must converge to the batch operator")

    // replay an arbitrary old batch: exact duplicates collapse
    Scd2Maintainer.update(spark, wh, "t", batchDf(batches(1): _*), pk)
    assert(maintained(wh) == batchScd2(all), "replay must change nothing")
  }

  test("a fold rewrites only the buckets its keys hash into") {
    val wh = "file:" + tmpDir("scd2inc-wh")
    val dir = Scd2Maintainer.scd2Dir(wh, "t")
    Scd2Maintainer.update(spark, wh, "t",
      batchDf((0L until 40L).map(i =>
        (i, "insert", "2026-01-01T10:00:00", s"p$i")): _*), pk)

    def fileState(): Map[String, (Long, Long)] = {
      val root = new Path(dir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      val it = fs.listFiles(root, true)
      val b = Map.newBuilder[String, (Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        b += f.getPath.toString -> ((f.getLen, f.getModificationTime))
      }
      b.result()
    }
    val before = fileState()
    val touched = spark.range(1)
      .select(pmod(hash(lit(7L)), lit(Scd2Maintainer.DefaultBuckets)))
      .head().getInt(0)
    Scd2Maintainer.update(spark, wh, "t",
      batchDf((7L, "update", "2026-01-01T11:00:00", "p7b")), pk)
    val after = fileState()
    before.foreach { case (path, st) =>
      if (!path.contains(s"__bucket=$touched"))
        assert(after.get(path).contains(st),
          s"untouched bucket file changed: $path")
    }
  }
}

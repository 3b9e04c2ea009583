package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.cdc.AggMaintainer.AggSpec

/** Incrementally-maintained GROUP BY over the maintained snapshot. The
  * oracle everywhere: the maintained table must equal the from-scratch
  * aggregate of the current snapshot, bit-for-bit (decimal sums). */
class AggMaintainerSpec extends SparkTestBase {
  import spark.implicits._

  private val pk = Seq("id")
  private val spec = AggSpec("by_status", Seq("status"), Seq("amount"))

  private def batchDf(rows: (Long, String, String, String, Double)*): DataFrame =
    rows.toDF("id", "action", "update_date", "status", "amount")

  private def maintained(wh: String): Map[String, (Long, java.math.BigDecimal)] =
    AggMaintainer.read(spark, wh, "t", "by_status")
      .select("status", "n_rows", "sum_amount")
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map { case (s, n, a) => s -> ((n, a)) }.toMap

  private def recomputed(wh: String): Map[String, (Long, java.math.BigDecimal)] =
    SnapshotMaintainer.read(spark, wh, "t")
      .groupBy("status")
      .agg(count(lit(1)).as("n"), sum($"amount".cast("decimal(38,8)")).as("s"))
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map { case (s, n, a) => s -> ((n, a)) }.toMap

  private def check(wh: String, hint: String): Unit = {
    val m = maintained(wh); val r = recomputed(wh)
    assert(m == r, s"$hint: maintained $m != recomputed $r")
  }

  test("inserts, group-moving updates, and deletes maintain the aggregate exactly") {
    val wh = "file:" + tmpDir("aggm-wh")
    AggMaintainer.foldAndMaintain(spark, wh, "t", batchDf(
      (1L, "insert", "2026-01-01T10:00:00", "open", 10.0),
      (2L, "insert", "2026-01-01T10:00:00", "open", 20.0),
      (3L, "insert", "2026-01-01T10:00:00", "done", 5.0)), pk, Seq(spec))
    check(wh, "after inserts")
    assert(maintained(wh)("open")._1 == 2L)

    // update moves pk 1 open -> done AND changes its amount
    AggMaintainer.foldAndMaintain(spark, wh, "t", batchDf(
      (1L, "update", "2026-01-01T11:00:00", "done", 12.5),
      (4L, "insert", "2026-01-01T11:00:00", "open", 40.0)), pk, Seq(spec))
    check(wh, "after group-moving update")
    assert(maintained(wh)("done")._1 == 2L)

    // delete removes pk 2's contribution; group 'open' shrinks to 1
    AggMaintainer.foldAndMaintain(spark, wh, "t", batchDf(
      (2L, "delete", "2026-01-01T12:00:00", null, 0.0)), pk, Seq(spec))
    check(wh, "after delete")
    assert(maintained(wh)("open")._1 == 1L)

    // a group whose last member leaves disappears from the store
    AggMaintainer.foldAndMaintain(spark, wh, "t", batchDf(
      (4L, "delete", "2026-01-01T13:00:00", null, 0.0)), pk, Seq(spec))
    check(wh, "after emptying a group")
    assert(!maintained(wh).contains("open"))
  }

  test("replayed micro-batch applies a zero delta (idempotent with the fold)") {
    val wh = "file:" + tmpDir("aggm-replay")
    val b1 = batchDf(
      (1L, "insert", "2026-01-01T10:00:00", "open", 10.0),
      (2L, "insert", "2026-01-01T10:00:00", "done", 20.0))
    val b2 = batchDf((1L, "update", "2026-01-01T11:00:00", "open", 15.0))
    AggMaintainer.foldAndMaintain(spark, wh, "t", b1, pk, Seq(spec))
    AggMaintainer.foldAndMaintain(spark, wh, "t", b2, pk, Seq(spec))
    val before = maintained(wh)
    // at-least-once delivery: the same batch arrives again
    AggMaintainer.foldAndMaintain(spark, wh, "t", b2, pk, Seq(spec))
    assert(maintained(wh) == before)
    check(wh, "after replay")
  }

  test("rebuild equals the incrementally-maintained table") {
    val wh = "file:" + tmpDir("aggm-rebuild")
    AggMaintainer.foldAndMaintain(spark, wh, "t", batchDf(
      (1L to 30L).map(i =>
        (i, "insert", "2026-01-01T10:00:00", if (i % 3 == 0) "a" else "b",
          i.toDouble)): _*), pk, Seq(spec))
    AggMaintainer.foldAndMaintain(spark, wh, "t", batchDf(
      (5L, "delete", "2026-01-01T11:00:00", null, 0.0),
      (6L, "update", "2026-01-01T11:00:00", "a", 66.0)), pk, Seq(spec))
    val incremental = maintained(wh)
    AggMaintainer.rebuild(spark, wh, "t", spec)
    assert(maintained(wh) == incremental)
  }

  test("late data: an older-timestamped batch after a newer one applies no stale delta") {
    val wh = "file:" + tmpDir("aggm-late")
    // the NEWER event arrives first: pk 1 moves to done at t=12:00
    AggMaintainer.foldAndMaintain(spark, wh, "t", batchDf(
      (1L, "insert", "2026-01-01T10:00:00", "open", 10.0),
      (2L, "insert", "2026-01-01T10:00:00", "open", 20.0)), pk, Seq(spec))
    AggMaintainer.foldAndMaintain(spark, wh, "t", batchDf(
      (1L, "update", "2026-01-01T12:00:00", "done", 99.0)), pk, Seq(spec))
    val settled = maintained(wh)

    // the LATE batch (t=11:00 < 12:00) tries to move pk 1 back and
    // change its amount: the fold keeps the newer version, so pre == post
    // and the aggregate must not move — neither group counts nor sums
    AggMaintainer.foldAndMaintain(spark, wh, "t", batchDf(
      (1L, "update", "2026-01-01T11:00:00", "open", 1000.0)), pk, Seq(spec))
    assert(maintained(wh) == settled, "stale event must apply a zero delta")
    check(wh, "after late event")

    // a late DELETE below the settled version must not remove the key
    AggMaintainer.foldAndMaintain(spark, wh, "t", batchDf(
      (1L, "delete", "2026-01-01T11:30:00", null, 0.0)), pk, Seq(spec))
    assert(maintained(wh) == settled, "stale delete must apply a zero delta")
    check(wh, "after late delete")
  }

  test("shuffled batch order converges: store equals rebuild and in-order delivery") {
    val batches = Seq(
      batchDf(
        (1L, "insert", "2026-01-01T10:00:00", "open", 10.0),
        (2L, "insert", "2026-01-01T10:00:00", "done", 20.0),
        (3L, "insert", "2026-01-01T10:00:00", "open", 30.0)),
      batchDf(
        (1L, "update", "2026-01-01T11:00:00", "done", 11.0),
        (3L, "delete", "2026-01-01T11:00:00", null, 0.0)),
      batchDf(
        (2L, "update", "2026-01-01T12:00:00", "open", 22.0),
        (4L, "insert", "2026-01-01T12:00:00", "done", 40.0)))

    def deliver(order: Seq[Int]): Map[String, (Long, java.math.BigDecimal)] = {
      val wh = "file:" + tmpDir(s"aggm-order-${order.mkString}")
      order.foreach(i =>
        AggMaintainer.foldAndMaintain(spark, wh, "t", batches(i), pk, Seq(spec)))
      check(wh, s"delivery order $order")                 // == recompute
      val incremental = maintained(wh)
      AggMaintainer.rebuild(spark, wh, "t", spec)
      assert(maintained(wh) == incremental, s"rebuild diverged for order $order")
      incremental
    }

    val inOrder = deliver(Seq(0, 1, 2))
    assert(deliver(Seq(2, 0, 1)) == inOrder)
    assert(deliver(Seq(1, 2, 0)) == inOrder)
  }

  test("NULL group keys match themselves across batches (null-safe delta/merge)") {
    val wh = "file:" + tmpDir("aggm-null")
    // batch 1 creates a NULL-category group; batch 2 touches it again
    // (update of a pk staying in the null group) — an equi-join delta
    // would fail to match null-vs-null and emit duplicate group rows
    AggMaintainer.foldAndMaintain(spark, wh, "t", batchDf(
      (1L, "insert", "2026-01-01T10:00:00", null, 10.0),
      (2L, "insert", "2026-01-01T10:00:00", null, 20.0)), pk, Seq(spec))
    AggMaintainer.foldAndMaintain(spark, wh, "t", batchDf(
      (1L, "update", "2026-01-01T11:00:00", null, 15.0)), pk, Seq(spec))
    val rows = AggMaintainer.read(spark, wh, "t", "by_status")
      .select("status", "n_rows", "sum_amount")
      .as[(String, Long, java.math.BigDecimal)].collect().toSeq
    assert(rows.size == 1, s"null group must stay ONE row, got $rows")
    assert(rows.head._2 == 2L)
    assert(rows.head._3 == new java.math.BigDecimal("35.00000000"))
    check(wh, "null group")
  }

  test("multiple aggregate specs maintain independently") {
    val wh = "file:" + tmpDir("aggm-multi")
    val global = AggSpec("global", Seq.empty, Seq("amount"))
    // a grouping by a COMPOSITE key incl. the pk side column
    AggMaintainer.foldAndMaintain(spark, wh, "t", batchDf(
      (1L, "insert", "2026-01-01T10:00:00", "open", 10.0),
      (2L, "insert", "2026-01-01T10:00:00", "done", 20.0)),
      pk, Seq(spec, global))
    AggMaintainer.foldAndMaintain(spark, wh, "t", batchDf(
      (2L, "delete", "2026-01-01T11:00:00", null, 0.0)),
      pk, Seq(spec, global))
    check(wh, "by_status after two batches")
    val g = AggMaintainer.read(spark, wh, "t", "global")
      .select("n_rows", "sum_amount")
      .as[(Long, java.math.BigDecimal)].collect().toSeq
    assert(g.map(_._1) == Seq(1L))
    assert(g.head._2 == new java.math.BigDecimal("10.00000000"))
  }
}

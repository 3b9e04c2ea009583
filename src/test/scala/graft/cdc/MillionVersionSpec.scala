package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** BASELINE.md §2: snapshot/asOf over a ~1M-version changelog must
  * complete via a single window pass (no shuffle explosion). */
class MillionVersionSpec extends SparkTestBase {

  test("latestSnapshot over 1.1M versions: one window pass, correct count") {
    val base = Changelog.fromOrders(spark, "/root/testdata/sf0.1") // ~221k versions
    val big = (0 until 5).map(i =>
      base.withColumn("pk", col("pk") + lit(i.toLong * 10000000L)))
      .reduce(_ unionAll _)

    val snap = Versioned.latestSnapshot(big, Seq("pk"))
    val plan = snap.queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"), "rank pushdown must apply")
    // exactly ONE exchange between scan and filter (the pk hash partition)
    assert("Exchange hashpartitioning\\(pk".r.findAllIn(plan).length == 1, plan)

    val t0 = System.nanoTime()
    val n = snap.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val baseN = Versioned.latestSnapshot(base, Seq("pk")).count()
    assert(n == baseN * 5, s"expected ${baseN * 5}, got $n")
    info(f"1.1M-version snapshot in $secs%.2f s (local[4])")
    assert(secs < 60.0)
  }
}

package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Dynamic partition pruning over the engine's partitioned layouts.
  *
  * A dt-partitioned fact joined to a filtered dimension must prune fact
  * PARTITIONS at runtime from the dimension's build side — the plan
  * carries a `dynamicpruning` partition filter instead of scanning every
  * directory. This is the mechanism that makes "join the last week of a
  * 3-year fact table" read 7/1000 partitions at 100 TB; the spec pins
  * that our layout (plain dt= directories, the same shape
  * PartitionedIngest and VersionedSql registrations produce) triggers
  * it with default session settings.
  */
class DppSpec extends SparkTestBase {
  import spark.implicits._

  test("dt-partitioned fact prunes partitions from the dim filter at runtime") {
    val dir = tmpDir("graft-dpp")
    (0 until 20).flatMap { day =>
      (0 until 50).map(i => (f"2024-01-${day + 1}%02d", day * 50L + i, i * 1.5))
    }.toDF("dt", "k", "v")
      .write.partitionBy("dt").mode("overwrite").parquet(dir)

    // the dim must live on storage too: an in-memory LocalRelation gets
    // its filter constant-folded away, leaving no selective predicate
    // for the DPP rule to latch onto
    val dimDir = tmpDir("graft-dpp-dim")
    (0 until 20).map(day => (f"2024-01-${day + 1}%02d", day % 5))
      .toDF("dt", "tier").write.mode("overwrite").parquet(dimDir)

    val fact = spark.read.parquet(dir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim, fact("dt") === dim("dt").cast("date"))
      .filter(col("tier") === 0)
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sk"))

    val plan = joined.queryExecution.executedPlan.toString()
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic partition-pruning filter on the fact scan:\n$plan")

    // correctness of the pruned read: tier 0 = days 1, 6, 11, 16
    val r = joined.as[(Long, Long)].head()
    val expectDays = Seq(0, 5, 10, 15)
    assert(r._1 == expectDays.size * 50L)
    assert(r._2 == expectDays.map(d => (0 until 50).map(i => d * 50L + i).sum).sum)
  }
}

package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers.
  *
  * AQE handles skewed JOIN partitions (split-and-replicate) at runtime,
  * but a skewed AGGREGATION key still lands every row of the hot key in
  * one reducer when the aggregate can't partially collapse map-side —
  * COUNT(DISTINCT v) is the canonical case. These helpers implement the
  * standard two-phase salted shapes.
  */
object Skew {

  /** Exact COUNT(DISTINCT valueCol) per key, skew-safe.
    *
    * Phase 1 groups by (key, hash(value) % buckets) — the hot key's
    * distinct set spreads over `buckets` reducers; phase 2 sums the
    * per-bucket distinct counts (buckets partition the value space, so
    * the sum is exact). Shuffle volume is the same; the hot key's WORK
    * is `buckets`-way parallel instead of single-reducer. */
  def saltedCountDistinct(df: DataFrame, keyCols: Seq[String], valueCol: String,
                          buckets: Int = 32): DataFrame = {
    require(buckets > 0)
    val perBucket = df
      .withColumn("_vbucket", pmod(hash(col(valueCol)), lit(buckets)))
      .groupBy((keyCols.map(col) :+ col("_vbucket")): _*)
      .agg(countDistinct(col(valueCol)).as("_partial"))
    perBucket
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_partial")).cast("long").as("n_distinct"))
  }

  /** Salted heavy-hitter aggregation for arbitrary partially-aggregable
    * expressions: adds a deterministic row-derived salt so the hot key's
    * partials spread, then re-aggregates. Use when a downstream stage
    * (e.g. a window) forces all rows of a key together; for plain
    * sum/count Spark's map-side partial aggregation already does this. */
  def withSalt(df: DataFrame, saltBuckets: Int, on: Column): DataFrame =
    df.withColumn("_salt", pmod(hash(on), lit(saltBuckets)))
}

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
  /** LSH self-join skew guard: drop bucket groups larger than `cap`.
    *
    * A degenerate bucket (e.g. thousands of byte-identical or empty-
    * shingle documents hashing to one (band, bucket)) makes the bucket
    * self-join quadratic IN THAT BUCKET — the one shape that can sink an
    * otherwise-linear LSH pass at 100× skew. An over-cap bucket carries
    * almost no discriminative signal for NEAR-duplicate detection (true
    * near-dup pairs co-occur in several independent buckets; exact
    * duplicates belong in the cheap hash-dedup pass that precedes LSH),
    * so dropping it bounds the worst case at cap² per bucket while
    * leaving normal buckets untouched. cap <= 0 disables the guard. */
  def capGroupSize(df: DataFrame, groupCols: Seq[String], cap: Int): DataFrame =
    if (cap <= 0) df
    else {
      val counts = df.groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("__group_n"))
        .filter(col("__group_n") <= cap)
        .drop("__group_n")
      // partial counts collapse map-side; the filter join shares the
      // self-join's key partitioning, so no extra exchange of `df`.
      // Re-select in the caller's column ORDER: a using-join moves key
      // columns first, which would silently break positional toDF renames
      df.join(counts, groupCols).select(df.columns.map(col).toIndexedSeq: _*)
    }

}

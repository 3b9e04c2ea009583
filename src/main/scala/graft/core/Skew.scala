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

  /** Skew-proof equi-join: salt the (skewed) left side with a
    * deterministic row-derived bucket, replicate every right row across
    * all `salt` buckets, and join on `keys :+ salt` — a hot key's rows
    * spread over `salt` reducers instead of one. Results are identical
    * to `left.join(right, keys, "inner")`: each left row meets each
    * matching right row in exactly one bucket.
    *
    * Reach for this only where AQE's skew-join split can't: AQE splits
    * oversized SORT-MERGE partitions at runtime, but a shuffled HASH
    * join, a stream-static join, or a key so hot it skews the map side
    * of a single stage still funnel into one task. Cost: the right side
    * shuffles `salt`× (so keep it the small side), and `saltOn` must be
    * non-null per row (any stable row-unique column works). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltOn: Column, salt: Int = 16): DataFrame = {
    require(salt > 0)
    val l = left.withColumn("__salt",
      pmod(xxhash64(saltOn), lit(salt.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
  /** LSH self-join skew guard: drop bucket groups larger than `cap`.
    *
    * A degenerate bucket (e.g. thousands of byte-identical or empty-
    * shingle documents hashing to one (band, bucket)) makes the bucket
    * self-join quadratic IN THAT BUCKET — the one shape that can sink an
    * otherwise-linear LSH pass at 100× skew. An over-cap bucket carries
    * almost no discriminative signal for NEAR-duplicate detection (true
    * near-dup pairs co-occur in several independent buckets; exact
    * duplicates belong in the cheap hash-dedup pass that precedes LSH —
    * [[graft.ext.Dedup.dedupCorpus]] runs that pass), so dropping it
    * bounds the worst case at cap² per bucket while leaving normal
    * buckets untouched. cap <= 0 disables the guard.
    *
    * Dropping is never silent: use [[capGroupSizeAccounted]] to get the
    * dropped groups as a side-channel frame; this overload logs them. */
  def capGroupSize(df: DataFrame, groupCols: Seq[String], cap: Int): DataFrame =
    capGroupSizeAccounted(df, groupCols, cap)._1

  /** [[capGroupSize]] returning (kept rows, dropped groups).
    *
    * EAGER: calling this runs Spark jobs at DataFrame-CONSTRUCTION time —
    * one counting pass over `df` (the localCheckpoint below) plus one
    * tiny aggregate over the checkpointed over-cap groups. An unpersisted
    * `df` is therefore computed once for the accounting pass and again by
    * whatever consumes the kept frame; all current call sites persist
    * their input first, and new callers should too.
    *
    * The dropped-groups frame `(groupCols*, __group_n)` is MATERIALIZED
    * (eager localCheckpoint of the over-cap aggregate — tiny: one row per
    * hot bucket, and hot buckets are the anomaly the cap exists for), so
    * the keep-filter becomes a BROADCAST anti join — no shuffle of `df`
    * at all, where a kept-groups inner join would shuffle the full frame. */
  def capGroupSizeAccounted(df: DataFrame, groupCols: Seq[String],
                            cap: Int): (DataFrame, DataFrame) =
    if (cap <= 0) (df, df.limit(0).groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__group_n")))
    else {
      val over = df.groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("__group_n"))
        .filter(col("__group_n") > cap)
        .localCheckpoint(true)
      // one action for both accounting numbers (sum of rows, group count)
      val acct = over.agg(coalesce(sum("__group_n"), lit(0L)), count(lit(1))).first()
      val (dropped, nGroups) = (acct.getLong(0), acct.getLong(1))
      if (dropped > 0)
        org.apache.log4j.Logger.getLogger(getClass)
          .warn(s"capGroupSize: dropping $dropped rows in $nGroups " +
            s"over-cap group(s) on (${groupCols.mkString(", ")}), cap=$cap")
      // Re-select the CALLER's column order: even a left_anti using-join
      // moves key columns first, which silently breaks positional toDF
      // renames downstream (regression caught in round 2)
      val kept =
        if (dropped == 0) df
        else df.join(broadcast(over.select(groupCols.map(col): _*)),
          groupCols, "left_anti").select(df.columns.map(col).toIndexedSeq: _*)
      (kept, over)
    }

}

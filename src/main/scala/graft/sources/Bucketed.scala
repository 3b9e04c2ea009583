package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Hive-style bucketed tables — the CO-LOCATED JOIN layout for the
  * joins a 100 TB deployment runs repeatedly on the same key (fact ⋈
  * dimension-history, corpus ⋈ signature table, snapshot ⋈ changelog):
  * both sides are written pre-hash-partitioned into `nBuckets` files
  * per table on the join key, so every later equi-join on that key
  * reads matching buckets side by side and the plan contains NO
  * Exchange at all — the shuffle is paid ONCE at write time and
  * amortized over every subsequent join, instead of re-paid per query.
  * With `sortCols` the bucket files are also pre-sorted, so a
  * sort-merge join can skip its sorts too (one file per bucket).
  *
  * This is the persistent-table complement of the in-query discipline
  * used everywhere else in the engine (broadcast small sides,
  * repartition-by-key reuse): those optimize a single plan, bucketing
  * optimizes a WORKLOAD. `spark.sql.sources.bucketing.enabled` (default
  * true) must be on, bucket counts on both sides must match (or divide
  * evenly under `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  *
  * Bucketed layouts require the session catalog (`saveAsTable`) — a
  * path-written parquet dir drops the bucket metadata.
  */
object Bucketed {

  /** Write `df` as a bucketed catalog table (overwrite). The write
    * itself shuffles by `keyCol` into `nBuckets` output tasks — that is
    * the one-time cost every later co-located join avoids. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets >= 1)
    val base = df
      // one file per bucket: required for the sorted-bucket fast path
      // (many files per bucket forces a per-join sort even when sortBy
      // matches) and the layout a compacted table would have anyway
      .repartition(nBuckets, df(keyCol))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, keyCol)
    val w = sortCols match {
      case Nil => base
      case h +: t => base.sortBy(h, t: _*)
    }
    w.saveAsTable(table)
  }

  /** Equi-join of two tables bucketed on `key` with matching bucket
    * counts: neither side shuffles — the scan's bucket layout satisfies
    * the join's required distribution directly. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}

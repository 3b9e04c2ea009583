package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed warehouse layout: co-located, shuffle-free key joins.
  *
  * At 100 TB the dominant cost of a fact-to-fact join is the shuffle of
  * both sides by the join key. Writing the tables bucketed by that key
  * (same bucket count both sides) bakes the hash distribution into the
  * STORAGE layout: the bucketed scan reports it to the planner, and a
  * SortMergeJoin consumes both scans with ZERO Exchange — the join cost
  * collapses to a per-bucket local sort (or nothing, if `sortCols`
  * pre-sorted the buckets by the key at write time). The same layout
  * serves every subsequent key-join and key-aggregation for free, which
  * is why a CDC warehouse's versioned tables and their hot snapshot
  * belong in pk buckets (the reference's BigQuery tables get the
  * equivalent via clustering — `README.md` consumer queries are all
  * pk-scoped).
  *
  * BucketingSpec pins the zero-Exchange plan; `buckets` should be sized
  * so one bucket ≈ a task's worth of data at the deployment's scale
  * (the same sizing rule as [[graft.cdc.SnapshotMaintainer]]).
  */
object Bucketing {

  /** Write `df` as a catalog parquet table bucketed (and optionally
    * per-bucket sorted) by the given columns. */
  def writeBucketed(df: DataFrame, table: String,
                    bucketCols: Seq[String], buckets: Int,
                    sortCols: Seq[String] = Nil,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty && buckets > 0)
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}

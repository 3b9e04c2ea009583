package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained "current state" tables.
  *
  * The append-only versioned table answers `latestSnapshot` by windowing
  * the FULL history — correct, but O(history) per query. For tables whose
  * primary key is known, this maintainer folds each micro-batch into a
  * materialized snapshot: read current snapshot ∪ new batch rows → one
  * window pass over (|snapshot| + |batch|) rows → atomic directory swap.
  * Point-in-time (`asOf`) queries still go to the versioned history; the
  * snapshot serves the hot "current state" path.
  *
  * Idempotent under batch replay: re-folding rows the snapshot already
  * reflects reproduces the identical snapshot (last-writer-wins is a
  * fold; duplicates collapse in the rank-1 window).
  */
object SnapshotMaintainer {

  def snapshotDir(warehouseDir: String, table: String): String =
    s"$warehouseDir/_snapshot/$table"

  /** Fold one projected table batch into the maintained snapshot.
    * `batch` must carry pk ++ (versionCol) ++ payload columns —
    * exactly what `Envelope.project` emits. */
  def update(spark: SparkSession, warehouseDir: String, table: String,
             batch: DataFrame, pk: Seq[String],
             versionCol: String = "update_date",
             actionCol: String = "action"): Unit = {
    val dir = snapshotDir(warehouseDir, table)
    val tsBatch = batch.withColumn("__v", col(versionCol).cast("timestamp"))
    val current =
      if (new java.io.File(dir).exists())
        Some(spark.read.parquet(dir).withColumn("__v", col(versionCol).cast("timestamp")))
      else None

    // keep tombstones IN the snapshot state (a delete must shadow older
    // versions that a later batch replay could otherwise resurrect);
    // readers filter them out via read()
    val folded = Versioned.latestSnapshotWithTombstones(
      current.map(_.unionByName(tsBatch)).getOrElse(tsBatch),
      pk, "__v", actionCol).drop("__v")

    val tmp = s"$dir.__tmp"
    folded.write.mode("overwrite").parquet(tmp)
    val target = new java.io.File(dir)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    if (target.exists()) rmrf(target)
    target.getParentFile.mkdirs()
    require(new java.io.File(tmp).renameTo(target), s"snapshot swap failed for $dir")
  }

  /** Read the maintained current-state table (tombstones filtered). */
  def read(spark: SparkSession, warehouseDir: String, table: String,
           actionCol: String = "action"): DataFrame =
    spark.read.parquet(snapshotDir(warehouseDir, table))
      .filter(col(actionCol) =!= Versioned.DeleteAction)
}

package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The shared bucket-partitioned store protocol behind every
  * incrementally-maintained table ([[SnapshotMaintainer]],
  * [[Scd2Maintainer]], [[graft.streaming.DedupStream]]): a store laid
  * out as `<dir>/__bucket=<n>/`, where a fold reads ONLY the buckets a
  * batch touches, re-derives their contents, stages the result, and
  * swaps each touched bucket individually — untouched buckets' files
  * are never listed, read, or rewritten, so per-trigger cost is
  * O(touched + batch) regardless of store size.
  *
  * All directory manipulation goes through the Hadoop FileSystem API
  * (file:/, HDFS, object stores alike), and any fix to the protocol —
  * the staging layout, the swap ordering, rename failure handling —
  * lands HERE once instead of in every maintainer. */
object BucketStore {

  val BucketCol = "__bucket"

  /** The distinct bucket ids a keyed batch touches — ≤ the bucket
    * count by construction, so the collect is driver-bounded. `keyed`
    * must carry an Int [[BucketCol]]. */
  def touchedBuckets(keyed: DataFrame): Seq[Int] =
    keyed.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq

  /** Current contents of the touched buckets, if the store has any —
    * read through `basePath` so [[BucketCol]] comes back as a column. */
  def readTouched(spark: SparkSession, dir: String,
                  touched: Seq[Int]): Option[DataFrame] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) None
    else {
      val dirs = touched.map(b => s"$dir/$BucketCol=$b")
        .filter(p => fs.exists(new Path(p)))
      if (dirs.isEmpty) None
      else Some(spark.read.option("basePath", dir).parquet(dirs.toIndexedSeq: _*))
    }
  }

  /** Stage `folded` (which must carry [[BucketCol]]) and swap ONLY the
    * `touched` buckets into the store. The pre-write repartition on the
    * bucket column is load-bearing: partitionBy writes one file per
    * (task × bucket-value) pair, so writing straight out of the fold's
    * shuffle creates up to tasks×buckets tiny files per trigger — and
    * the NEXT trigger's touched-bucket read pays for all of them;
    * clustering by bucket first bounds the layout at one file per
    * touched bucket. */
  def stageAndSwap(spark: SparkSession, dir: String, folded: DataFrame,
                   touched: Seq[Int]): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(s"$dir/.__fold_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    folded.repartition(col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(tmp.toString)
    touched.foreach { b =>
      val src = new Path(tmp, s"$BucketCol=$b")
      val dst = new Path(root, s"$BucketCol=$b")
      if (fs.exists(src)) {
        if (fs.exists(dst)) fs.delete(dst, true)
        require(fs.rename(src, dst), s"bucket swap failed: $dst")
      }
    }
    fs.delete(tmp, true)
  }
}

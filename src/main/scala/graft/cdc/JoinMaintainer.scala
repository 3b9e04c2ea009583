package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained equi-JOIN view over two maintained
  * current-state snapshots — the join sibling of [[AggMaintainer]]
  * (which maintains GROUP BYs). The reference's consumers join users ⋈
  * products on every refresh: O(|A| + |B|) per query. This maintainer
  * keeps `snapshot(A) ⋈ snapshot(B) ON A.jk = B.jk` continuously
  * up to date for O(|batch| + touched-jk buckets) per micro-batch.
  *
  * Layout: each side keeps a LIVE-ROW STORE hash-bucketed by the JOIN
  * key (`__jbucket = pmod(hash(jk), buckets)`), and the view itself is
  * bucketed the same way. Because both side stores and the view share
  * one bucketing, a view bucket is exactly the join of the two
  * same-numbered side buckets — the maintenance join is BUCKET-LOCAL
  * (the storage layout is the shuffle, paid once per row change; the
  * same argument as `core.Bucketing`, applied to view maintenance).
  *
  * Per micro-batch and side:
  *  1. read the PRE-fold live rows of the batch's pks from the side's
  *     main pk-bucketed snapshot (bounded — only their pk buckets are
  *     listed): these carry the OLD join-key values, which is what
  *     makes a jk-changing UPDATE leave no stale row behind;
  *  2. fold the batch into the main snapshot (delegated to
  *     [[SnapshotMaintainer.update]] — the maintainer composes with,
  *     never replaces, the snapshot discipline);
  *  3. read the POST-fold rows of the same pks (new jk values);
  *  4. touched jk buckets = hash(old ∪ new jk); rebuild each touched
  *     side-store bucket as (current rows minus the batch's pks) ∪ the
  *     batch pks' post-fold live rows;
  *  5. re-join the touched bucket pairs and swap the view buckets
  *     (staged `_tmp` + per-bucket rename; a bucket whose join went
  *     empty is deleted, not left stale).
  *
  * Replay: a re-delivered batch folds idempotently, so pre == post,
  * every side-store bucket rebuild reproduces itself, and the view is
  * unchanged. Crash between fold and view swap leaves the view stale
  * for the touched keys only — [[rebuild]] from the snapshots is the
  * bounded recovery, the same non-transactional caveat as
  * [[AggMaintainer]]. The maintained view equals the from-scratch join
  * row-for-row ([[rebuild]] IS the spec's equality oracle).
  */
object JoinMaintainer {

  val DefaultBuckets = 64
  private val BucketCol = "__jbucket"

  def sideDir(warehouseDir: String, view: String, side: String): String =
    s"$warehouseDir/_join/$view/side_$side"
  def viewDir(warehouseDir: String, view: String): String =
    s"$warehouseDir/_join/$view/view"

  /** One maintained side: the main snapshot `table` it reads through,
    * its primary key, and the projected batch for this trigger (None =
    * no changes on this side this trigger). */
  final case class Side(table: String, pk: Seq[String],
                        batch: Option[DataFrame])

  def foldAndMaintain(spark: SparkSession, warehouseDir: String, view: String,
                      jk: String, a: Side, b: Side,
                      versionCol: String = "update_date",
                      actionCol: String = "action",
                      snapshotBuckets: Int = SnapshotMaintainer.DefaultBuckets,
                      joinBuckets: Int = DefaultBuckets): Unit = {
    require(joinBuckets > 0)
    val fs = new Path(warehouseDir)
      .getFileSystem(spark.sessionState.newHadoopConf())

    // fold each side and collect (postRowsOfBatchPks, batchPkFrame,
    // touched jk bucket ids)
    def foldSide(s: Side): (Option[(DataFrame, DataFrame)], Array[Int]) =
      s.batch match {
        case None => (None, Array.empty[Int])
        case Some(batch) =>
          val keys = batch.select(s.pk.map(col): _*).distinct()
            .localCheckpoint(true)
          val empty = batch.limit(0)
          val pre = liveRowsForKeys(spark, warehouseDir, s.table, keys, empty,
              s.pk, actionCol, snapshotBuckets)
            .localCheckpoint(true) // materialize BEFORE the fold overwrites
          SnapshotMaintainer.update(spark, warehouseDir, s.table, batch,
            s.pk, versionCol, actionCol, snapshotBuckets)
          val post = liveRowsForKeys(spark, warehouseDir, s.table, keys, empty,
              s.pk, actionCol, snapshotBuckets)
            .localCheckpoint(true)
          val touched = pre.select(col(jk)).unionByName(post.select(col(jk)))
            .select(pmod(hash(col(jk)), lit(joinBuckets)).as("__tb"))
            .distinct().collect().map(_.getInt(0)) // ≤ joinBuckets values
          (Some((post, keys)), touched)
      }

    // the two sides fold CONCURRENTLY (guide §2.6): different tables,
    // disjoint snapshot-store dirs, results communicated only by return
    // value — each side's chain of small vocabulary/bucket-sized jobs
    // back-fills the cores the other leaves idle. A self-join view
    // (both sides the same table) folds the same store twice, so it
    // stays sequential.
    val ((foldedA, touchedA), (foldedB, touchedB)) =
      if (a.table == b.table) (foldSide(a), foldSide(b))
      else graft.core.Par.both(foldSide(a), foldSide(b))
    val touched = (touchedA ++ touchedB).distinct.sorted
    if (touched.isEmpty) return

    // rebuild a side's touched store buckets: current minus batch pks,
    // plus the batch pks' post-fold live rows
    def rebuildSide(sideName: String, s: Side,
                    folded: Option[(DataFrame, DataFrame)]): Unit = {
      val dir = sideDir(warehouseDir, view, sideName)
      val current = readBuckets(spark, dir, touched)
      val kept = (current, folded) match {
        case (_, None) => return // this side unchanged: buckets stand
        case (cur, Some((post, keys))) =>
          val fresh = post
            .withColumn(BucketCol, pmod(hash(col(jk)), lit(joinBuckets)))
          val base = cur match {
            case None      => fresh.limit(0)
            case Some(c)   => c.join(keys, s.pk, "left_anti")
          }
          base.unionByName(fresh)
      }
      swapBuckets(spark, fs, dir, kept, touched)
    }
    // side dirs are disjoint ("a"/"b" under the view dir) and both read
    // the already-computed `touched` array: same §2.6 overlap as the
    // folds (same-table views stay sequential for the same reason)
    if (a.table == b.table) {
      rebuildSide("a", a, foldedA)
      rebuildSide("b", b, foldedB)
    } else
      graft.core.Par.both(
        rebuildSide("a", a, foldedA), rebuildSide("b", b, foldedB)): Unit

    // re-join the touched bucket pairs — bucket-local by construction
    val av = readBuckets(spark, sideDir(warehouseDir, view, "a"), touched)
    val bv = readBuckets(spark, sideDir(warehouseDir, view, "b"), touched)
    val joined = (av, bv) match {
      case (Some(l), Some(r)) => Some(joinSides(l, r, jk))
      case _                  => None // one side still empty ⇒ empty view
    }
    joined match {
      case Some(j) => swapBuckets(spark, fs, viewDir(warehouseDir, view),
        j, touched)
      case None => touched.foreach { bk =>
        val dst = new Path(s"${viewDir(warehouseDir, view)}/$BucketCol=$bk")
        if (fs.exists(dst)) fs.delete(dst, true)
      }
    }
  }

  /** The maintained view (a_/b_-prefixed payloads around the join key). */
  def read(spark: SparkSession, warehouseDir: String, view: String): DataFrame =
    spark.read.parquet(viewDir(warehouseDir, view)).drop(BucketCol)

  /** From-scratch join of the current snapshots — crash recovery and
    * the specs' equality oracle. */
  def rebuild(spark: SparkSession, warehouseDir: String, view: String,
              jk: String, a: Side, b: Side): DataFrame = {
    def live(s: Side) = SnapshotMaintainer.read(spark, warehouseDir, s.table)
    joinSides(live(a).withColumn(BucketCol, lit(0)),
        live(b).withColumn(BucketCol, lit(0)), jk)
      .drop(BucketCol)
  }

  private def joinSides(l: DataFrame, r: DataFrame, jk: String): DataFrame = {
    def prefixed(df: DataFrame, p: String) =
      df.columns.foldLeft(df) { (d, c) =>
        if (c == jk || c == BucketCol) d else d.withColumnRenamed(c, s"${p}_$c")
      }
    prefixed(l, "a").join(prefixed(r, "b").drop(BucketCol), jk)
  }

  private def readBuckets(spark: SparkSession, dir: String,
                          touched: Array[Int]): Option[DataFrame] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return None
    val dirs = touched.map(bk => s"$dir/$BucketCol=$bk")
      .filter(p => fs.exists(new Path(p)))
    if (dirs.isEmpty) None
    else Some(spark.read.option("basePath", dir).parquet(dirs.toIndexedSeq: _*))
  }

  /** Stage `rows` (which must carry [[BucketCol]]) and swap exactly the
    * `touched` buckets — a touched bucket absent from the staged output
    * is DELETED (its content legitimately went empty). */
  private def swapBuckets(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
                          dir: String, rows: DataFrame,
                          touched: Array[Int]): Unit =
    // shared rename-aside protocol; a touched bucket whose join went
    // empty is deleted (the staged fold emitted no rows for it)
    BucketStore.stageAndSwap(spark, dir, rows, touched.toSeq,
      deleteMissingTouched = true, bucketCol = BucketCol)

  /** The LIVE (non-tombstone) snapshot rows of exactly `keys` — the
    * same bounded pk-bucket read as [[AggMaintainer]]'s. */
  private def liveRowsForKeys(spark: SparkSession, warehouseDir: String,
                              table: String, keys: DataFrame, empty: DataFrame,
                              pk: Seq[String], actionCol: String,
                              snapshotBuckets: Int): DataFrame = {
    val dir = SnapshotMaintainer.snapshotDir(warehouseDir, table)
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return empty
    val touched = keys
      .select(pmod(hash(pk.map(col): _*), lit(snapshotBuckets)).as("__b"))
      .distinct().collect().map(_.getInt(0)).sorted
    val dirs = touched.map(bk => s"$dir/__bucket=$bk")
      .filter(p => fs.exists(new Path(p)))
    if (dirs.isEmpty) return empty
    spark.read.option("basePath", dir).parquet(dirs.toIndexedSeq: _*)
      .filter(col(actionCol) =!= Versioned.DeleteAction)
      .join(keys, pk, "left_semi")
  }
}

package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch CDC ingest: parse a directory of (gzipped) JSONL envelope logs,
  * route every record to its registry table, append.
  *
  * This is the Spark restatement of the reference's whole main path
  * (S1–S11, SURVEY.md §2.1) minus its de-optimizations: the registry is a
  * closure constant instead of a per-record fetch, and the write is one
  * columnar append per table per (micro-)batch instead of a fresh pipeline
  * per record (`dataflow-cdc-stream.py:82-94`).
  *
  * Idempotence: each batch writes into `<table>/batch=<id>` with overwrite,
  * so a replayed batch (streaming restart, at-least-once file delivery
  * upstream) lands in the same directory and cannot double-append. Readers
  * just scan `<warehouse>/<table>` and see `batch` as a partition column.
  *
  * Scale posture: routing is N registry-filters over one cached parsed
  * frame — each filter prunes on a low-cardinality `object` column; at
  * 1000-executor scale the parsed frame would additionally be
  * `repartition($"object")`-ed only if per-table output files must be
  * consolidated (a shuffle we avoid by default).
  */
object Ingest {

  val UnknownTableDir = "_dead_letter"

  def readLines(spark: SparkSession, inputDir: String): DataFrame =
    spark.read.text(inputDir) // .gz handled transparently by the text source

  def parse(spark: SparkSession, inputDir: String): DataFrame =
    Envelope.parse(readLines(spark, inputDir))

  /** Route one parsed batch: per registry table an append, unknown objects
    * to the dead letter (reference drops-with-a-log at
    * `dataflow-cdc-stream.py:96-97`; we keep the data instead of stdout).
    */
  def appendBatch(parsed: DataFrame, registry: Map[String, TableSpec],
                  warehouseDir: String, batchId: Long,
                  partitionByDate: Boolean = false): Unit = {
    // the compacted partition holds MERGED history — an idempotent
    // batch overwrite targeting it would replace all of it with one
    // batch's rows; no legitimate caller appends at this id
    require(batchId != CompactedBatchId,
      s"batch id $batchId is reserved for compacted history")
    val cached = parsed.cache()
    try {
      registry.values.foreach { spec =>
        val projected = Envelope.project(cached, spec, withDatePartition = partitionByDate)
        val writer = projected.write.mode("overwrite")
        // event-time date partitioning: asOf/changesBetween prune whole
        // directories before any shuffle at cluster scale
        // physical destination: the registry's `table_name` mapping
        // (reference data-stream.json:3, routed at dataflow-cdc-stream
        // .py:86-88) — logical name is the envelope key, physical the dir
        (if (partitionByDate) writer.partitionBy(Envelope.DtCol) else writer)
          .parquet(s"$warehouseDir/${spec.physicalName}/batch=$batchId")
      }
      val known = registry.keySet.toSeq
      val dead = cached.filter(col("object").isNull || !col("object").isin(known: _*))
      // dead letter keeps the raw line — fully replayable once the
      // registry learns the table
      dead.select(col("object"), col("_raw"))
        .write.mode("overwrite")
        .parquet(s"$warehouseDir/$UnknownTableDir/batch=$batchId")
    } finally cached.unpersist()
  }

  /** One-shot batch ingest of a directory. */
  def ingestDir(spark: SparkSession, inputDir: String,
                registry: Map[String, TableSpec], warehouseDir: String,
                partitionByDate: Boolean = false): Unit =
    appendBatch(parse(spark, inputDir), registry, warehouseDir, batchId = 0L,
      partitionByDate = partitionByDate)

  /** Read back a versioned table written by `appendBatch` by its PHYSICAL
    * (directory) name. Partition columns (`batch`, `_dt`) are dropped
    * unless the caller wants them for pruning (see Versioned.asOfPruned).
    *
    * `mergeSchema` defaults ON: batch dirs written BEFORE a registry
    * schema change carry the narrower schema; the union schema (old rows
    * NULL in new columns) is the CDC warehouse contract. Cost is one
    * footer read per file at planning — acceptable for versioned tables;
    * pass false for hot paths on schema-stable tables. */
  def readTable(spark: SparkSession, warehouseDir: String, physicalName: String,
                keepPartitionCols: Boolean = false,
                mergeSchema: Boolean = true): DataFrame = {
    val df = spark.read.option("mergeSchema", mergeSchema)
      .parquet(s"$warehouseDir/$physicalName")
    if (keepPartitionCols) df else df.drop("batch").drop(Envelope.DtCol)
  }

  /** Table contents as written up to (and including) micro-batch
    * `maxBatchId` — batch-level time travel for replay debugging and
    * incremental consumers. `batch` is a partition column, so the cutoff
    * prunes whole directories at planning time. */
  def readTableAsOfBatch(spark: SparkSession, warehouseDir: String, physicalName: String,
                         maxBatchId: Long): DataFrame =
    readTable(spark, warehouseDir, physicalName, keepPartitionCols = true)
      .filter(col("batch") <= maxBatchId)
      .drop("batch").drop(Envelope.DtCol)

  /** Spec-aware read: resolves the registry's logical→physical mapping. */
  def readTable(spark: SparkSession, warehouseDir: String, spec: TableSpec,
                keepPartitionCols: Boolean): DataFrame =
    readTable(spark, warehouseDir, spec.physicalName, keepPartitionCols)

  def readTable(spark: SparkSession, warehouseDir: String, spec: TableSpec): DataFrame =
    readTable(spark, warehouseDir, spec.physicalName)

  /** Replay dead-lettered records after the registry learned new tables:
    * re-parse the raw lines and append every record whose `object` is now
    * registered (the reference loses these records forever — it only
    * `print`s them, `dataflow-cdc-stream.py:96-97`; keeping the raw line
    * makes "add table to registry, then backfill" a one-call operation).
    * Appends into `batch=<replayBatchId>`; pick an id disjoint from the
    * stream's (e.g. negative) so replays stay idempotent too. */
  def replayDeadLetter(spark: SparkSession, warehouseDir: String,
                       registry: Map[String, TableSpec],
                       replayBatchId: Long = ReplayBatchId): Unit = {
    val dead = spark.read.parquet(s"$warehouseDir/$UnknownTableDir")
      .select(col("_raw").as("value"))
    val parsed = Envelope.parse(dead)
    val nowKnown = registry.keySet.toSeq
    appendBatch(parsed.filter(col("object").isin(nowKnown: _*)),
      registry, warehouseDir, replayBatchId)
  }

  /** Compact a versioned table's accumulated `batch=<id>` micro-batch
    * directories into a single batch=0 layout (small-file mitigation for
    * long-running streams; preserves the `_dt` partitioning if present).
    * Not concurrency-safe with an active writer — run between stream
    * restarts, like any storage maintenance job. */
  /** Reserved batch partition the IN-STREAM compactor merges history
    * into. Negative so it can never collide with a streaming batch id:
    * a replayed batch overwrites its own `batch=<id>` dir, and merging
    * history into a replayable id would let that overwrite destroy
    * other batches' rows (same invariant as DocStream.CompactedBatch). */
  val CompactedBatchId: Long = -1L

  /** Reserved id for [[replayDeadLetter]]'s default write. MUST differ
    * from [[CompactedBatchId]]: a replay writing `batch=-1` would
    * OVERWRITE the compacted partition of every table it routes to,
    * destroying the merged history (and the compacted dead letter).
    * −2 can never collide with a streaming batch id, and the next
    * compaction absorbs it like any other committed batch dir. */
  val ReplayBatchId: Long = -2L

  /** Completion marker + recovery manifest for [[compactBatches]]: written
    * INTO the tmp dir after the parquet write returns, listing the source
    * `batch=` dir names the compacted copy replaces. Underscore-prefixed,
    * so parquet scans ignore it wherever it travels. Its presence is the
    * commit point: tmp-with-manifest holds a complete copy and names
    * exactly what must be deleted before publish. */
  private[graft] val CompactManifest = "_GRAFT_COMPACT_MANIFEST"

  /** Merge every `batch <= upToBatch` directory (including a previous
    * `batch=-1`) into `batch=-1` and delete the merged dirs — the
    * small-file mitigation a long-running stream needs WITHOUT a
    * restart. Safe to call from inside the stream's own foreachBatch
    * (the stream is the only writer, and the checkpoint contract only
    * ever replays the last uncommitted batch, so merging ids strictly
    * below the in-flight one can never race a replay overwrite).
    * Preserves the `_dt` partitioning and the union schema across batch
    * dirs (mergeSchema, the CDC warehouse contract).
    *
    * Crash-safe: the write lands in `.__compact_tmp`, then a manifest of
    * the merged source dirs is committed inside it (the commit point),
    * then sources are deleted BEFORE the tmp→`batch=-1` rename
    * (duplication-free order — no instant has a row in both copies). A
    * crash in any window is healed on the next call by [[recoverCompaction]]:
    * manifest present → the copy is complete, finish the (idempotent)
    * delete+rename; manifest absent → the copy is partial and every
    * source still exists, discard tmp.
    *
    * `transform` rewrites the merged frame inside the SAME crash-safe
    * swap — the hook in-stream retention rides ([[Retention
    * .expireHistory]] is "compaction that also collapses old history").
    * With a transform the rewrite runs even when only one committed dir
    * exists (a transform can change rows; plain compaction of one dir is
    * a no-op). The transform must be deterministic for a given table
    * state: a crash-replayed run re-derives the same output. */
  def compactBatches(spark: SparkSession, warehouseDir: String,
                     physicalName: String, upToBatch: Long,
                     transform: Option[DataFrame => DataFrame] = None): Unit = {
    val dir = s"$warehouseDir/$physicalName"
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/.__compact_tmp")
    recoverCompaction(fs, dir, tmp)
    val mergeDirs = fs.listStatus(root).map(_.getPath).filter { p =>
      p.getName.startsWith("batch=") &&
        scala.util.Try(p.getName.stripPrefix("batch=").toLong)
          .toOption.exists(_ <= upToBatch)
    }
    // a batch dir can hold ZERO data files (e.g. a dead-letter batch with
    // no dead records: the overwrite still creates the dir + _SUCCESS) —
    // schema-less dirs can't be read, but they still fold away: excluded
    // from the merge read, included in the manifest's delete list
    def hasData(p: org.apache.hadoop.fs.Path): Boolean = {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) {
        val n = it.next().getPath.getName
        found = !n.startsWith("_") && !n.startsWith(".")
      }
      found
    }
    val (dataDirs, emptyDirs) = mergeDirs.partition(hasData)
    if (dataDirs.isEmpty) {
      // nothing readable to merge: just drop the empty husks (idempotent,
      // no manifest needed — deleting an empty dir can lose nothing)
      emptyDirs.foreach(p => fs.delete(p, true))
      return
    }
    if (mergeDirs.length <= 1 && transform.isEmpty)
      return // already compact (and no rewrite requested)
    val merged = spark.read.option("basePath", dir).option("mergeSchema", true)
      .parquet(dataDirs.map(_.toString).toIndexedSeq: _*)
    val hasDt = merged.columns.contains(Envelope.DtCol)
    val out = transform.foldLeft(merged.drop("batch"))((df, t) => t(df))
    val writer = out.write.mode("overwrite")
    (if (hasDt) writer.partitionBy(Envelope.DtCol) else writer).parquet(tmp.toString)
    // commit point: manifest names the dirs the tmp copy supersedes;
    // written via create+rename so a torn write can never look committed
    val mtmp = new org.apache.hadoop.fs.Path(tmp, CompactManifest + ".inprogress")
    val os = fs.create(mtmp, true)
    try os.write(mergeDirs.map(_.getName).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    require(fs.rename(mtmp, new org.apache.hadoop.fs.Path(tmp, CompactManifest)),
      s"compact manifest commit failed under $tmp")
    finishCompaction(fs, dir, tmp)
  }

  /** Publish step, idempotent: delete every source dir named in the tmp
    * manifest (including any previous `batch=-1` — so the rename target is
    * clear), rename tmp into `batch=-1`, drop the manifest. Re-runnable
    * from any crash point: deletes of already-deleted dirs are no-ops and
    * the rename happens last. */
  private def finishCompaction(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                               tmp: org.apache.hadoop.fs.Path): Unit = {
    val manifest = new org.apache.hadoop.fs.Path(tmp, CompactManifest)
    val in = fs.open(manifest)
    val names =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    names.foreach(n => fs.delete(new org.apache.hadoop.fs.Path(dir, n), true))
    val dst = new org.apache.hadoop.fs.Path(s"$dir/batch=$CompactedBatchId")
    require(fs.rename(tmp, dst), s"compact rename failed: $dst")
    // cosmetic: scans skip underscore files anyway; a crash before this
    // delete leaves the manifest inside batch=-1, harmless
    fs.delete(new org.apache.hadoop.fs.Path(dst, CompactManifest), false): Unit
  }

  /** Heal a compaction interrupted by a crash (called on entry, and safe
    * to call any time the writer is quiescent). Manifest present → the
    * previous run's copy was complete but unpublished: finish it.
    * Manifest absent → the copy was partial and no source was touched:
    * discard it. Either way the table is consistent afterwards. */
  private[graft] def recoverCompaction(fs: org.apache.hadoop.fs.FileSystem,
                                       dir: String,
                                       tmp: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(tmp)) return
    if (fs.exists(new org.apache.hadoop.fs.Path(tmp, CompactManifest)))
      finishCompaction(fs, dir, tmp)
    else fs.delete(tmp, true): Unit
  }

  def compact(spark: SparkSession, warehouseDir: String, physicalName: String): Long = {
    val dir = s"$warehouseDir/$physicalName"
    val df = spark.read.parquet(dir)
    val hasDt = df.columns.contains(Envelope.DtCol)
    val tmp = s"$dir.__compact_tmp"
    val out = df.drop("batch")
      .withColumn("batch", org.apache.spark.sql.functions.lit(0L))
    val writer = out.write.mode("overwrite")
    (if (hasDt) writer.partitionBy("batch", Envelope.DtCol)
     else writer.partitionBy("batch")).parquet(tmp)
    val n = spark.read.parquet(tmp).count()
    // Hadoop FileSystem, not java.io.File: identical code path on
    // file:/, HDFS, and object stores (rename is the storage layer's
    // contract; a local-only rename breaks exactly on the cluster
    // this table layout is designed for)
    val target = new org.apache.hadoop.fs.Path(dir)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(target, true)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), target),
      s"compact rename failed for $dir")
    n
  }
}

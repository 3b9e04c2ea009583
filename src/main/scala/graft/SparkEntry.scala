package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{Changelog, Versioned}
import graft.queries.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** As-of timestamp for q18 (mid-range of orders' o_orderdate span). */
  private val AsOfTs = "1998-01-01 00:00:00"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_multijoin")(spark, "/root/testdata/sf0.001")

  private def cdcSnapshot(s: SparkSession, d: String): DataFrame =
    Versioned.latestSnapshot(Changelog.fromOrders(s, d), Seq("pk"))
      .select("pk", "action", "update_date", "totalprice", "status")
      .orderBy("pk")

  private def cdcAsOf(s: SparkSession, d: String): DataFrame =
    Versioned.asOf(Changelog.fromOrders(s, d), lit(AsOfTs).cast("timestamp"), Seq("pk"))
      .select("pk", "action", "update_date", "totalprice", "status")
      .orderBy("pk")

  private def cdcScd2(s: SparkSession, d: String): DataFrame =
    Versioned.scd2(Changelog.fromOrders(s, d), Seq("pk"))
      .select("pk", "action", "valid_from", "valid_to", "is_current")
      .orderBy("pk", "valid_from", "action")

  /** q167: the INCREMENTALLY MAINTAINED SCD2 store under the DuckDB
    * gate — the changelog arrives as three out-of-chronological-order
    * folds (updates, then deletes, then the inserts they extend), so
    * every fold performs mid-timeline insertion and interval reclose;
    * the maintained read must still equal the one-shot derivation
    * (q34's oracle, verbatim). Fresh store per sf dir (memoized per JVM). */
  private def scd2StoreBuild(s: SparkSession, d: String): String =
    graft.core.WorkDirs.ensureStore(s"scd2_${Integer.toHexString(d.hashCode)}") { wh =>
      val log = Changelog.fromOrders(s, d)
      Seq("update", "delete", "insert").foreach { a =>
        graft.cdc.Scd2Maintainer.update(s, wh, "orders",
          log.filter(col("action") === a), Seq("pk"), buckets = 16) // sized to the data, q170's note
      }
    }

  private def cdcScd2Maintained(s: SparkSession, d: String): DataFrame = {
    val wh = scd2StoreBuild(s, d)
    graft.cdc.Scd2Maintainer.read(s, wh, "orders")
      .select("pk", "action", "valid_from", "valid_to", "is_current")
      .orderBy("pk", "valid_from", "action")
  }

  /** q170: the INCREMENTALLY MAINTAINED current-state snapshot under
    * the DuckDB gate — the changelog arrives as three folds in
    * adversarial (non-chronological) order: updates first, then the
    * deletes that supersede some of them, then the inserts both extend.
    * The bucket-local argmax fold must be arrival-order-free, so the
    * maintained read equals q17's one-shot `latestSnapshot` (same
    * oracle, verbatim). Fresh store per sf dir (memoized per JVM). */
  private def snapStoreBuild(s: SparkSession, d: String): String =
    graft.core.WorkDirs.ensureStore(s"snap_${Integer.toHexString(d.hashCode)}") { wh =>
      val log = Changelog.fromOrders(s, d)
      // buckets sized to the data (the DefaultBuckets scaladoc's
      // |keys|/1e5 guidance): ~15k keys at sf0.1 wants far fewer than 64
      // bucket dirs per swap — bucket count is a deployment knob, not an
      // algorithm parameter
      Seq("update", "delete", "insert").foreach { a =>
        graft.cdc.SnapshotMaintainer.update(s, wh, "orders",
          log.filter(col("action") === a), Seq("pk"), buckets = 16)
      }
    }

  private def cdcSnapshotMaintained(s: SparkSession, d: String): DataFrame = {
    val wh = snapStoreBuild(s, d)
    graft.cdc.SnapshotMaintainer.read(s, wh, "orders")
      .select("pk", "action", "update_date", "totalprice", "status")
      .orderBy("pk")
  }

  /** q171: the INCREMENTALLY MAINTAINED aggregate view under the DuckDB
    * gate — `AggMaintainer` folds the same three adversarial batches,
    * maintaining per-status live-row counts and totalprice sums as
    * bucket-local deltas (pre/post live-row diffs of only the touched
    * pk-buckets; never a full-table re-aggregation). The maintained
    * table must equal a from-scratch GROUP BY over the final live
    * snapshot — which is exactly what the oracle recomputes from the
    * changelog. */
  private def aggStoreBuild(s: SparkSession, d: String): String =
    graft.core.WorkDirs.ensureStore(s"agg_${Integer.toHexString(d.hashCode)}") { wh =>
      val log = Changelog.fromOrders(s, d)
      val spec = graft.cdc.AggMaintainer.AggSpec("by_status",
        Seq("status"), Seq("totalprice"))
      Seq("update", "delete", "insert").foreach { a =>
        graft.cdc.AggMaintainer.foldAndMaintain(s, wh, "orders",
          log.filter(col("action") === a), Seq("pk"), Seq(spec),
          snapshotBuckets = 16, aggBuckets = 16) // sized to the data, q170's note
      }
    }

  private def cdcAggMaintained(s: SparkSession, d: String): DataFrame = {
    val wh = aggStoreBuild(s, d)
    graft.cdc.AggMaintainer.read(s, wh, "orders", "by_status")
      .select("status", "n_rows", "sum_totalprice")
      .orderBy("status")
  }

  /** q173's side-A changelog: orders with the CUSTOMER KEY in the
    * payload — and the %3 update MOVES the row to custkey+1, so the
    * maintained join view must relocate it across join-key buckets
    * (the stale-row case a naive delta join gets wrong). Same action/
    * timestamp scheme as [[Changelog.fromOrders]]. */
  private def q173OrdersLog(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val o = graft.core.Tables.orders(s, d)
    val dec = DecimalType(18, 2)
    val ins = o.select(col("o_orderkey").as("pk"), lit("insert").as("action"),
      col("o_orderdate").as("update_date"), col("o_custkey").as("custkey"),
      col("o_totalprice").cast(dec).as("totalprice"))
    val upd = o.filter(col("o_orderkey") % 3 === 0).select(
      col("o_orderkey").as("pk"), lit("update").as("action"),
      (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("update_date"),
      (col("o_custkey") + lit(1L)).as("custkey"),
      round(col("o_totalprice").cast(dec) * lit(BigDecimal("1.1")), 2)
        .cast(dec).as("totalprice"))
    val del = o.filter(col("o_orderkey") % 7 === 0).select(
      col("o_orderkey").as("pk"), lit("delete").as("action"),
      (col("o_orderdate") + expr("INTERVAL 2 DAY")).as("update_date"),
      lit(null).cast("long").as("custkey"), lit(null).cast(dec).as("totalprice"))
    ins.unionAll(upd).unionAll(del)
  }

  /** q173's side-B changelog: customers keyed BY the join key, with
    * their own update (+100 acctbal, %5) and delete (%11) streams at
    * fixed deterministic timestamps. */
  private def q173CustLog(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val c = graft.core.Tables.customer(s, d)
    val dec = DecimalType(18, 2)
    val base = lit("1995-01-01 00:00:00").cast("timestamp")
    val ins = c.select(col("c_custkey").as("custkey"), lit("insert").as("action"),
      base.as("update_date"), col("c_acctbal").cast(dec).as("acctbal"),
      col("c_mktsegment").as("mktsegment"))
    val upd = c.filter(col("c_custkey") % 5 === 0).select(
      col("c_custkey").as("custkey"), lit("update").as("action"),
      (base + expr("INTERVAL 1 DAY")).as("update_date"),
      (col("c_acctbal").cast(dec) + lit(BigDecimal("100.00")).cast(dec))
        .cast(dec).as("acctbal"),
      col("c_mktsegment").as("mktsegment"))
    val del = c.filter(col("c_custkey") % 11 === 0).select(
      col("c_custkey").as("custkey"), lit("delete").as("action"),
      (base + expr("INTERVAL 2 DAY")).as("update_date"),
      lit(null).cast(dec).as("acctbal"), lit(null).cast("string").as("mktsegment"))
    ins.unionAll(upd).unionAll(del)
  }

  /** q173: the INCREMENTALLY MAINTAINED equi-join view under the DuckDB
    * gate — completes the maintained-store family (q167 SCD2, q170
    * snapshot, q171 aggregate). Both sides' changelogs fold in
    * adversarial order (updates, deletes, then inserts), the side-A
    * updates CHANGE the join key, and the bucket-local re-join must
    * still equal the from-scratch join of the final live snapshots —
    * which is what the oracle recomputes. */
  private def joinStoreBuild(s: SparkSession, d: String): String =
    graft.core.WorkDirs.ensureStore(s"join_${Integer.toHexString(d.hashCode)}") { wh =>
      val ol = q173OrdersLog(s, d)
      val cl = q173CustLog(s, d)
      Seq("update", "delete", "insert").foreach { a =>
        graft.cdc.JoinMaintainer.foldAndMaintain(s, wh, "ord_cust", "custkey",
          graft.cdc.JoinMaintainer.Side("orders_t", Seq("pk"),
            Some(ol.filter(col("action") === a))),
          graft.cdc.JoinMaintainer.Side("customer_t", Seq("custkey"),
            Some(cl.filter(col("action") === a))),
          snapshotBuckets = 16, joinBuckets = 16) // sized to the data, q170's note
      }
    }

  private def cdcJoinMaintained(s: SparkSession, d: String): DataFrame = {
    val wh = joinStoreBuild(s, d)
    graft.cdc.JoinMaintainer.read(s, wh, "ord_cust")
      .select(col("custkey"), col("a_pk"), col("a_totalprice"),
        col("b_acctbal"), col("b_mktsegment"))
      .orderBy("custkey", "a_pk")
  }

  /** q182–q184: the FULL STREAMING LOOP under the gate. q167/q170/q171
    * drive the maintainers through direct fold calls; these three run
    * the real thing — the changelog rendered back to Datastream
    * envelope JSONL files, consumed by [[graft.streaming.CdcStream]]
    * through a FILE SOURCE with a checkpoint, per-batch registry
    * refresh semantics, the input-listing bound (cleanSource=archive),
    * and snapshot + SCD2 + aggregate maintenance ALL ON — in three
    * adversarially-ordered triggers (updates, then deletes, then the
    * inserts they extend; maxFilesPerTrigger=1 + mtime order pins the
    * batch composition). The stores the stream leaves behind must
    * answer the SAME oracles as the one-shot derivations (q17 / q34 /
    * q171, verbatim): decode → route → append → fold, end to end, is
    * what the gate hashes — any envelope-parse, projection, or
    * fold-sharing bug in the loop itself fails here even though every
    * maintainer passes its direct-call gate. */
  private val streamLoopRegistryJson: String =
    """{"orders": {"table_name": "orders_cdc", "schema": {"fields": [
      |  {"name": "pk", "type": "INT64"},
      |  {"name": "totalprice", "type": "NUMERIC"},
      |  {"name": "status", "type": "STRING"},
      |  {"name": "action", "type": "STRING"},
      |  {"name": "update_date", "type": "TIMESTAMP"}]}}}""".stripMargin

  private def streamLoopBuild(s: SparkSession, d: String): String =
    graft.core.WorkDirs.ensureStore(s"loop_${Integer.toHexString(d.hashCode)}") { wh =>
      val in = s"$wh/_in"
      new java.io.File(in).mkdirs(): Unit
      // the changelog as Datastream envelope lines — the inverse of
      // Envelope.parse/project, so the loop's decode is genuinely
      // exercised (timestamps as ISO-8601 Z strings, payload JSON with
      // null-valued keys for tombstones)
      val lines = Changelog.fromOrders(s, d).select(
        col("action").as("__a"),
        to_json(struct(
          lit("orders").as("object"),
          date_format(col("update_date").cast("timestamp"),
            "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("source_timestamp"),
          struct(col("action").as("change_type")).as("source_metadata"),
          struct(col("pk"), col("totalprice"), col("status")).as("payload")
        )).as("value")).persist()
      try {
        val t0 = System.currentTimeMillis()
        Seq("update", "delete", "insert").zipWithIndex.foreach { case (a, i) =>
          val tmp = s"$wh/_tmp_$a"
          lines.filter(col("__a") === a).select("value")
            .coalesce(1).write.mode("overwrite").text(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(f => f.getName.startsWith("part-")).get
          val dst = java.nio.file.Paths.get(in, f"log-$i%03d.jsonl")
          java.nio.file.Files.move(part.toPath, dst): Unit
          // FileStreamSource orders by mtime — pin file → batch
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(t0 + i * 1000L)): Unit
          graft.core.WorkDirs.deleteDir(tmp)
        }
      } finally lines.unpersist(false)
      graft.streaming.CdcStream.runOnce(s, graft.streaming.CdcStreamConfig(
        in, wh, s"$wh/_ck",
        graft.cdc.Registry.fromJson(streamLoopRegistryJson),
        maxFilesPerTrigger = 1, // one adversarial fold per trigger
        cleanSource = "archive", sourceArchiveDir = Some(s"$wh/_archive"),
        snapshotKeys = Map("orders" -> Seq("pk")), snapshotBuckets = 16,
        aggSpecs = Map("orders" -> Seq(graft.cdc.AggMaintainer.AggSpec(
          "by_status", Seq("status"), Seq("totalprice")))),
        scd2Keys = Map("orders" -> Seq("pk"))))
    }

  /** q187: the TWO-TABLE streaming loop with a maintained JOIN VIEW, a
    * MID-STREAM registry refresh, and a dead-letter replay — closing
    * the one maintainer the q182–q184 loop left gated only through
    * direct fold calls (JoinMaintainer), and exercising the reference's
    * core operational story end-to-end: multi-table routing
    * (`dataflow-cdc-stream.py:69-92`), a table that starts UNREGISTERED
    * (its envelopes dead-letter), a registry edit applied to the
    * RUNNING stream (per-batch reload from `registryPath` — the
    * reference's per-record fetch, at per-batch cost), and the
    * documented recovery pattern (replayDeadLetter, then fold the
    * `batch=-2` frame through the maintainer).
    *
    * Determinism under a racy refresh: the registry-v2 write lands
    * asynchronously after batch 0 commits (a StreamingQueryListener),
    * so WHICH later trigger first routes `customer` is timing-dependent
    * — but every fold in the chain is arrival-order-free (snapshot
    * argmax; the join view re-derives from the side snapshots), and
    * whatever dead-letters is replayed and folded after the stream, so
    * the FINAL store state is identical on every run: the from-scratch
    * join of the two final snapshots — q173's oracle, verbatim. Batch 0
    * itself is pinned: the stream loads v1 at start and re-loads it at
    * batch 0 before the listener can fire, so the dead-letter path is
    * genuinely exercised every run (plus a ghost `audit_log` envelope
    * that no registry version ever learns — it must survive in the dead
    * letter, replayed by nothing). */
  private def streamLoop2RegistryJson(withCustomer: Boolean): String = {
    val orders =
      """"orders": {"table_name": "orders_j", "schema": {"fields": [
        |  {"name": "pk", "type": "INT64"},
        |  {"name": "custkey", "type": "INT64"},
        |  {"name": "totalprice", "type": "NUMERIC"},
        |  {"name": "action", "type": "STRING"},
        |  {"name": "update_date", "type": "TIMESTAMP"}]}}""".stripMargin
    val customer =
      """"customer": {"table_name": "customer_j", "schema": {"fields": [
        |  {"name": "custkey", "type": "INT64"},
        |  {"name": "acctbal", "type": "NUMERIC"},
        |  {"name": "mktsegment", "type": "STRING"},
        |  {"name": "action", "type": "STRING"},
        |  {"name": "update_date", "type": "TIMESTAMP"}]}}""".stripMargin
    if (withCustomer) s"{$orders,\n$customer}" else s"{$orders}"
  }

  /** Render a one-column `value` frame to a single JSONL file at `dst`
    * with a pinned mtime (FileStreamSource orders by mtime — mtime IS
    * the trigger order under maxFilesPerTrigger=1). */
  private def writeJsonlFile(df: DataFrame, tmp: String, dst: java.nio.file.Path,
                             mtimeMillis: Long): Unit = {
    df.coalesce(1).write.mode("overwrite").text(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-")).get
    java.nio.file.Files.move(part.toPath, dst): Unit
    java.nio.file.Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(mtimeMillis)): Unit
    graft.core.WorkDirs.deleteDir(tmp)
  }

  private def streamLoop2Build(s: SparkSession, d: String): String =
    graft.core.WorkDirs.ensureStore(s"loop2_${Integer.toHexString(d.hashCode)}") { wh =>
      val in = s"$wh/_in"
      new java.io.File(in).mkdirs(): Unit
      val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
      // both changelogs as Datastream envelope lines, action-partitioned
      // into three files (updates, deletes, inserts — the adversarial
      // fold order q173 pins), each file carrying BOTH tables' lines so
      // every trigger is a genuine multi-table batch
      val ol = q173OrdersLog(s, d).select(col("action").as("__a"),
        to_json(struct(
          lit("orders").as("object"),
          date_format(col("update_date").cast("timestamp"), tsFmt).as("source_timestamp"),
          struct(col("action").as("change_type")).as("source_metadata"),
          struct(col("pk"), col("custkey"), col("totalprice")).as("payload")
        )).as("value"))
      val cl = q173CustLog(s, d).select(col("action").as("__a"),
        to_json(struct(
          lit("customer").as("object"),
          date_format(col("update_date").cast("timestamp"), tsFmt).as("source_timestamp"),
          struct(col("custkey"), col("acctbal"), col("mktsegment")).as("payload"),
          struct(col("action").as("change_type")).as("source_metadata")
        )).as("value"))
      val ghost = s.createDataFrame(
        s.sparkContext.parallelize(Seq(org.apache.spark.sql.Row("insert",
          """{"object":"audit_log","source_timestamp":"1995-01-01T00:00:00.000Z","source_metadata":{"change_type":"insert"},"payload":{"id":1}}"""))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__a", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.StringType))))
      val lines = ol.unionByName(cl).persist()
      try {
        val t0 = System.currentTimeMillis()
        Seq("update", "delete", "insert").zipWithIndex.foreach { case (a, i) =>
          val perAction = lines.filter(col("__a") === a).select("value")
          val withGhost = if (i == 0)
            perAction.unionAll(ghost.select("value")) else perAction
          writeJsonlFile(withGhost, s"$wh/_tmp_$a",
            java.nio.file.Paths.get(in, f"log-$i%03d.jsonl"), t0 + i * 1000L)
        }
      } finally lines.unpersist(false)

      // registry v1: orders only — batch 0 MUST dead-letter customer
      val regPath = s"$wh/_registry.json"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(regPath),
        streamLoop2RegistryJson(withCustomer = false)): Unit
      // the MID-STREAM refresh: after the first batch commits, swap in
      // v2 atomically (tmp + ATOMIC_MOVE — a torn read must be
      // impossible; CdcStream's per-batch reload would survive one by
      // keeping the previous registry, but then the refresh would
      // silently skip a batch)
      val flipped = new java.util.concurrent.atomic.AtomicBoolean(false)
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = {}
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = {}
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
          if (e.progress.name != null &&
              e.progress.name.startsWith("graft-cdc-stream") &&
              !flipped.getAndSet(true)) {
            val tmp = java.nio.file.Paths.get(s"$regPath.next")
            java.nio.file.Files.writeString(tmp,
              streamLoop2RegistryJson(withCustomer = true)): Unit
            java.nio.file.Files.move(tmp, java.nio.file.Paths.get(regPath),
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
          }
      }
      s.streams.addListener(listener)
      try {
        graft.streaming.CdcStream.runOnce(s, graft.streaming.CdcStreamConfig(
          in, wh, s"$wh/_ck",
          registry = Map.empty, registryPath = Some(regPath),
          maxFilesPerTrigger = 1, // one adversarial fold per trigger
          cleanSource = "archive", sourceArchiveDir = Some(s"$wh/_archive"),
          snapshotKeys = Map("orders" -> Seq("pk"), "customer" -> Seq("custkey")),
          snapshotBuckets = 16, // sized to the data, q170's note
          joinViews = Seq(graft.streaming.JoinViewSpec(
            "ord_cust", "custkey", "orders", "customer"))))
      } finally s.streams.removeListener(listener)

      // recovery: replay whatever dead-lettered under v1 (at least batch
      // 0's customer updates — possibly later batches too if the refresh
      // landed late), then fold the replayed frame through the SAME
      // maintainer the stream used (identical bucket counts — the store
      // layout is the contract). The ghost table is not in v2, so its
      // envelope stays dead — replay filters on the current registry.
      val reg2 = graft.cdc.Registry.load(regPath)
      graft.cdc.Ingest.replayDeadLetter(s, wh, reg2)
      def replayed(table: String): Option[DataFrame] = {
        val dir = s"$wh/${reg2(table).physicalName}/batch=${graft.cdc.Ingest.ReplayBatchId}"
        if (!new java.io.File(dir).exists()) None
        else {
          val df = s.read.parquet(dir).drop(graft.cdc.Envelope.DtCol)
          if (df.isEmpty) None else Some(df)
        }
      }
      graft.cdc.JoinMaintainer.foldAndMaintain(s, wh, "ord_cust", "custkey",
        graft.cdc.JoinMaintainer.Side("orders", Seq("pk"), replayed("orders")),
        graft.cdc.JoinMaintainer.Side("customer", Seq("custkey"), replayed("customer")),
        snapshotBuckets = 16)
    }

  private def cdcStreamLoop2Join(s: SparkSession, d: String): DataFrame = {
    val wh = streamLoop2Build(s, d)
    graft.cdc.JoinMaintainer.read(s, wh, "ord_cust")
      // NUMERIC registry payloads land as decimal(38,9); the oracle
      // contract renders at the changelogs' declared (18,2) — exact,
      // every value carries at most two fractional digits
      .select(col("custkey"), col("a_pk"),
        col("a_totalprice").cast("decimal(18,2)").as("a_totalprice"),
        col("b_acctbal").cast("decimal(18,2)").as("b_acctbal"),
        col("b_mktsegment"))
      .orderBy("custkey", "a_pk")
  }

  private def cdcStreamLoopSnapshot(s: SparkSession, d: String): DataFrame = {
    val wh = streamLoopBuild(s, d)
    graft.cdc.SnapshotMaintainer.read(s, wh, "orders")
      // NUMERIC registry payloads land as decimal(38,9); the oracle
      // contract renders at the changelog's declared (18,2) — exact,
      // every value carries two fractional digits
      .select(col("pk"), col("action"), col("update_date"),
        col("totalprice").cast("decimal(18,2)").as("totalprice"), col("status"))
      .orderBy("pk")
  }

  private def cdcStreamLoopScd2(s: SparkSession, d: String): DataFrame = {
    val wh = streamLoopBuild(s, d)
    graft.cdc.Scd2Maintainer.read(s, wh, "orders")
      .select("pk", "action", "valid_from", "valid_to", "is_current")
      .orderBy("pk", "valid_from", "action")
  }

  private def cdcStreamLoopAgg(s: SparkSession, d: String): DataFrame = {
    val wh = streamLoopBuild(s, d)
    graft.cdc.AggMaintainer.read(s, wh, "orders", "by_status")
      .select("status", "n_rows", "sum_totalprice")
      .orderBy("status")
  }

  private val joinMaintainedOracle: String =
    """WITH ol AS (
      |  SELECT o_orderkey AS pk, 'insert' AS action, o_orderdate AS update_date,
      |         o_custkey AS custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS totalprice
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, 'update', o_orderdate + INTERVAL 1 DAY, o_custkey + 1,
      |         CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)), 2)
      |              AS DECIMAL(18,2))
      |  FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 'delete', o_orderdate + INTERVAL 2 DAY,
      |         CAST(NULL AS BIGINT), CAST(NULL AS DECIMAL(18,2))
      |  FROM orders WHERE o_orderkey % 7 = 0),
      |olr AS (SELECT *, row_number() OVER (PARTITION BY pk
      |          ORDER BY update_date DESC, action DESC) AS rn FROM ol),
      |oliv AS (SELECT * FROM olr WHERE rn = 1 AND action <> 'delete'),
      |cl AS (
      |  SELECT c_custkey AS custkey, 'insert' AS action,
      |         TIMESTAMP '1995-01-01 00:00:00' AS update_date,
      |         CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal, c_mktsegment AS mktsegment
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 'update', TIMESTAMP '1995-01-02 00:00:00',
      |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) + CAST(100.00 AS DECIMAL(18,2))
      |              AS DECIMAL(18,2)), c_mktsegment
      |  FROM customer WHERE c_custkey % 5 = 0
      |  UNION ALL
      |  SELECT c_custkey, 'delete', TIMESTAMP '1995-01-03 00:00:00',
      |         CAST(NULL AS DECIMAL(18,2)), CAST(NULL AS VARCHAR)
      |  FROM customer WHERE c_custkey % 11 = 0),
      |clr AS (SELECT *, row_number() OVER (PARTITION BY custkey
      |          ORDER BY update_date DESC, action DESC) AS rn FROM cl),
      |cliv AS (SELECT * FROM clr WHERE rn = 1 AND action <> 'delete')
      |SELECT o.custkey, o.pk AS a_pk, CAST(o.totalprice AS VARCHAR) AS a_totalprice,
      |       CAST(c.acctbal AS VARCHAR) AS b_acctbal, c.mktsegment AS b_mktsegment
      |FROM oliv o JOIN cliv c USING (custkey)
      |ORDER BY o.custkey, o.pk""".stripMargin

  private val aggMaintainedOracle: String = Changelog.oracleCte +
    """, ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY pk
      |            ORDER BY update_date DESC, action DESC) AS rn
      |  FROM changelog),
      |live AS (SELECT * FROM ranked WHERE rn = 1 AND action <> 'delete')
      |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(CAST(SUM(totalprice) AS DECIMAL(38,8)) AS VARCHAR) AS sum_totalprice
      |FROM live GROUP BY status
      |ORDER BY status""".stripMargin

  private def deleteDir(path: String): Unit =
    graft.core.WorkDirs.deleteDir(path)

  private def cdcChanges(s: SparkSession, d: String): DataFrame =
    Versioned.changesBetween(Changelog.fromOrders(s, d),
        lit("1997-01-01 00:00:00").cast("timestamp"),
        lit("1998-01-01 00:00:00").cast("timestamp"))
      .select("pk", "action", "update_date", "totalprice", "status")
      .orderBy("pk", "update_date", "action")

  private def cdcHistory(s: SparkSession, d: String): DataFrame =
    Versioned.history(Changelog.fromOrders(s, d), col("pk") % 500 === 0)
      .select("pk", "action", "update_date", "totalprice", "status")
      .orderBy("pk", "update_date", "action")

  private def cdcAsOfJoin(s: SparkSession, d: String): DataFrame = {
    val facts = graft.core.Tables.lineitem(s, d)
      .select(col("l_orderkey").as("pk"), col("l_shipdate"),
              col("l_linenumber"), col("l_quantity"))
    // tombstones = false: DuckDB's ASOF JOIN pushes the action<>'delete'
    // predicate into the version side, so the oracle's semantics are
    // "match the newest surviving version"; the tombstone-aware variant
    // is unit-tested in VersionedSpec
    Versioned.asOfJoin(facts, Changelog.fromOrders(s, d), Seq("pk"), "l_shipdate",
        tombstones = false)
      // (pk, linenumber) is NOT unique in the synthetic corpus — the sort
      // must be total or tied rows permute freely between engines
      .orderBy("pk", "l_linenumber", "l_shipdate", "l_quantity")
  }

  private def cdcAsOfJoinBroadcast(s: SparkSession, d: String): DataFrame = {
    val facts = graft.core.Tables.lineitem(s, d)
      .select(col("l_orderkey").as("pk"), col("l_shipdate"),
              col("l_linenumber"), col("l_quantity"))
    // same semantics as q39 on a SMALL dimension slice — the broadcast
    // variant's contract (chains fit in one broadcast; the fact table
    // never shuffles). The full-size both-sides-large case is q39.
    Versioned.asOfJoinBroadcast(facts,
        Changelog.fromOrders(s, d).filter(col("pk") % 20 === 0),
        Seq("pk"), "l_shipdate", tombstones = false)
      .orderBy("pk", "l_linenumber", "l_shipdate", "l_quantity")
  }

  private def cdcAsOfJoinWithin(s: SparkSession, d: String): DataFrame = {
    val facts = graft.core.Tables.lineitem(s, d)
      .select(col("l_orderkey").as("pk"), col("l_shipdate"),
              col("l_linenumber"), col("l_quantity"))
    // as-of join with a 60-day max-staleness bound: facts whose newest
    // at-or-before version is older than the tolerance drop (the
    // pandas merge_asof `tolerance` semantics)
    Versioned.asOfJoinWithin(facts, Changelog.fromOrders(s, d), Seq("pk"),
        "l_shipdate", expr("INTERVAL 60 DAYS"), tombstones = false)
      .orderBy("pk", "l_linenumber", "l_shipdate", "l_quantity")
  }

  private val asOfJoinWithinOracle: String =
    Changelog.oracleCte +
      """, li AS (
        |  SELECT l_orderkey AS pk, l_shipdate, l_linenumber, l_quantity FROM lineitem),
        |m AS MATERIALIZED (
        |  -- MATERIALIZED: the tolerance filter must stay OUTSIDE the asof
        |  -- join (DuckDB's binder otherwise reads it as a second asof
        |  -- inequality) — match-newest-then-gate, same as the engine
        |  SELECT li.pk, li.l_shipdate, li.l_linenumber, li.l_quantity,
        |         v.update_date, v.totalprice, v.status
        |  FROM li ASOF JOIN changelog v
        |    ON li.pk = v.pk AND li.l_shipdate >= v.update_date
        |  WHERE v.action <> 'delete')
        |SELECT pk, strftime(l_shipdate, '%Y-%m-%dT%H:%M:%S.%f') AS l_shipdate,
        |       l_linenumber, l_quantity,
        |       strftime(update_date, '%Y-%m-%dT%H:%M:%S.%f') AS version_ts,
        |       CAST(totalprice AS VARCHAR) AS totalprice, status
        |FROM m
        |WHERE update_date >= l_shipdate - INTERVAL 60 DAY
        |ORDER BY pk, l_linenumber, l_shipdate, l_quantity""".stripMargin

  private val asOfJoinOracle: String =
    Changelog.oracleCte +
      """, li AS (
        |  SELECT l_orderkey AS pk, l_shipdate, l_linenumber, l_quantity FROM lineitem)
        |SELECT li.pk, strftime(li.l_shipdate, '%Y-%m-%dT%H:%M:%S.%f') AS l_shipdate,
        |       li.l_linenumber, li.l_quantity,
        |       CAST(v.totalprice AS VARCHAR) AS totalprice, v.status
        |FROM li ASOF JOIN changelog v
        |  ON li.pk = v.pk AND li.l_shipdate >= v.update_date
        |WHERE v.action <> 'delete'
        |ORDER BY li.pk, li.l_linenumber, li.l_shipdate, li.l_quantity""".stripMargin

  private val asOfJoinBroadcastOracle: String =
    Changelog.oracleCte +
      """, li AS (
        |  SELECT l_orderkey AS pk, l_shipdate, l_linenumber, l_quantity FROM lineitem)
        |SELECT li.pk, strftime(li.l_shipdate, '%Y-%m-%dT%H:%M:%S.%f') AS l_shipdate,
        |       li.l_linenumber, li.l_quantity,
        |       CAST(v.totalprice AS VARCHAR) AS totalprice, v.status
        |FROM li ASOF JOIN (SELECT * FROM changelog WHERE pk % 20 = 0) v
        |  ON li.pk = v.pk AND li.l_shipdate >= v.update_date
        |WHERE v.action <> 'delete'
        |ORDER BY li.pk, li.l_linenumber, li.l_shipdate, li.l_quantity""".stripMargin

  private def cdcMergeUpsert(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // one folded change batch against the orders base image: disjoint
    // update / insert / delete slices (a real batch is folded to one row
    // per key first — Merge.upsert requires it), applied eagerly
    val base = graft.core.Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("o_totalprice"))
    val updates = base
      .filter(col("o_orderkey") % 97 === 0 && col("o_orderkey") % 101 =!= 0)
      .withColumn("o_totalprice", (col("o_totalprice") * 2).cast(DecimalType(18, 2)))
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("__deleted", lit(false))
    val inserts = base
      .filter(col("o_orderkey") % 499 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
      .withColumn("o_orderstatus", lit("N"))
      .withColumn("__deleted", lit(false))
    val deletes = base
      .filter(col("o_orderkey") % 101 === 0)
      .withColumn("__deleted", lit(true))
    graft.cdc.Merge.upsert(base,
        updates.unionByName(inserts).unionByName(deletes),
        Seq("o_orderkey"), deleteFlag = Some("__deleted"))
      .orderBy("o_orderkey")
  }

  private val mergeUpsertOracle: String =
    """WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus,
      |                     CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
      |              FROM orders),
      |upd AS (SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
      |               CAST(o_totalprice * 2 AS DECIMAL(18,2)) AS o_totalprice
      |        FROM base WHERE o_orderkey % 97 = 0 AND o_orderkey % 101 <> 0),
      |ins AS (SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
      |               'N' AS o_orderstatus, o_totalprice
      |        FROM base WHERE o_orderkey % 499 = 0),
      |del AS (SELECT o_orderkey FROM base WHERE o_orderkey % 101 = 0),
      |skeys AS (SELECT o_orderkey FROM upd UNION ALL SELECT o_orderkey FROM ins
      |          UNION ALL SELECT o_orderkey FROM del),
      |merged AS (
      |  SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM skeys)
      |  UNION ALL SELECT * FROM upd
      |  UNION ALL SELECT * FROM ins)
      |SELECT o_orderkey, o_custkey, o_orderstatus,
      |       CAST(o_totalprice AS VARCHAR) AS o_totalprice
      |FROM merged ORDER BY o_orderkey""".stripMargin

  private val RetentionHorizon = "1997-06-01 00:00:00"

  private def cdcExpireHistory(s: SparkSession, d: String): DataFrame =
    // history <= horizon collapses to its as-of state (tombstones kept);
    // point-in-time queries at/after the horizon provably unchanged
    // (RetentionSpec, incl. a scalacheck sweep)
    graft.cdc.Retention.expireHistory(Changelog.fromOrders(s, d),
        lit(RetentionHorizon).cast("timestamp"), Seq("pk"))
      .select("pk", "action", "update_date", "totalprice", "status")
      .orderBy("pk", "update_date", "action")

  private val expireHistoryOracle: String =
    Changelog.oracleCte +
      s""", old AS (
        |  SELECT *, row_number() OVER (PARTITION BY pk
        |            ORDER BY update_date DESC, action DESC) AS rn
        |  FROM changelog WHERE update_date <= TIMESTAMP '$RetentionHorizon'),
        |kept AS (
        |  SELECT pk, action, update_date, totalprice, status FROM old WHERE rn = 1
        |  UNION ALL
        |  SELECT pk, action, update_date, totalprice, status FROM changelog
        |  WHERE update_date > TIMESTAMP '$RetentionHorizon')
        |SELECT pk, action, strftime(update_date, '%Y-%m-%dT%H:%M:%S.%f') AS update_date,
        |  CAST(totalprice AS VARCHAR) AS totalprice, status
        |FROM kept
        |ORDER BY pk, update_date, action""".stripMargin

  private def cdcColumnChurn(s: SparkSession, d: String): DataFrame =
    // CDC churn audit: of consecutive non-delete version transitions,
    // how often each payload column actually changed — sizes downstream
    // incremental work and catches formatting-instability capture bugs.
    // One pk lag window + ONE fused aggregation melted per column.
    Versioned.columnChurn(Changelog.fromOrders(s, d), Seq("pk"),
      Seq("status", "totalprice"))

  private val columnChurnOracle: String =
    Changelog.oracleCte +
      """, t AS (SELECT pk, action, totalprice, status,
        |    lag(action)     OVER w AS pa,
        |    lag(totalprice) OVER w AS pt,
        |    lag(status)     OVER w AS ps
        |  FROM changelog WINDOW w AS (PARTITION BY pk ORDER BY update_date, action)),
        |tr AS (SELECT * FROM t
        |       WHERE pa IS NOT NULL AND action <> 'delete' AND pa <> 'delete')
        |SELECT 'status' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_transitions,
        |  CAST(coalesce(SUM(CASE WHEN status IS DISTINCT FROM ps THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_changed
        |FROM tr
        |UNION ALL
        |SELECT 'totalprice', CAST(COUNT(*) AS BIGINT),
        |  CAST(coalesce(SUM(CASE WHEN totalprice IS DISTINCT FROM pt THEN 1 ELSE 0 END), 0)
        |    AS BIGINT)
        |FROM tr
        |ORDER BY col_name""".stripMargin

  /** Shared by q17 (one-shot latestSnapshot) and q170 (maintained store). */
  private val snapshotOracle: String = Changelog.oracleCte +
    """, ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY pk
      |            ORDER BY update_date DESC, action DESC) AS rn
      |  FROM changelog)
      |SELECT pk, action, strftime(update_date, '%Y-%m-%dT%H:%M:%S.%f') AS update_date,
      |  CAST(totalprice AS VARCHAR) AS totalprice, status
      |FROM ranked WHERE rn = 1 AND action <> 'delete'
      |ORDER BY pk""".stripMargin

  /** Shared by q34 (one-shot scd2) and q167 (maintained store). */
  private val scd2Oracle: String = Changelog.oracleCte +
    """
      |SELECT pk, action,
      |  strftime(update_date, '%Y-%m-%dT%H:%M:%S.%f') AS valid_from,
      |  strftime(lead(update_date) OVER (PARTITION BY pk ORDER BY update_date, action),
      |           '%Y-%m-%dT%H:%M:%S.%f') AS valid_to,
      |  (lead(update_date) OVER (PARTITION BY pk ORDER BY update_date, action) IS NULL
      |   AND action <> 'delete') AS is_current
      |FROM changelog
      |ORDER BY pk, valid_from, action""".stripMargin

  private val cdcDefs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q158_column_churn", cdcColumnChurn _, Some(columnChurnOracle)),
    ("q97_expire_history", cdcExpireHistory _, Some(expireHistoryOracle)),
    ("q93_merge_upsert", cdcMergeUpsert _, Some(mergeUpsertOracle)),
    ("q48_asof_join_broadcast", cdcAsOfJoinBroadcast _, Some(asOfJoinBroadcastOracle)),
    ("q39_asof_join", cdcAsOfJoin _, Some(asOfJoinOracle)),
    ("q76_asof_join_within", cdcAsOfJoinWithin _, Some(asOfJoinWithinOracle)),
    ("q34_cdc_scd2", cdcScd2 _, Some(scd2Oracle)),
    // the MAINTAINED store must answer identically to the one-shot
    // derivation — same oracle, different engine path (incremental
    // folds in adversarial arrival order)
    ("q167_scd2_maintained", cdcScd2Maintained _, Some(scd2Oracle)),
    ("q35_cdc_changes", cdcChanges _,
      Some(Changelog.oracleCte +
        """
          |SELECT pk, action, strftime(update_date, '%Y-%m-%dT%H:%M:%S.%f') AS update_date,
          |  CAST(totalprice AS VARCHAR) AS totalprice, status FROM changelog
          |WHERE update_date > TIMESTAMP '1997-01-01 00:00:00'
          |  AND update_date <= TIMESTAMP '1998-01-01 00:00:00'
          |ORDER BY pk, update_date, action""".stripMargin)),
    ("q36_cdc_history", cdcHistory _,
      Some(Changelog.oracleCte +
        """
          |SELECT pk, action, strftime(update_date, '%Y-%m-%dT%H:%M:%S.%f') AS update_date,
          |  CAST(totalprice AS VARCHAR) AS totalprice, status FROM changelog
          |WHERE pk % 500 = 0
          |ORDER BY pk, update_date, action""".stripMargin)),
    ("q17_cdc_snapshot", cdcSnapshot _, Some(snapshotOracle)),
    // the MAINTAINED stores must answer identically to the one-shot
    // derivations they cache (q170: q17's oracle verbatim; q171: the
    // GROUP BY the delta folds claim to maintain)
    ("q170_snapshot_maintained", cdcSnapshotMaintained _, Some(snapshotOracle)),
    ("q171_agg_maintained", cdcAggMaintained _, Some(aggMaintainedOracle)),
    ("q173_join_maintained", cdcJoinMaintained _, Some(joinMaintainedOracle)),
    // the FULL STREAMING LOOP (file source + checkpoint + archive +
    // every maintainer on, three adversarial triggers) must leave
    // stores answering the one-shot oracles verbatim — decode → route
    // → append → fold gated end to end, not per-maintainer
    ("q182_stream_loop_snapshot", cdcStreamLoopSnapshot _, Some(snapshotOracle)),
    ("q183_stream_loop_scd2", cdcStreamLoopScd2 _, Some(scd2Oracle)),
    ("q184_stream_loop_agg", cdcStreamLoopAgg _, Some(aggMaintainedOracle)),
    // the TWO-TABLE loop: multi-table routing + maintained join view +
    // mid-stream registry refresh + dead-letter replay, all through the
    // real file-source stream — must answer q173's oracle verbatim
    ("q187_stream_loop_join", cdcStreamLoop2Join _, Some(joinMaintainedOracle)),
    ("q18_cdc_asof", cdcAsOf _,
      Some(Changelog.oracleCte +
        s""", ranked AS (
          |  SELECT *, row_number() OVER (PARTITION BY pk
          |            ORDER BY update_date DESC, action DESC) AS rn
          |  FROM changelog WHERE update_date <= TIMESTAMP '$AsOfTs')
          |SELECT pk, action, strftime(update_date, '%Y-%m-%dT%H:%M:%S.%f') AS update_date,
          |  CAST(totalprice AS VARCHAR) AS totalprice, status
          |FROM ranked WHERE rn = 1 AND action <> 'delete'
          |ORDER BY pk""".stripMargin))
  )

  private def allDefs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Relational.defs ++ cdcDefs ++ graft.queries.Extended.defs

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every query ends in [[graft.core.Canon.canonical]]: timestamps and
    * decimals render as engine-neutral strings so the driver's typed
    * hash compare sees identical physical columns from Spark and the
    * DuckDB oracle (whose SQL carries the matching strftime/CAST).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (n, fn, _) =>
      n -> ((s: SparkSession, d: String) => graft.core.Canon.canonical(fn(s, d)))
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (n, _, Some(sql)) => n -> sql }.toMap

  /** Deterministic candidate sets Verify materializes under
    * [[graft.queries.Extended.OracleAuxDir]] so re-rank oracles (q30
    * LSH / q33 IVF) can score EXACTLY the pairs the engine scored. */
  def auxDumps: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Extended.auxDumps

  /** Maintained-store queries' build phase, split from the read: each
    * entry forces the named query's store to exist (fold machinery,
    * memoized per sf dir within a JVM) WITHOUT running the query's
    * read. Bench times these separately so the per-query table stops
    * charging store construction to query latency; callers that skip
    * the builder (Verify, ScaleBench) get build+read in one call,
    * exactly as before. */
  def storeBuilders: Map[String, (SparkSession, String) => Unit] = Map[
      String, (SparkSession, String) => Unit](
    "q167_scd2_maintained" -> ((s, d) => scd2StoreBuild(s, d): Unit),
    "q170_snapshot_maintained" -> ((s, d) => snapStoreBuild(s, d): Unit),
    "q171_agg_maintained" -> ((s, d) => aggStoreBuild(s, d): Unit),
    "q173_join_maintained" -> ((s, d) => joinStoreBuild(s, d): Unit),
    "q182_stream_loop_snapshot" -> ((s, d) => streamLoopBuild(s, d): Unit),
    "q183_stream_loop_scd2" -> ((s, d) => streamLoopBuild(s, d): Unit),
    "q184_stream_loop_agg" -> ((s, d) => streamLoopBuild(s, d): Unit),
    "q187_stream_loop_join" -> ((s, d) => streamLoop2Build(s, d): Unit)
  ) ++ graft.queries.Extended.storeBuilders
}

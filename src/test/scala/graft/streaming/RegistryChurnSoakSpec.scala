package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.cdc.{Fixtures, Ingest, Versioned}

/** Soak: seeded-random interleavings of hot registry ADDS and REMOVES
  * with maintained-store folds and dead-letter replays, across stream
  * restarts (each `runOnce` is a restart on the shared checkpoint) —
  * the combination of hardened paths no single-scenario spec exercises
  * together. Type flips and physical renames are out of scope here:
  * their in-stream rejection has its own specs, and at RESTART the
  * registry file is authoritative by design (restart-time migration),
  * so a flip persisted in the file between `runOnce` calls would be a
  * deliberate poisoning, not churn.
  *
  * The oracle is exact, driver-side bookkeeping: every envelope is
  * recorded as routed (its table was registered at that trigger) or
  * dead-lettered; a replay moves the dead rows of currently-registered
  * tables into the routed set. After the churn:
  *  1. each table's physical rows == the routed set, exactly;
  *  2. the dead letter holds exactly the never-replayed leftovers;
  *  3. each table's MAINTAINED snapshot == `latestSnapshot` re-derived
  *     from its full physical history — stream folds and the manual
  *     replay fold (the operational pattern: `replayDeadLetter`, then
  *     fold the `batch=-2` frame) must agree with the from-scratch
  *     derivation no matter the interleaving.
  */
class RegistryChurnSoakSpec extends SparkTestBase {

  private val Pool = Seq("t0", "t1", "t2", "t3")

  private def registryJson(tables: Iterable[String]): String =
    tables.map { t =>
      s""""$t": {"table_name": "${t}_cdc", "schema": {"fields": [
         |  {"name": "pk", "type": "INT64"},
         |  {"name": "v", "type": "INT64"},
         |  {"name": "action", "type": "STRING"},
         |  {"name": "update_date", "type": "TIMESTAMP"}]}}""".stripMargin
    }.mkString("{", ",\n", "}")

  test("soak: registry add/remove churn + replays + maintained folds across restarts") {
    Seq(7L, 23L, 4099L).foreach(runSoak)
  }

  private def runSoak(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val in = tmpDir(s"soak-in-$seed")
    val wh = tmpDir(s"soak-wh-$seed")
    val ck = tmpDir(s"soak-ck-$seed")
    val regPath = tmpDir(s"soak-reg-$seed") + "/registry.json"

    var registered: Set[String] = Set("t0", "t1")
    def writeRegistry(): Unit = java.nio.file.Files.writeString(
      java.nio.file.Paths.get(regPath), registryJson(registered)): Unit
    writeRegistry()

    val fullRegistry = graft.cdc.Registry.fromJson(registryJson(Pool))
    val cfg = CdcStreamConfig(in, wh, ck, registry = Map.empty,
      registryPath = Some(regPath),
      snapshotKeys = Pool.map(_ -> Seq("pk")).toMap, snapshotBuckets = 4)

    // exact oracle: v is a globally-unique payload value, ts strictly
    // increasing (argmax over (__v, action) must never tie)
    var vCounter = 0L
    val routed = mutable.Map.empty[String, mutable.Set[(Long, Long, String)]]
    val dead = mutable.Buffer.empty[(String, (Long, Long, String))]

    def foldReplays(touchedTables: Set[String]): Unit =
      touchedTables.foreach { t =>
        val dir = s"$wh/${fullRegistry(t).physicalName}/batch=${Ingest.ReplayBatchId}"
        if (new java.io.File(dir).exists())
          graft.cdc.SnapshotMaintainer.update(spark, wh, t,
            spark.read.parquet(dir).drop(graft.cdc.Envelope.DtCol),
            Seq("pk"), buckets = 4)
      }

    val steps = 8
    for (step <- 0 until steps) {
      // 1) maybe churn the registry BEFORE this trigger's file lands —
      // restart-time load makes it effective for the whole runOnce
      if (rnd.nextDouble() < 0.6) {
        val unregistered = Pool.filterNot(registered)
        if (unregistered.nonEmpty && (registered.size <= 1 || rnd.nextBoolean()))
          registered += unregistered(rnd.nextInt(unregistered.size))
        else if (registered.size > 1)
          registered -= registered.toSeq(rnd.nextInt(registered.size))
        writeRegistry()
      }

      // 2) a batch file across random tables — registered or not
      val lines = (0 until (2 + rnd.nextInt(4))).map { _ =>
        val t = Pool(rnd.nextInt(Pool.size))
        val pk = rnd.nextInt(5).toLong
        val action = Seq("insert", "update", "delete")(rnd.nextInt(3))
        vCounter += 1
        val rec = (pk, vCounter, action)
        if (registered(t)) routed.getOrElseUpdate(t, mutable.Set.empty) += rec
        else dead += ((t, rec))
        val ts = f"2026-02-01T10:${vCounter / 60}%02d:${vCounter % 60}%02d.000Z"
        Fixtures.envelope(t, ts, action, s"""{"pk":$pk,"v":$vCounter}""")
      }
      Fixtures.writeLines(in, f"log-$step%03d.jsonl", lines, gzip = false)

      // 3) one restart+trigger under the current registry file
      CdcStream.runOnce(spark, cfg)

      // 4) sometimes replay the dead letter with the CURRENT registry,
      // then fold the replayed frame into the maintained snapshots (the
      // documented replay pattern — out-of-band appends fold manually)
      if (dead.nonEmpty && rnd.nextDouble() < 0.4) {
        val current = graft.cdc.Registry.load(regPath)
        Ingest.replayDeadLetter(spark, wh, current)
        val recovered = dead.filter { case (t, _) => current.contains(t) }
        recovered.foreach { case (t, rec) =>
          routed.getOrElseUpdate(t, mutable.Set.empty) += rec
        }
        dead --= recovered
        foldReplays(recovered.map(_._1).toSet)
      }
    }

    // final: physical rows == routed oracle, per table
    for (t <- Pool) {
      val want = routed.get(t).map(_.toSet).getOrElse(Set.empty)
      val dir = new java.io.File(s"$wh/${fullRegistry(t).physicalName}")
      if (want.isEmpty) {
        // appendBatch writes a batch dir for EVERY registered table (an
        // empty one when no rows routed) — so the dir may exist; the
        // invariant is zero rows, not absence
        if (dir.exists())
          assert(Ingest.readTable(spark, wh, fullRegistry(t)).count() == 0L,
            s"seed=$seed: $t routed nothing but holds rows")
      } else {
        val got = Ingest.readTable(spark, wh, fullRegistry(t))
          .select("pk", "v", "action")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
        assert(got == want,
          s"seed=$seed table=$t: physical rows diverge from the oracle\n" +
            s"missing=${want -- got}\nextra=${got -- want}")
      }
    }

    // the dead letter holds exactly the never-replayed leftovers
    val deadDir = new java.io.File(s"$wh/${Ingest.UnknownTableDir}")
    val deadGot =
      if (!deadDir.exists()) Set.empty[(String, Long)]
      else spark.read.parquet(deadDir.toString)
        .select(col("object"),
          get_json_object(col("_raw"), "$.payload.v").cast("long").as("v"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // replayed rows STAY in the dead letter by design (replay reads, it
    // does not delete) — the oracle check is set-inclusion of leftovers
    // plus every dead-lettered v ever produced
    val deadWant = dead.map { case (t, (_, v, _)) => (t, v) }.toSet
    assert(deadWant.subsetOf(deadGot),
      s"seed=$seed: dead letter lost rows: ${deadWant -- deadGot}")

    // maintained snapshot == from-scratch latestSnapshot over the full
    // physical history, for every table that ever routed
    for (t <- Pool if routed.get(t).exists(_.nonEmpty)) {
      val full = Ingest.readTable(spark, wh, fullRegistry(t))
        .withColumn("__v", col("update_date").cast("timestamp"))
      val want = Versioned.latestSnapshot(full, Seq("pk"), versionCol = "__v")
        .select("pk", "v", "action")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val got = graft.cdc.SnapshotMaintainer.read(spark, wh, t)
        .select("pk", "v", "action")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got == want,
        s"seed=$seed table=$t: maintained snapshot diverged\n" +
          s"missing=${want -- got}\nextra=${got -- want}")
    }
  }
}

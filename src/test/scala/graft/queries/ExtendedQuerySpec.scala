package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables
import graft.ext.Multimodal

class ExtendedQuerySpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q38 KMV sketch: exact below k, estimate within tolerance, registers SHA-pinned") {
    // sf0.001 has 15 distinct users per type — below k=128, so the KMV
    // contract demands EXACT equality, not tolerance
    val approx = graft.SparkEntry.queries("q38_approx_distinct")(spark, dir)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, dir)
      .groupBy("event_type").agg(countDistinct($"user_id").as("n"))
      .select("event_type", "n").as[(String, Long)].collect().toMap
    exact.foreach { case (et, ex) =>
      assert(approx(et) == ex, s"$et: below-k group must be exact, got ${approx(et)} vs $ex")
    }

    // sf0.01 has 150 distinct per type — ABOVE k, the estimate branch:
    // KMV rsd is 1/sqrt(k-2) ≈ 8.9%; 3σ bound
    val ap01 = graft.SparkEntry.queries("q38_approx_distinct")(spark, "/root/testdata/sf0.01")
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    val ex01 = Tables.events(spark, "/root/testdata/sf0.01")
      .groupBy("event_type").agg(countDistinct($"user_id").as("n"))
      .select("event_type", "n").as[(String, Long)].collect().toMap
    ex01.foreach { case (et, ex) =>
      val ap = ap01(et)
      assert(math.abs(ap - ex).toDouble / ex <= 0.27, s"$et: approx=$ap exact=$ex")
    }

    // determinism pin at the ARTIFACT level: a fixed SHA over the
    // register dump catches hash-kernel or heap-aggregator drift that
    // the estimate-level oracle (recomputed FROM the registers) cannot
    val regs = graft.ext.Sketches.kmvRegisters(
        Tables.events(spark, dir), "event_type", $"user_id", k = 128)
      .as[(String, Seq[Long])].collect().sortBy(_._1)
    val canon = regs.map { case (g, m) => s"$g:${m.mkString(",")}" }.mkString("\n")
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(sha == "d90b4df0199115a9d4c1bd95416b7249e1a40e61fce395e8dcd24dd13a27bc2f",
      s"q38 register artifact drifted: $sha")
  }

  test("built-in approx_count_distinct (HLL++) within 10% of exact") {
    val approx = Tables.events(spark, dir)
      .groupBy("event_type").agg(approx_count_distinct($"user_id").as("a"))
      .select("event_type", "a").as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, dir)
      .groupBy("event_type").agg(countDistinct($"user_id").as("n"))
      .select("event_type", "n").as[(String, Long)].collect().toMap
    exact.foreach { case (et, ex) =>
      val ap = approx(et)
      assert(math.abs(ap - ex).toDouble / ex <= 0.10, s"$et: approx=$ap exact=$ex")
    }
  }

  test("q37 frame sampling: count and byte accounting") {
    val media = Multimodal.synthesizeFromDocuments(
      Tables.documents(spark, dir).filter($"doc_id" % 10 === 0))
    val frames = Multimodal.sampleFrames(media, everyMs = 2000L)
    val perMedia = frames.groupByKey(_.media_id)
      .mapGroups((id, it) => {
        val fs = it.toSeq
        (id, fs.length, fs.map(_.frame.length).sum)
      }).collect().map { case (id, n, b) => id -> (n, b) }.toMap
    val src = media.collect()
    src.foreach { r =>
      val (n, bytes) = perMedia(r.media_id)
      assert(n == math.max(1, (r.meta.durationMs / 2000L).toInt))
      assert(bytes == r.content.length, "frame slices must cover content exactly")
    }
  }

  test("resize rewrites metadata and shrinks payload deterministically") {
    val media = Multimodal.synthesizeFromDocuments(
      Tables.documents(spark, dir).limit(10))
    val resized = Multimodal.resize(media, 128, 128).collect()
    resized.foreach { r =>
      assert(r.meta.width == 128 && r.meta.height == 128)
      assert(r.content.length > 0)
    }
    val again = Multimodal.resize(media, 128, 128).collect()
      .map(r => r.media_id -> r.content.toSeq).toMap
    resized.foreach(r => assert(again(r.media_id) == r.content.toSeq))
  }

  test("every declared query runs at sf0.001 and yields a schema") {
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.schema.fields.nonEmpty, s"$name: empty schema")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only keys: ${o -- q}")
  }
}

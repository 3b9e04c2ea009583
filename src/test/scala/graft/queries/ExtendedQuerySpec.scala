package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables
import graft.ext.Multimodal

class ExtendedQuerySpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q38 approx_count_distinct within 10% of exact") {
    val approx = graft.SparkEntry.queries("q38_approx_distinct")(spark, dir)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
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

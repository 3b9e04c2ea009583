package graft.ext

import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.core.Tables

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(30)

  test("synthesized media corpus: binary content + typed metadata struct") {
    val media = Multimodal.synthesizeFromDocuments(docs)
    val schema = media.toDF().schema
    assert(schema("content").dataType == BinaryType)
    assert(schema("meta").dataType.isInstanceOf[StructType])
    val kinds = media.toDF().select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
    val one = media.filter(_.media_id % 3 == 0).head()
    assert(one.meta.mime == "image/png")
    assert(one.content.nonEmpty)
  }

  test("feature extraction: fixed dim, unit norm, deterministic") {
    val media = Multimodal.synthesizeFromDocuments(docs)
    val feats = Multimodal.extractFeatures(media, dim = 32).collect()
    assert(feats.forall(_.feature.length == 32))
    feats.foreach { f =>
      val norm = math.sqrt(f.feature.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5, s"non-unit norm $norm for ${f.media_id}")
    }
    // determinism: second run bit-identical
    val again = Multimodal.extractFeatures(media, dim = 32).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    feats.foreach(f => assert(again(f.media_id) == f.feature.toSeq))
  }

  test("n_bytes tracks payload size") {
    val media = Multimodal.synthesizeFromDocuments(docs)
    val feats = Multimodal.extractFeatures(media, dim = 8)
      .toDF().select("media_id", "n_bytes").as[(Long, Long)].collect().toMap
    val bytes = docs.select($"doc_id", length($"text").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(feats == bytes)
  }

  test("media_features expression == mapPartitions decode path") {
    import org.apache.spark.sql.functions.col
    val media = Multimodal.synthesizeFromDocuments(docs)
    val viaExpr = media.toDF()
      .select(col("media_id"),
        graft.functions.VectorFunctions.media_features(col("content"), 32).as("f"))
      .as[(Long, Seq[Float])].collect().toMap
    val viaMap = Multimodal.extractFeatures(media, dim = 32).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(viaExpr == viaMap)
    // null-safe
    val n = spark.sql("SELECT CAST(NULL AS BINARY) AS b").select(
      graft.functions.VectorFunctions.media_features(col("b"), 8)).head()
    assert(n.isNullAt(0))
  }

  test("featurePipeline aggregates per kind") {
    val agg = Multimodal.featurePipeline(spark, docs)
    val rows = agg.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    // mean squared norm of unit vectors ≈ 1 (reported in 1e-12 units)
    rows.foreach(r =>
      assert(math.abs(r.getAs[Long]("mean_sq_norm_e12") - 1.0e12) < 1e7))
  }

  private def length(c: org.apache.spark.sql.Column) = org.apache.spark.sql.functions.length(c)
}

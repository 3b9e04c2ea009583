package graft.cdc

import graft.SparkTestBase

case class MRow(k: Long, v: String)
case class MSrc(k: Long, v: String, dead: Boolean)

class MergeSpec extends SparkTestBase {
  import spark.implicits._

  private val target = Seq(MRow(1, "a"), MRow(2, "b"), MRow(3, "c"), MRow(4, "d")).toDS.toDF

  test("upsert: update replaces, insert appends, unmatched target kept") {
    val src = Seq(MSrc(2, "B", dead = false), MSrc(9, "I", dead = false)).toDS.toDF
    val out = Merge.upsert(target, src, Seq("k"), Some("dead"))
      .as[MRow].collect().map(r => r.k -> r.v).toMap
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d", 9L -> "I"))
  }

  test("upsert: delete removes matched key; delete of absent key is a no-op") {
    val src = Seq(MSrc(3, "x", dead = true), MSrc(42, "x", dead = true)).toDS.toDF
    val out = Merge.upsert(target, src, Seq("k"), Some("dead"))
      .as[MRow].collect().map(r => r.k -> r.v).toMap
    assert(out == Map(1L -> "a", 2L -> "b", 4L -> "d"))
  }

  test("upsert: mixed batch, and the delete-flag column is consumed") {
    val src = Seq(MSrc(1, "A", dead = false), MSrc(4, "-", dead = true),
      MSrc(7, "G", dead = false)).toDS.toDF
    val out = Merge.upsert(target, src, Seq("k"), Some("dead"))
    assert(!out.columns.contains("dead"))
    assert(out.as[MRow].collect().map(r => r.k -> r.v).toMap ==
      Map(1L -> "A", 2L -> "b", 3L -> "c", 7L -> "G"))
  }

  test("upsert without a delete flag is pure replace-or-insert") {
    val src = Seq(MRow(2, "B2"), MRow(5, "e")).toDS.toDF
    val out = Merge.upsert(target, src, Seq("k"))
      .as[MRow].collect().map(r => r.k -> r.v).toMap
    assert(out == Map(1L -> "a", 2L -> "B2", 3L -> "c", 4L -> "d", 5L -> "e"))
  }

  test("property: upsert equals latestSnapshot for random folded batches") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.functions._
    val genOp = for {
      k <- Gen.choose(1L, 12L)
      dead <- Gen.oneOf(true, false)
      v <- Gen.alphaChar.map(_.toString)
    } yield MSrc(k, v, dead)
    // a folded batch has at most one row per key
    val genBatch = Gen.listOf(genOp).map(_.groupBy(_.k).values.map(_.head).toSeq)
    val prop = Prop.forAll(genBatch) { ops =>
      val batch = ops.toDS.toDF
      val eager = Merge.upsert(target, batch, Seq("k"), Some("dead"))
        .as[MRow].collect().map(r => r.k -> r.v).toMap
      val hist = target
        .withColumn("update_date", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
        .withColumn("action", lit("insert"))
      val asLog = batch
        .withColumn("update_date", lit(java.sql.Timestamp.valueOf("2026-01-02 00:00:00")))
        .withColumn("action", when(col("dead"), "delete").otherwise("update"))
        .drop("dead")
      val lazyRead = Versioned.latestSnapshot(hist.unionByName(asLog), Seq("k"))
        .select("k", "v").as[(Long, String)].collect().toMap
      eager == lazyRead
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(15)
      .withInitialSeed(org.scalacheck.rng.Seed(42L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("upsert equals latestSnapshot over history ∪ flagged batch") {
    // applying a folded batch eagerly must agree with the lazy versioned
    // read: history(v=0) + batch(v=1) resolved by latestSnapshot
    import org.apache.spark.sql.functions._
    val hist = target.withColumn("update_date", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .withColumn("action", lit("insert"))
    val batch = Seq(MSrc(2, "B", dead = false), MSrc(3, "-", dead = true),
      MSrc(8, "H", dead = false)).toDS.toDF
      .withColumn("update_date", lit(java.sql.Timestamp.valueOf("2026-01-02 00:00:00")))
      .withColumn("action", when(col("dead"), "delete").otherwise("update"))
      .drop("dead")
    val lazyRead = Versioned.latestSnapshot(hist.unionByName(batch), Seq("k"))
      .select("k", "v").as[(Long, String)].collect().toMap
    val eager = Merge.upsert(target, batch.withColumn("dead", col("action") === "delete")
        .drop("update_date", "action"), Seq("k"), Some("dead"))
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(eager == lazyRead)
  }
}

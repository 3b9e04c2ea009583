package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed pk join plans with ZERO exchanges; values match the plain join") {
    val dim = (1L to 2000L).map(i => (i, s"n$i")).toDF("pk", "name")
    val fact = (1L to 6000L).map(i => (i % 2000 + 1, i)).toDF("pk", "v")
    Bucketing.writeBucketed(dim, "b_dim", Seq("pk"), buckets = 8, sortCols = Seq("pk"))
    Bucketing.writeBucketed(fact, "b_fact", Seq("pk"), buckets = 8, sortCols = Seq("pk"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the test exercises the big-big join shape —
      // the one that shuffles at 100 TB without bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_fact").join(spark.table("b_dim"), "pk")
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketed-by-pk tables must join without any shuffle:\n$p")

      val got = j.select("pk", "v", "name").as[(Long, Long, String)].collect().toSet
      val expected = fact.join(dim, "pk")
        .select("pk", "v", "name").as[(Long, Long, String)].collect().toSet
      assert(got == expected && got.size == 6000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_dim")
      spark.sql("DROP TABLE IF EXISTS b_fact")
    }
  }

  test("bucketed aggregation by the bucket key needs no exchange either") {
    val fact = (1L to 4000L).map(i => (i % 500, i)).toDF("pk", "v")
    Bucketing.writeBucketed(fact, "b_agg", Seq("pk"), buckets = 4)
    try {
      val a = spark.table("b_agg").groupBy("pk").agg(sum("v").as("s"))
      val p = a.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"aggregation on the bucket key must reuse the storage distribution:\n$p")
      assert(a.count() == 500)
    } finally spark.sql("DROP TABLE IF EXISTS b_agg")
  }
}

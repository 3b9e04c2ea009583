package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BucketedSpec extends SparkTestBase {

  test("bucketed tables co-locate the join: no Exchange, equals the shuffle join") {
    import spark.implicits._
    val dim = (1L to 500L).map(i => (i, s"name_$i")).toDF("k", "dv")
    val fact = (1L to 5000L).map(i => (i % 700 + 1, i * 10)).toDF("k", "fv")
    Bucketed.writeBucketed(dim, "b_dim", "k", nBuckets = 8, sortCols = Seq("k"))
    Bucketed.writeBucketed(fact, "b_fact", "k", nBuckets = 8, sortCols = Seq("k"))
    try {
      // forbid broadcast so the no-Exchange claim is about bucketing,
      // not about one side being small
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = Bucketed.colocatedJoin(spark, "b_dim", "b_fact", "k")
        val got = j.orderBy("k", "fv").as[(Long, String, Long)].collect().toSeq
        // inspect the FINAL (post-AQE) plan, after execution
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"co-located join must not shuffle:\n$plan")
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"expected a non-broadcast join:\n$plan")
        assert(plan.toLowerCase.contains("bucket"),
          s"scan must report its bucket layout:\n$plan")
        val expected = dim.join(fact, "k").orderBy("k", "fv")
          .as[(Long, String, Long)].collect().toSeq
        assert(got == expected, "bucketed join must equal the shuffle join")
        assert(got.nonEmpty)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_dim")
      spark.sql("DROP TABLE IF EXISTS b_fact")
    }
  }

  test("bucketed write is one file per bucket; re-read preserves rows") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, i % 7)).toDF("k", "v")
    Bucketed.writeBucketed(df, "b_files", "k", nBuckets = 4)
    try {
      val loc = spark.sql("DESCRIBE TABLE EXTENDED b_files")
        .filter(col("col_name") === "Location")
        .select("data_type").as[String].head()
      val files = new java.io.File(loc.stripPrefix("file:"))
        .listFiles().filter(f => f.getName.startsWith("part-"))
      assert(files.length == 4, s"expected 4 bucket files, got ${files.length}")
      assert(spark.table("b_files").count() == 300L)
      // the bucket metadata survives in the catalog
      val ddl = spark.sql("DESCRIBE TABLE EXTENDED b_files").collect().mkString
      assert(ddl.contains("Num Buckets") || ddl.contains("4"))
    } finally spark.sql("DROP TABLE IF EXISTS b_files")
  }
}

package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedCountDistinct is exact under heavy key skew") {
    // one hot key with 10k rows over 1k distinct values + long tail
    val hot = (1 to 10000).map(i => ("hot", (i % 1000).toLong))
    val tail = (1 to 500).map(i => (s"k$i", i.toLong))
    val df = (hot ++ tail).toDF("k", "v")

    val salted = Skew.saltedCountDistinct(df, Seq("k"), "v", buckets = 8)
      .select("k", "n_distinct").as[(String, Long)].collect().toMap
    val exact = df.groupBy("k").agg(countDistinct($"v").as("n"))
      .select("k", "n").as[(String, Long)].collect().toMap
    assert(salted == exact)
    assert(salted("hot") == 1000L)
  }

  test("saltedCountDistinct on the real corpus matches q25 semantics") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val salted = Skew.saltedCountDistinct(ev, Seq("event_type"), "user_id")
      .select("event_type", "n_distinct").as[(String, Long)].collect().toMap
    val exact = ev.groupBy("event_type").agg(countDistinct($"user_id").as("n"))
      .select("event_type", "n").as[(String, Long)].collect().toMap
    assert(salted == exact)
  }
  test("capGroupSize drops over-cap groups, keeps others, preserves column ORDER") {
    val df = (Seq.tabulate(20)(i => (i.toLong, 7, 1)) ++ Seq((100L, 8, 2), (101L, 8, 2)))
      .toDF("id", "band", "bucket")
    val out = Skew.capGroupSize(df, Seq("band", "bucket"), cap = 5)
    // column order must be the CALLER's: a using-join reorders keys first,
    // which silently breaks positional toDF renames downstream (regression
    // caught in round 2)
    assert(out.columns.toSeq == Seq("id", "band", "bucket"))
    val rows = out.as[(Long, Int, Int)].collect().toSet
    assert(rows == Set((100L, 8, 2), (101L, 8, 2)), s"got $rows")
    // cap <= 0 disables
    assert(Skew.capGroupSize(df, Seq("band", "bucket"), 0).count() == 22)
  }

  test("capGroupSizeAccounted reports exactly what it dropped") {
    val df = (Seq.tabulate(20)(i => (i.toLong, 7, 1)) ++ Seq((100L, 8, 2), (101L, 8, 2)))
      .toDF("id", "band", "bucket")
    val (kept, dropped) = Skew.capGroupSizeAccounted(df, Seq("band", "bucket"), cap = 5)
    assert(kept.count() == 2)
    val d = dropped.select("band", "bucket", "__group_n")
      .as[(Int, Int, Long)].collect().toSeq
    assert(d == Seq((7, 1, 20L)), s"got $d")
    // nothing over cap -> no dropped groups, kept frame untouched
    val (kept2, dropped2) = Skew.capGroupSizeAccounted(df, Seq("band", "bucket"), cap = 50)
    assert(kept2.count() == 22 && dropped2.count() == 0)
    // disabled -> empty dropped frame with the accounting schema intact
    val (_, dropped3) = Skew.capGroupSizeAccounted(df, Seq("band", "bucket"), 0)
    assert(dropped3.columns.toSeq == Seq("band", "bucket", "__group_n"))
    assert(dropped3.count() == 0)
  }

  test("saltedJoin equals the plain inner join, including duplicate keys") {
    // hot key with many rows both sides (join multiplicity must survive
    // salting exactly), plus tail keys and non-matching keys either side
    val left = ((1 to 500).map(i => ("hot", i.toLong)) ++
      Seq(("a", 1000L), ("a", 1001L), ("b", 2000L), ("only_left", 1L)))
      .toDF("k", "lv")
    val right = (Seq.tabulate(3)(j => ("hot", j * 10L)) ++
      Seq(("a", 7L), ("only_right", 9L)))
      .toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .as[(String, Long, Long)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(left, right, Seq("k"), saltOn = $"lv", salt = 7)
      .select("k", "lv", "rv")
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.size == 500 * 3 + 2) // the equivalence covers real rows
  }

  test("saltedJoin joins on (keys, salt): the hot key spreads across buckets") {
    val left = (1 to 64).map(i => ("hot", i.toLong)).toDF("k", "lv")
    val right = Seq(("hot", 1L)).toDF("k", "rv")
    val plan = Skew.saltedJoin(left, right, Seq("k"), $"lv", salt = 4)
      .queryExecution.analyzed.toString
    assert(plan.contains("__salt"), s"salt column missing from join plan:\n$plan")
  }

}

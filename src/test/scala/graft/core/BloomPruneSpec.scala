package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BloomPruneSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fact = (1 to 5000).map(i => (i.toLong, (i % 400).toLong))
    .toDF("row_id", "fk")
  private lazy val dim = (0 until 400 by 25).map(k => (k.toLong, s"d$k"))
    .toDF("pk", "name")

  test("bloom prefilter keeps a superset of matches; join result is identical") {
    val pruned = BloomPrune.semiJoinReduce(fact, $"fk", dim, $"pk")
    // superset of the semi join, subset of the fact
    val semiCount = fact.join(dim, $"fk" === $"pk", "left_semi").count()
    val n = pruned.count()
    assert(n >= semiCount && n <= fact.count())
    // joined through, results are bit-identical to the unfiltered join
    val plain = fact.join(dim, $"fk" === $"pk").select("row_id", "fk", "pk", "name")
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    val viaBloom = pruned.join(dim, $"fk" === $"pk").select("row_id", "fk", "pk", "name")
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    assert(viaBloom == plain)
    assert(plain.nonEmpty)
  }

  test("prefilter actually prunes at realistic selectivity") {
    // 16 of 400 fk values match -> the bloom should cut the fact hard;
    // generous bound (false positives allowed), but far below pass-all
    val pruned = BloomPrune.semiJoinReduce(fact, $"fk", dim, $"pk",
      expectedItems = 1000L)
    assert(pruned.count() < fact.count() / 2,
      s"bloom pruned nothing: ${pruned.count()} of ${fact.count()}")
  }

  test("empty dimension prunes everything (inner-join semantics)") {
    val pruned = BloomPrune.semiJoinReduce(fact, $"fk", dim.limit(0), $"pk")
    assert(pruned.count() == 0)
  }

  test("probe stays in the scan stage: might_contain sits before the join exchange") {
    // parquet-backed fact: over a LocalRelation the optimizer folds the
    // probe away eagerly, which hides the thing this test pins
    val dir = tmpDir("bloomprune")
    fact.write.mode("overwrite").parquet(s"$dir/fact")
    val factPq = spark.read.parquet(s"$dir/fact")
    val pruned = BloomPrune.semiJoinReduce(factPq, $"fk", dim, $"pk")
      .join(dim, $"fk" === $"pk")
    val physical = pruned.queryExecution.executedPlan.toString
    assert(physical.contains("might_contain"),
      s"bloom probe missing from physical plan:\n$physical")
    // and it must sit under the scan side, not above the join
    val probeLine = physical.linesIterator.indexWhere(_.contains("might_contain"))
    val joinLine = physical.linesIterator.indexWhere(_.contains("HashJoin"))
    assert(probeLine > joinLine, "probe should be below the join in the tree")
  }
}

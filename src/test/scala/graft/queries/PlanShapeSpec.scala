package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

import graft.SparkTestBase

/** Regression guards for the physical-plan shapes that make these
  * queries survive scale — a correctness-preserving change that
  * reintroduces a full sort, drops a pushdown, or degrades a broadcast
  * fails HERE rather than at 100 TB.
  */
class PlanShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  private def plan(q: String): String = {
    val df: DataFrame = graft.SparkEntry.queries(q)(spark, dir)
    df.queryExecution.executedPlan.toString()
  }

  test("q01: filters and pruning reach the parquet scan") {
    val p = plan("q01_scan_filter")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThanOrEqual(l_shipdate"))
    assert(!p.contains("l_tax"), "ReadSchema should exclude unused columns")
  }

  test("q04: dimension joins broadcast, no cartesian") {
    val p = plan("q04_multijoin")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q11: global top-k is TakeOrderedAndProject, not a full sort+limit") {
    val p = plan("q11_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q17: snapshot window gets rank-limit pushdown (WindowGroupLimit)") {
    val p = plan("q17_cdc_snapshot")
    assert(p.contains("WindowGroupLimit"))
  }

  test("q29: top-k ranks via partial ObjectHashAggregate, not a window") {
    val p = plan("q29_cosine_topk")
    assert(p.contains("ObjectHashAggregate"))
    assert(!p.contains("Window "), "top-k must not fall back to a window sort")
  }

  test("q02: partial aggregation happens map-side") {
    val p = plan("q02_hash_agg")
    // partial_ prefix marks map-side combine in HashAggregate
    assert(p.contains("partial_sum") || p.contains("partial_count"))
  }

  test("whole-stage codegen covers the custom expressions") {
    val df = graft.core.Tables.embeddings(spark, dir)
    val p = df.select(graft.functions.VectorFunctions
        .cosine_similarity(org.apache.spark.sql.functions.col("embedding"),
          org.apache.spark.sql.functions.col("embedding")).as("s"))
      .queryExecution.executedPlan.toString()
    // WholeStageCodegenExec renders as "*(n) Project ..." in the tree string
    assert(p.contains("*("), "cosine_similarity must stay inside a codegen span")
  }
  test("q48: broadcast as-of join never shuffles the fact side") {
    val p = plan("q48_asof_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), "version chains must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "fact side must not shuffle for the join")
    assert(!p.contains("Window"), "no window pass in the broadcast variant")
  }

  test("q49: cube goes through Expand with map-side partial aggregation") {
    val p = plan("q49_cube")
    assert(p.contains("Expand"))
    assert(p.contains("partial_count") || p.contains("partial_sum"))
  }

  test("q51: curation never degrades to a cartesian or nested-loop join") {
    val p = plan("q51_curate_corpus")
    assert(!p.contains("CartesianProduct"), "all-pairs joins belong to the oracle only")
    assert(!p.contains("BroadcastNestedLoopJoin"), "candidate generation must stay equi-join LSH")
  }

}

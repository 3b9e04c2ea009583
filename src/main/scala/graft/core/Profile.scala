package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the `ANALYZE`-style accounting a corpus
  * owner runs before trusting a table: null counts, exact distinct
  * cardinality, min/max per column, one output row per column.
  *
  * Scale shape: ONE aggregation pass over the table computes every
  * column's stats together (multi-distinct plans through Spark's Expand
  * with partial aggregation — no per-column scans), then a `stack`
  * projection melts the single stats row into rows. Profiling N columns
  * costs one scan regardless of N. */
object Profile {

  /** Profile the given columns (min/max rendered as strings so mixed
    * column types coexist in one frame; callers profiling timestamp or
    * double columns should note string rendering is engine-specific —
    * integral and string columns render identically everywhere).
    *
    * COST WARNING (exact form): Spark plans N `countDistinct`s in one
    * aggregate via Expand — every input row is REPLICATED ×(N+1) into
    * the partial aggregation, so profiling 10 columns of a 100 TB table
    * shuffles on the order of the table ×11. That is the right trade
    * for an oracle-checkable exact answer at test scale; for production
    * wide-table profiling use [[approxProfile]], whose HLL sketches
    * keep the pass Expand-free (one row in, one accumulator update per
    * column). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__nn"),
      countDistinct(col(c)).as(s"${c}__nd"),
      min(col(c)).cast("string").as(s"${c}__mn"),
      max(col(c)).cast("string").as(s"${c}__mx")))
    val one = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val stackExpr = s"stack(${cols.size}, " + cols.map(c =>
      s"'$c', __total - `${c}__nn`, `${c}__nd`, `${c}__mn`, `${c}__mx`").mkString(", ") +
      ") AS (column_name, n_nulls, n_distinct, min_val, max_val)"
    one.selectExpr(stackExpr).orderBy("column_name")
  }

  /** Production-shape profile: identical output schema to [[profile]]
    * but `n_distinct` is an HLL++ estimate (`approx_count_distinct`,
    * default rsd 5%). The plan has NO Expand — all per-column sketches
    * accumulate in a single partial-aggregation pass over each row, so
    * the shuffle carries one sketch row per partition instead of
    * (N+1)× the table. This is the variant to run on a 100 TB table. */
  def approxProfile(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__nn"),
      approx_count_distinct(col(c), rsd).as(s"${c}__nd"),
      min(col(c)).cast("string").as(s"${c}__mn"),
      max(col(c)).cast("string").as(s"${c}__mx")))
    val one = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val stackExpr = s"stack(${cols.size}, " + cols.map(c =>
      s"'$c', __total - `${c}__nn`, `${c}__nd`, `${c}__mn`, `${c}__mx`").mkString(", ") +
      ") AS (column_name, n_nulls, n_distinct, min_val, max_val)"
    one.selectExpr(stackExpr).orderBy("column_name")
  }
}

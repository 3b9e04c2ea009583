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
    * integral and string columns render identically everywhere). */
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
}

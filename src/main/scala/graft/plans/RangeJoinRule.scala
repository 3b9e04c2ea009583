package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{explode, floor, lit, sequence, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Catalyst optimizer rule: rewrite point-in-interval THETA joins to the
  * granule-bucketized equi-join [[graft.ext.RangeJoin]] builds by hand —
  * so plain SQL (`FROM points p JOIN ivals i ON p.ts >= i.s AND
  * p.ts < i.e`) gets the linear plan automatically instead of the
  * quadratic BroadcastNestedLoopJoin Spark falls back to when a join
  * has no equality conjunct.
  *
  * Soundness: for granule width G, `s ≤/< t` and `t </≤ e` imply
  * ⌊s/G⌋ ≤ ⌊t/G⌋ ≤ ⌊e/G⌋, so every qualifying pair meets in the
  * point's granule — exactly once, hence no dedup — and the ORIGINAL
  * conjuncts re-apply as the residual filter, preserving the query's
  * own strictness (BETWEEN's ≤ as much as the half-open <). The output
  * attribute list (ids and order) is pinned to the original join's via
  * a final Project, so parent operators are untouched.
  *
  * Scope guards (each bail-out keeps the original plan):
  *  - inner joins whose condition has NO equality conjunct (with one,
  *    Spark already picks a hash/merge strategy — the rewrite would
  *    only add work);
  *  - exactly one lower and one upper bound on the SAME timestamp
  *    attribute, bounds from the other side; extra conjuncts ride the
  *    residual filter;
  *  - t/s/e are bare TIMESTAMP/TIMESTAMP_NTZ attributes (the rewrite is
  *    assembled with the public DataFrame API but references the matched
  *    attributes directly, so duplicate names cannot mis-resolve it);
  *  - `spark.graft.rangeJoin.granuleSeconds` > 0 (default 3600; set 0
  *    to disable — tune toward the median interval length).
  *
  * Idempotent by construction: the rewritten join IS an equi-join on
  * the granule column, so the no-equality guard stops a second firing.
  */
class RangeJoinRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  val GranuleConf = "spark.graft.rangeJoin.granuleSeconds"

  private def granuleSeconds: Long =
    conf.getConfString(GranuleConf, "3600").toLong

  private def isTs(e: Expression): Boolean =
    e.dataType == TimestampType || e.dataType == TimestampNTZType

  /** Normalize a comparison conjunct to (small, large, isLower-ness is
    * decided by which operand is the point attr). */
  private def asOrdered(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(a, b) => Some((b, a)) // b <= a
    case GreaterThan(a, b)        => Some((b, a)) // b <  a
    case LessThanOrEqual(a, b)    => Some((a, b)) // a <= b
    case LessThan(a, b)           => Some((a, b)) // a <  b
    case _                        => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val g = try granuleSeconds catch { case _: NumberFormatException => 0L }
    if (g <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if j.resolved && !splitConjunctivePredicates(cond).exists(_.isInstanceOf[EqualTo]) =>
        rewrite(j, left, right, splitConjunctivePredicates(cond), g).getOrElse(j)
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      conjuncts: Seq[Expression], g: Long): Option[LogicalPlan] = {
    val ordered = conjuncts.flatMap(c => asOrdered(c).map(c -> _))
    // candidate (t, s): s ≤/< t with t an attr of one side, s of the other
    def attrOf(e: Expression): Option[Attribute] = e match {
      case a: Attribute if isTs(a) => Some(a)
      case _ => None
    }
    def sideOf(a: Attribute): Option[Boolean] =
      if (left.outputSet.contains(a)) Some(true)
      else if (right.outputSet.contains(a)) Some(false)
      else None

    val candidates = for {
      (_, (lo, t1)) <- ordered
      (_, (t2, hi)) <- ordered
      t <- attrOf(t1) if t2.semanticEquals(t1)
      s <- attrOf(lo); e <- attrOf(hi)
      tSide <- sideOf(t); sSide <- sideOf(s); eSide <- sideOf(e)
      if sSide == eSide && sSide != tSide
    } yield (t, s, e, tSide)
    candidates.headOption.map { case (t, s, e, tOnLeft) =>
      val (pointsPlan, ivalsPlan) = if (tOnLeft) (left, right) else (right, left)
      val pts = Bridge.ofRows(spark, pointsPlan)
      val ivs = Bridge.ofRows(spark, ivalsPlan)
      def granule(c: org.apache.spark.sql.Column) =
        floor(unix_micros(c.cast("timestamp")) / lit(g * 1000000L))
      // reference the matched attributes DIRECTLY (Bridge.column), so
      // duplicate column names anywhere in either input cannot
      // mis-resolve the rewrite
      val p = pts.withColumn("__graft_g", granule(Bridge.column(t)))
      val iv = ivs.withColumn("__graft_g",
        explode(sequence(granule(Bridge.column(s)), granule(Bridge.column(e)))))
      // using-join keeps both sides' original attribute ids; the
      // residual filter is the ORIGINAL condition, strictness intact
      val joined = p.join(iv, Seq("__graft_g")).drop("__graft_g")
      Project(j.output,
        Filter(conjuncts.reduce(And), joined.queryExecution.analyzed))
    }
  }
}

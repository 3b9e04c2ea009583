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
  * Fan-out safety — the HYBRID split: an interval explodes to its
  * granule count, which nothing bounds at plan time (an open-ended
  * sentinel like valid_to = 9999-12-31 is ~70M granules at the default
  * width). Intervals within `spark.graft.rangeJoin
  * .maxGranulesPerInterval` (default 256) take the equi-join; longer
  * ones keep a nested-loop branch; the union is exact because each
  * pair matches in exactly one branch (partitioned by the interval).
  *
  * Idempotent by construction: the equi-branch join has an equality
  * conjunct and the nested-loop branch is a CROSS join with the
  * condition in a Filter — neither shape matches the rule, so the
  * fixed-point batch stabilizes after one firing.
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

  /** Any equality conjunct — incl. null-safe `<=>` — means Spark already
    * has a hash/merge strategy; the rewrite would only add work. */
  private def hasEquality(conjuncts: Seq[Expression]): Boolean =
    conjuncts.exists {
      case _: EqualTo | _: EqualNullSafe => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val g = try granuleSeconds catch { case _: NumberFormatException => 0L }
    if (g <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if j.resolved && !hasEquality(splitConjunctivePredicates(cond)) &&
            // the rewrite reserves __graft_g; a colliding user column
            // would be clobbered by withColumn — bail out instead
            !(left.output ++ right.output).exists(_.name == "__graft_g") =>
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
      val gs = granule(Bridge.column(s))
      val ge = granule(Bridge.column(e))
      // HYBRID fan-out guard: an interval explodes to (ge − gs + 1)
      // rows, and nothing bounds that at plan time — an open-ended
      // sentinel interval (valid_to = 9999-12-31) would materialize
      // ~70M granules per row and OOM where the old nested loop merely
      // crawled. Intervals within the cap take the granule equi-join;
      // the (few) longer ones keep the original theta join — each pair
      // matches in exactly one branch (partitioned by the interval), so
      // the union is exact and both branches stay bounded.
      // span < 0 means ⌊e/G⌋ < ⌊s/G⌋, hence e < s (floor is monotone):
      // no t can satisfy s ≤/< t AND t </≤ e, so inverted intervals are
      // dropped from BOTH branches — exact, and it keeps sequence(gs, ge)
      // from materializing a huge descending granule array (an inverted
      // sentinel like [9999-12-31, 2026-01-01] would otherwise OOM).
      val span = ge - gs
      val p = pts.withColumn("__graft_g", granule(Bridge.column(t)))
      val ivShort = ivs.filter(span >= lit(0L) && span <= lit(maxGranules))
        .withColumn("__graft_g", explode(sequence(gs, ge)))
      val shortJoined = p.join(ivShort, Seq("__graft_g")).drop("__graft_g")
      // null bounds route here too: the residual condition drops them,
      // as the original nested loop would. crossJoin + Filter, NOT a
      // conditioned inner join: this batch runs to a FIXED POINT, and a
      // theta join here would match the rule again next iteration — a
      // cross join with the condition in a Filter above it executes
      // identically (nested loop) but can never re-fire the match.
      val ivLong = ivs.filter(span.isNull || span > lit(maxGranules))
      val longJoined = pts.crossJoin(ivLong)
        .filter(Bridge.column(conjuncts.reduce(And)))
      // POSITIONAL union, not unionByName: when the two join sides share
      // a column name (SELECT p.id, i.id …), both branches carry the
      // duplicate and unionByName throws COLUMN_ALREADY_EXISTS. Both
      // branches emit the identical [pts cols…, ivs cols…] order by
      // construction (using-join key dropped / crossJoin), so resolving
      // by position is exact and name-collision-proof.
      val joined = shortJoined.union(longJoined)
      // union output carries the first branch's (= original) attribute
      // ids; the residual filter is the ORIGINAL condition, strictness
      // intact
      Project(j.output,
        Filter(conjuncts.reduce(And), joined.queryExecution.analyzed))
    }
  }

  /** Max granules one interval may explode to on the equi-join branch;
    * longer intervals stay on the theta branch. */
  private def maxGranules: Long =
    try math.max(1L,
      conf.getConfString("spark.graft.rangeJoin.maxGranulesPerInterval", "256").toLong)
    catch { case _: NumberFormatException => 256L }
}

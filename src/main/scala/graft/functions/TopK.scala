package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k-by-score aggregation (SURVEY.md §7.3).
  *
  * `groupBy(q).agg(top_k(k)(id, score))` keeps at most ~2k candidates per
  * partial buffer, so partial aggregation (map-side combine) shrinks the
  * shuffle to O(groups × k) instead of O(rows) — the window-function
  * alternative (`row_number over (partition by q order by score desc)`)
  * shuffles EVERY scored row to its group's partition before discarding
  * all but k. At 100 TB that difference is the whole game.
  *
  * Determinism: ties broken by ascending id, identical to the window
  * formulation `orderBy(score.desc, id)`.
  */
object TopK {

  case class Scored(id: Long, score: Double)

  class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k > 0)
    private val cap = math.max(2 * k, 64) // amortize trims

    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    private def trim(buf: Seq[Scored], to: Int): Seq[Scored] =
      if (buf.length <= to) buf else buf.sortWith(better).take(to)

    override def zero: Seq[Scored] = Vector.empty
    override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] = {
      val appended = buf :+ in
      if (appended.length > cap) trim(appended, k) else appended
    }
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = trim(a ++ b, k)
    override def finish(buf: Seq[Scored]): Seq[Scored] = trim(buf, k).sortWith(better)
    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  }

  /** top_k(k)(id, score): array<struct<id,score>> sorted best-first. */
  def top_k(k: Int)(id: Column, score: Column): Column =
    udaf(new TopKAggregator(k), ExpressionEncoder[Scored]()).apply(id, score)

  case class StrScored(id: String, score: Double)

  /** [[TopKAggregator]] keyed by a STRING id (token/term workloads —
    * heavy hitters per group). Ties break by ascending id, identical to
    * the window formulation `orderBy(score.desc, id)`. */
  class TopKStrAggregator(k: Int)
      extends Aggregator[StrScored, Seq[StrScored], Seq[StrScored]] {
    require(k > 0)
    private val cap = math.max(2 * k, 64)

    private def better(a: StrScored, b: StrScored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    private def trim(buf: Seq[StrScored], to: Int): Seq[StrScored] =
      if (buf.length <= to) buf else buf.sortWith(better).take(to)

    override def zero: Seq[StrScored] = Vector.empty
    override def reduce(buf: Seq[StrScored], in: StrScored): Seq[StrScored] = {
      val appended = buf :+ in
      if (appended.length > cap) trim(appended, k) else appended
    }
    override def merge(a: Seq[StrScored], b: Seq[StrScored]): Seq[StrScored] = trim(a ++ b, k)
    override def finish(buf: Seq[StrScored]): Seq[StrScored] = trim(buf, k).sortWith(better)
    override def bufferEncoder: Encoder[Seq[StrScored]] = ExpressionEncoder[Seq[StrScored]]()
    override def outputEncoder: Encoder[Seq[StrScored]] = ExpressionEncoder[Seq[StrScored]]()
  }

  /** top_k_str(k)(id, score): array<struct<id,score>> sorted best-first. */
  def top_k_str(k: Int)(id: Column, score: Column): Column =
    udaf(new TopKStrAggregator(k), ExpressionEncoder[StrScored]()).apply(id, score)

  /** Bounded smallest-k over LONG ids, exact across the full 64-bit
    * range. The double-scored [[top_k]] with `score = -id` loses integer
    * exactness above 2^53 — hash-derived 64-bit ids would silently
    * collapse ties and reorder — so workloads selecting "the k smallest
    * ids" (bounded postings lists) get a dedicated long-ordered heap
    * with the same O(groups × k) map-side-combine shape. */
  class MinKIdAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k > 0)
    private val cap = math.max(2 * k, 64) // amortize trims

    private def trim(buf: Seq[Long], to: Int): Seq[Long] =
      if (buf.length <= to) buf else buf.sorted.take(to)

    override def zero: Seq[Long] = Vector.empty
    override def reduce(buf: Seq[Long], in: Long): Seq[Long] = {
      val appended = buf :+ in
      if (appended.length > cap) trim(appended, k) else appended
    }
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = trim(a ++ b, k)
    override def finish(buf: Seq[Long]): Seq[Long] = trim(buf, k).sorted
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** min_k_ids(k)(id): the k smallest ids, ascending, 64-bit exact. */
  def min_k_ids(k: Int)(id: Column): Column =
    udaf(new MinKIdAggregator(k), org.apache.spark.sql.Encoders.scalaLong).apply(id)
}

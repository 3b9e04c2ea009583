package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins — the second operator Spark famously lacks a
  * native physical strategy for (alongside the as-of join, see
  * [[graft.cdc.Versioned]]). A naive `t BETWEEN start AND end` join
  * plans as BroadcastNestedLoopJoin (or a per-key nested loop), which is
  * quadratic at scale.
  *
  * Spark-first shape — GRANULE BUCKETIZATION: quantize time into
  * fixed-width granules; points land in exactly one granule, intervals
  * explode to the granules they overlap, and the join becomes an
  * EQUI-join on (keys..., granule) with an exact residual filter. Cost
  * is linear in points + Σ interval-spans measured in granules: pick the
  * granule near the median interval length so typical intervals explode
  * to ~1-2 rows. Each (point, interval) pair meets in exactly one
  * granule (the point's), so no post-join dedup is needed.
  */
object RangeJoin {

  // `.cast("timestamp")` tolerates TIMESTAMP_NTZ inputs (parquet writers
  // may emit either); the session timezone is pinned to UTC by every
  // entrypoint, and only differences/buckets of the value are taken, so
  // the cast is semantics-preserving.
  private def granuleOf(t: Column, granuleSeconds: Long): Column =
    floor(unix_micros(t.cast("timestamp")) / lit(granuleSeconds * 1000000L))

  /** Join point rows to interval rows with `start <= t < end` (and equal
    * `keys`, if given). Every column of both inputs survives; intervals
    * may overlap arbitrarily — a point matches each interval covering
    * it. `granuleSeconds` tunes the explosion factor (≈ median interval
    * length). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      tCol: String, startCol: String, endCol: String,
                      granuleSeconds: Long = 3600L,
                      keys: Seq[String] = Nil): DataFrame = {
    require(granuleSeconds > 0)
    val p = points.withColumn("__g", granuleOf(col(tCol), granuleSeconds))
    val iv = intervals.withColumn("__g", explode(sequence(
      granuleOf(col(startCol), granuleSeconds),
      granuleOf(col(endCol), granuleSeconds))))
    p.join(iv, keys :+ "__g")
      .filter(col(tCol) >= col(startCol) && col(tCol) < col(endCol))
      .drop("__g")
  }

  /** Interval × interval overlap join: [s1, e1) overlaps [s2, e2) (and
    * equal `keys`, if given). Both sides explode to their granules; a
    * pair can share several granules, so the equi-join dedupes on the
    * provided row identifiers (one id column per side — bare-id
    * discipline, payloads rejoin afterwards if needed). */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      leftId: String, rightId: String,
                      leftStart: String, leftEnd: String,
                      rightStart: String, rightEnd: String,
                      granuleSeconds: Long = 3600L,
                      keys: Seq[String] = Nil): DataFrame = {
    require(granuleSeconds > 0)
    def exploded(df: DataFrame, s: String, e: String) =
      df.withColumn("__g", explode(sequence(
        granuleOf(col(s), granuleSeconds), granuleOf(col(e), granuleSeconds))))
    val l = exploded(left.select((leftId +: leftStart +: leftEnd +: keys).distinct.map(col): _*),
      leftStart, leftEnd)
    val r = exploded(right.select((rightId +: rightStart +: rightEnd +: keys).distinct.map(col): _*),
      rightStart, rightEnd)
    l.join(r, keys :+ "__g")
      .filter(col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd))
      .select(Seq(leftId, rightId).map(col): _*)
      .dropDuplicates(leftId, rightId)
  }
}

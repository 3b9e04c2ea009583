package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering so
  * parquet min/max statistics prune files and row groups on ANY of the
  * clustered columns, not just a single sort prefix.
  *
  * A plain `ORDER BY (a, b)` write makes `a`-filters surgical and
  * `b`-filters useless (every file spans all of `b`). Interleaving the
  * bits of per-column codes places rows so each file covers a small
  * RECTANGLE of the (a, b) space — a selective filter on either column
  * then touches a small fraction of files, which at 100 TB is the
  * difference between a scan and a seek (this is Delta/Iceberg
  * OPTIMIZE ZORDER, expressed with plain Spark shuffles and
  * expressions; nothing here is engine-private).
  *
  * Codes are EQUI-WIDTH buckets from a one-pass min/max aggregate —
  * deterministic, expression-only (`width_bucket`), and good enough for
  * layout (skewed columns trade some balance; the write's range
  * partitioner re-balances row counts per file regardless).
  */
object Layout {

  /** Morton interleave of `codes`, each an integer column in
    * [0, 2^bits): bit i of code j lands at output bit `i * n + j`.
    * Pure bit arithmetic — stays in whole-stage codegen. */
  def interleaveBits(codes: Seq[Column], bits: Int): Column = {
    require(codes.nonEmpty && bits > 0 && bits * codes.size <= 62)
    val n = codes.size
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      codes.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(shiftleft(
          shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j))
      }
    }
  }

  /** The Z-value column for `df` over numeric `cols`: per-column
    * equi-width bucket codes (one min/max pass over `df`), interleaved.
    * Constant columns code to 0. */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__min_$c"),
          max(col(c).cast("double")).as(s"__max_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val buckets = (1 << bits) - 1
    val codes = cols.zipWithIndex.map { case (c, i) =>
      val lo = r.getDouble(2 * i); val hi = r.getDouble(2 * i + 1)
      if (hi <= lo) lit(0L)
      // width_bucket is 1-based and returns n+1 at the upper edge
      else least(greatest(
        width_bucket(col(c).cast("double"), lit(lo), lit(hi), lit(buckets)) - 1,
        lit(0L)), lit(buckets.toLong - 1))
    }
    interleaveBits(codes, bits)
  }

  /** Write `df` clustered on the Z-curve over `cols`: range-partition by
    * z-value into `numFiles` output files, sort within each, write
    * parquet. Min/max stats on every clustered column become tight per
    * file/row-group. */
  def writeZordered(df: DataFrame, cols: Seq[String], path: String,
                    numFiles: Int = 64, bits: Int = 8): Unit =
    df.withColumn("__z", zvalue(df, cols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}

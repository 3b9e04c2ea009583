package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical output rendering for oracle-compared queries (SURVEY.md §2.4c).
  *
  * The driver's correctness gate hashes the *typed* values of the Spark
  * result (parquet) against the DuckDB oracle result. Types the two
  * engines render identically everywhere — utf8, int32/64, float64,
  * bool — hash stably; types with engine-specific physical variants do
  * not: Spark aggregates widen `DECIMAL(18,2)` to `decimal(28,2)` where
  * DuckDB widens to `DECIMAL(38,2)`, and Spark writes session-zoned
  * timestamps as INT96 (read back as ns) where DuckDB emits µs.
  *
  * So the LAST step of every oracled query projects ambiguous columns to
  * unambiguous ones, identically on both engines:
  *   - timestamp / timestamp_ntz → UTC ISO-8601 string, 6-digit µs;
  *   - date                      → `yyyy-MM-dd` string;
  *   - decimal(p,s)              → fixed-scale decimal string (exact —
  *     unlike a double cast, which would round `o_totalprice`'s
  *     full-precision values).
  * Each oracle SQL carries the matching strftime/CAST rendering; the
  * strict parity harness (`dev/check_parity.py`, arrow-type equality)
  * catches any drift between the two.
  */
object Canon {

  private def needsRender(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | DateType | _: DecimalType => true
    case _ => false
  }

  private def render(f: StructField): Column = f.dataType match {
    // native digit-writing kernel, byte-identical to
    // date_format(_, TsFmt) under the UTC session but ~10× cheaper
    // (no DateTimeFormatter in the per-row path)
    case TimestampType | TimestampNTZType =>
      graft.functions.VectorFunctions.iso_micros(col(f.name)).as(f.name)
    case DateType                         => date_format(col(f.name), "yyyy-MM-dd").as(f.name)
    case _: DecimalType                   => col(f.name).cast(StringType).as(f.name)
    case _                                => col(f.name)
  }

  /** Final projection: identity unless the frame has ambiguous columns.
    * A pure column-wise projection, so it preserves the query's ORDER BY.
    */
  def canonical(df: DataFrame): DataFrame =
    if (df.schema.fields.exists(f => needsRender(f.dataType))) {
      df.select(df.schema.fields.map(render).toIndexedSeq: _*)
    } else df

}

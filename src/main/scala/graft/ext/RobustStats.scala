package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (median/MAD) statistics — outlier detection that a handful of
  * corrupt extreme values cannot drag around, unlike the mean/stddev
  * z-score form (q71): median and MAD have breakdown point 0.5, so a
  * data-quality audit can trust them on exactly the dirty data it is
  * hunting.
  *
  * Exactness contract: values enter as INTEGER units (the caller scales,
  * e.g. cents = floor(price·100 + 0.5)) and every derived statistic is
  * kept in doubled integer units — `med2` = 2·median(v), `mad4` =
  * 4·MAD(v) — because an interpolated median of integers is either
  * integral or half-integral, so twice it is an exact long in BOTH
  * engines (Spark `percentile` ≡ DuckDB `quantile_cont`, hash-proven by
  * q42). The outlier test |v − median| > k·MAD is evaluated as
  * 2·dev2 > k·mad4 over longs — no float comparison anywhere.
  *
  * Scale shape: three aggregation passes over the fact (median → MAD →
  * flag/count), each a plain hash aggregate keyed by the group; the
  * per-group statistic frames are tiny and join back via broadcast (AQE
  * sizes them at runtime — no hint needed). Robust statistics genuinely
  * need the extra passes (MAD is a median OF deviations from a median);
  * the approximate single-pass alternative is `approx_percentile`, which
  * trades the exactness contract away.
  */
object RobustStats {

  /** Per-group robust outlier accounting over integer-unit `valueCol`:
    * (group, n_rows, n_outliers, med2, mad4) where an outlier is a row
    * with |v − median| > k·MAD.
    *
    * Precision bound: `percentile()` computes in DOUBLE, so the
    * "exact long" contract for med2/mad4 holds only while
    * |2·median| < 2^53 (and |4·MAD| < 2^53) — ample for cents- or
    * microunit-scale values, but callers scaling arbitrary integers to
    * finer units must keep the doubled statistic under 2^53 or the
    * low bits of med2/mad4 are rounding, not data. */
  def madOutlierStats(df: DataFrame, groupCol: String, valueCol: Column,
                      k: Int = 3): DataFrame = {
    require(k > 0)
    val base = df.select(col(groupCol).as("g"), valueCol.cast("long").as("v"))
    // the per-group statistic frames are O(groups) rows but their SUBTREES
    // each scan the fact — materialize them eagerly or Spark re-evaluates
    // the median subtree inside the MAD pass and both inside the final
    // pass (~5 fact scans instead of 3; measured 1.9x on q95)
    val med = base.groupBy("g")
      .agg((expr("percentile(v, 0.5)") * 2).cast("long").as("med2"))
      .localCheckpoint(true)
    // explicit broadcast: the checkpointed frames are O(groups) rows by
    // construction but Catalyst can no longer see their size (RDD scans
    // report the default size, which would plan a sort-merge join)
    val dev = base.join(broadcast(med), "g")
      .withColumn("dev2", abs(col("v") * 2 - col("med2")))
    val mad = dev.groupBy("g")
      .agg((expr("percentile(dev2, 0.5)") * 2).cast("long").as("mad4"))
      .localCheckpoint(true)
    dev.join(broadcast(mad), "g")
      .groupBy(col("g").as(groupCol), col("med2"), col("mad4"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("dev2") * 2 > col("mad4") * k, 1L).otherwise(0L))
          .as("n_outliers"))
      .select(groupCol, "n_rows", "n_outliers", "med2", "mad4")
  }
}

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

  /** Deterministic sample quantiles — the 100 TB quantile path. An
    * exact corpus-wide percentile needs every value in one agg buffer;
    * the usual fix, `approx_percentile`, is merge-order-dependent (its
    * GK summary depends on partitioning, so two runs can disagree —
    * unacceptable under this engine's reproducibility contract). This
    * operator instead takes the k rows with the SMALLEST value of a
    * public multiplicative hash of the row key — a partitioning-
    * independent pseudo-random sample any engine reproduces — and
    * computes exact interpolated quantiles over it.
    *
    * Error bound: a k-row uniform sample puts the p-quantile estimate
    * within O(sqrt(p(1-p)/k)) rank error with high probability
    * (DKW inequality) — k = 1000 gives ~±1.6 rank points at p = 0.5.
    *
    * Scale shape: the bottom-k is a TakeOrdered (per-partition bounded
    * heap, O(n) scan + O(k log k) merge — never a global sort); the
    * quantile computation sees exactly k rows. The hash is the same
    * Knuth multiplicative form as q57/q77 (`(key % 1000003) ·
    * 2654435761 mod 1000000007`) so SQL engines reproduce the sample
    * without xxhash; ties (hash collisions) break on the raw key,
    * making the sample a total-order prefix in both engines.
    *
    * Output: one row per requested probability — (p, q), where q uses
    * the same linear interpolation as `percentile`/`quantile_cont`
    * (bit-stable across engines, hash-proven by q42). */
  /** Exact LOWER weighted median per group: the smallest value v with
    * 2·cumweight(≤ v) ≥ totalweight — the duration-weighted-latency /
    * token-weighted-doc-stat aggregate, under the integer rule (no
    * interpolation, no float comparison) so any engine reproduces it
    * bit-for-bit from integral values and weights.
    *
    * Scale shape: rows collapse to the (group, value) DISTINCT frame
    * first (one map-side-combinable weight sum — everything after ranks
    * distinct values, not rows, typically orders of magnitude smaller).
    * The cumulative walk is a BUCKETED per-group prefix sum, not a
    * window partitioned only by group: near-unique values make the
    * collapsed frame nearly as big as the input, and `partitionBy(g)`
    * alone drags each group through ONE task (3 tasks total for 3
    * return flags — the hot-group trap). Instead the frame
    * range-partitions on (g, v), per-(g, bucket) weight totals prefix-
    * scan in a window over that TINY totals frame (groups × buckets
    * rows, no driver round trip), and each bucket computes its own
    * in-bucket running sum in parallel plus its group-prefix offset —
    * the same staged discipline as [[graft.ext.Sharding.ntileExact]].
    * The pick is a conditional min. Cum values are identical integers
    * regardless of where range boundaries land, so the result is
    * partitioning-independent. Output: (group, n_values, total_w,
    * wmedian). */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: Column,
                     weightCol: Column, numBuckets: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gv = df
      .select(col(groupCol).as("g"), valueCol.cast("long").as("v"),
        weightCol.cast("long").as("w"))
      .groupBy("g", "v").agg(sum("w").as("w"))
    val ranged = (if (numBuckets > 0) gv.repartitionByRange(numBuckets, col("g"), col("v"))
                  else gv.repartitionByRange(col("g"), col("v")))
      .withColumn("__rb", spark_partition_id())
      .persist()
    // per-(group, bucket) totals: a tiny frame (groups × buckets rows);
    // the exclusive group-prefix over buckets and the group total are
    // windows over IT, broadcast back — never over the value frame
    val off = ranged.groupBy("g", "__rb").agg(sum("w").as("__bs"))
      .withColumn("__off", coalesce(
        sum(col("__bs")).over(Window.partitionBy("g").orderBy("__rb")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__tot", sum(col("__bs")).over(Window.partitionBy("g")))
      .select("g", "__rb", "__off", "__tot")
    val win = Window.partitionBy("g", "__rb").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = ranged
      .join(broadcast(off), Seq("g", "__rb"))
      .withColumn("__cum", sum(col("w")).over(win) + col("__off"))
      .groupBy(col("g").as(groupCol))
      .agg(count(lit(1)).as("n_values"),
        max(col("__tot")).as("total_w"),
        min(when(col("__cum") * 2 >= col("__tot"), col("v"))).as("wmedian"))
    try out.localCheckpoint(true)
    finally ranged.unpersist(false)
  }

  /** Per-group winsorization: clamp an integer-valued metric to its
    * group's exact discrete [loPct, hiPct] quantiles — the robust
    * normalization applied to quality/length scores before they feed a
    * sampling weight or a mixing temperature, where a handful of
    * pathological outliers (a 500 MB "document", a 0-char stub) would
    * otherwise own the scale. Discrete (`quantile_disc`) on purpose:
    * the bound is an actual observed value picked by integer rank
    * arithmetic — rank = (n−1)·pct div 100 + 1 over the (value, id)
    * order — so ANY engine reproduces the clamp bit-for-bit; an
    * interpolated bound would reintroduce float averaging.
    *
    * Scale shape: the quantile never sorts the corpus — values collapse
    * to a (group, value) HISTOGRAM via one map-side-combinable count
    * (bounded by distinct values, not rows), the cumulative walk and
    * the rank pick are windows over that tiny frame, and the per-group
    * (lo, hi) bounds broadcast back onto the fact for a map-only clamp.
    * A hot group costs ONE reducer row per distinct value, never a
    * per-group sort of its rows.
    *
    * Output: one row per input row — (idCol, group, v, lo, hi,
    * winsorized). */
  def winsorize(df: DataFrame, groupCol: String, valueCol: Column,
                idCol: String, loPct: Int = 5, hiPct: Int = 95): DataFrame = {
    require(0 <= loPct && loPct <= hiPct && hiPct <= 100,
      s"bad winsorize percentiles [$loPct, $hiPct]")
    import org.apache.spark.sql.expressions.Window
    val fact = df.select(col(idCol).as("id"), col(groupCol).as("g"),
      valueCol.cast("long").as("v"))
    val hist = fact.groupBy("g", "v").agg(count(lit(1)).as("__c"))
    val cumW = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(cumW))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy("g")))
    // discrete quantile: the ((n−1)·pct div 100 + 1)-th value in the
    // sorted multiset = min value whose cumulative count reaches it
    // (`div`, not Column./ — that is double division, lossy over 2^53)
    def pick(pct: Int): Column =
      min(when(col("__cum") >= expr(s"(__n - 1) * $pct div 100 + 1"), col("v")))
    val bounds = cum.groupBy("g")
      .agg(pick(loPct).as("lo"), pick(hiPct).as("hi"))
    fact.join(broadcast(bounds), "g")
      .select(col("id").as(idCol), col("g").as(groupCol), col("v"),
        col("lo"), col("hi"),
        least(greatest(col("v"), col("lo")), col("hi")).as("winsorized"))
  }

  /** Per-group ECDF normalization: each row's value maps to its exact
    * within-group percentile rank, pct_micro = ⌊#{v' ≤ v} · 10⁶ / n⌋ —
    * the transform that makes a quality score COMPARABLE across sources
    * whose raw scales differ (rank 0.9 means "top decile of its own
    * source" regardless of how that source's scorer is calibrated),
    * the standard pre-step before cross-source mixing weights. Pure
    * integer arithmetic (a cumulative count, a multiply, a floor
    * division) — any engine reproduces every rank bit-for-bit.
    *
    * Scale shape ([[winsorize]]'s skeleton): the ECDF is the (group,
    * value) histogram's cumulative walk — one map-side-combinable
    * count, windows only over that value-grain frame — and ranks
    * attach to the fact by a broadcast (group, value) equi-join; no
    * corpus sort, no per-row window, hot groups cost one reducer row
    * per distinct value. */
  def ecdfNormalize(df: DataFrame, groupCol: String, valueCol: Column,
                    idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fact = df.select(col(idCol).as("id"), col(groupCol).as("g"),
      valueCol.cast("long").as("v"))
    val hist = fact.groupBy("g", "v").agg(count(lit(1)).as("__c"))
    val cumW = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranks = hist
      .withColumn("__cum", sum(col("__c")).over(cumW))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy("g")))
      .select(col("g"), col("v"),
        expr("__cum * 1000000 div __n").as("pct_micro"))
    fact.join(broadcast(ranks), Seq("g", "v"))
      .select(col("id").as(idCol), col("g").as(groupCol), col("v"),
        col("pct_micro"))
  }

  def sampleQuantiles(df: DataFrame, keyCol: Column, valueCol: Column,
                      probs: Seq[Double], k: Int = 1000): DataFrame = {
    require(k > 0 && probs.nonEmpty)
    val sample = df
      .select(valueCol.cast("double").as("v"), keyCol.cast("long").as("__key"))
      .withColumn("__h",
        pmod((col("__key") % 1000003L) * 2654435761L, lit(1000000007L)))
      .orderBy("__h", "__key").limit(k)
    sample
      .agg(expr(s"percentile(v, array(${probs.mkString(", ")}))").as("__qs"))
      .select(posexplode(col("__qs")).as(Seq("__i", "q")))
      .select((element_at(typedlit(probs), col("__i") + 1)).as("p"), col("q"))
  }
}

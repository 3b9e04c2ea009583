package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distinct-count sketching with an AUDITABLE register artifact.
  *
  * K-minimum-values (bottom-k): per group keep the k smallest hash values
  * of the keys; the k-th smallest, as a fraction of hash space, estimates
  * density, so `distinct ≈ (k-1) / U_k` (Bar-Yossef et al. 2002 — the
  * same estimator family as Apache DataSketches' theta sketch). Chosen
  * over HLL for the engine's gate surface because every step AFTER the
  * hash is exact integer arithmetic — `(k-1)·2^64 div u_k` in
  * DECIMAL(38,0)/HUGEINT — and groups with fewer than k distinct hashes
  * are EXACT by construction. That makes the whole estimation path
  * independently recomputable from a dumped register table (the q32/q24
  * oracle pattern: the dump boundary is the non-SQL-expressible hash
  * kernel; everything downstream is oracled), where an HLL estimate's
  * bias-correction tables and ln() branches are not.
  *
  * Register semantics: xxhash64 values XOR Long.MinValue, so SIGNED
  * order on the stored register equals UNSIGNED order on the raw hash;
  * `u_k = register_k + 2^63` recovers the unsigned magnitude.
  *
  * Scale shape: one (group, hash) dedup hash-agg, then the bounded
  * min-k heap aggregator (map-side-combining partials, O(k) state per
  * group) — registers merge by union+recut, so the sketch is
  * partitioning-independent and streaming-mergeable. Relative error
  * ~1/√(k−2) above k distinct; exact below.
  */
object Sketches {

  /** Per-group bottom-k register table: (group, mins) with `mins` the
    * ascending k smallest transformed hashes of DISTINCT `valueCol`
    * values. This frame IS the sketch artifact — dumpable, mergeable,
    * and the sole input `estimate` needs besides k. */
  def kmvRegisters(df: DataFrame, groupCol: String, valueCol: Column,
                   k: Int = 128): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    df.select(col(groupCol).as("__g"),
        xxhash64(valueCol).bitwiseXOR(lit(Long.MinValue)).as("__xh"))
      .distinct()
      .groupBy("__g")
      .agg(graft.functions.TopK.min_k_ids(k)(col("__xh")).as("mins"))
      .select(col("__g").as(groupCol), col("mins"))
  }

  /** (group, approx_distinct BIGINT) from a register table. Exact when
    * the group held fewer than k distinct hashes; otherwise the KMV
    * estimate `(k-1)·2^64 div u_k`, computed end-to-end in integer
    * arithmetic (`div` = IntegralDivide over DECIMAL — truncating, like
    * the oracle's HUGEINT division; no float anywhere, so the estimate
    * hash-matches any engine that can divide integers). */
  def estimate(registers: DataFrame, groupCol: String, k: Int = 128,
               outCol: String = "approx_distinct"): DataFrame =
    registers
      .withColumn("__uk", element_at(col("mins"), k).cast(DecimalType(38, 0)) +
        lit("9223372036854775808").cast(DecimalType(38, 0)))
      .withColumn("__num", lit((k - 1).toLong).cast(DecimalType(38, 0)) *
        lit("18446744073709551616").cast(DecimalType(38, 0)))
      .withColumn(outCol,
        when(size(col("mins")) < k, size(col("mins")).cast("long"))
          .otherwise(expr("__num div __uk")))
      .select(col(groupCol), col(outCol))

  /** One-call convenience: per-group approximate distinct count of
    * `valueCol`. */
  def approxDistinct(df: DataFrame, groupCol: String, valueCol: Column,
                     k: Int = 128, outCol: String = "approx_distinct"): DataFrame =
    estimate(kmvRegisters(df, groupCol, valueCol, k), groupCol, k, outCol)

  /** Pairwise cross-group overlap estimated WITHOUT any cross-group
    * join of the underlying values — the "how much does source A overlap
    * source B" audit (corpus provenance, crawl-snapshot dedup planning)
    * that at 100 TB cannot afford |A|×|B| work. KMV sketches compose:
    * the union sketch of two groups is merge + recut of their bottom-k
    * registers (Bar-Yossef et al. 2002; the DataSketches theta-union),
    * so |A∪B| estimates from the merged registers, |A∩B| by
    * inclusion-exclusion, and Jaccard as their ratio.
    *
    * All register algebra is SQL array functions (sort, distinct,
    * element_at) and the estimates integer arithmetic — groups smaller
    * than k are EXACT — so an independent engine recomputes the entire
    * matrix from the dumped register table in HUGEINT. `jaccard` is the
    * IEEE division of the two exact BIGINT estimates (correctly rounded,
    * engine-identical). Output: one row per unordered group pair.
    *
    * Scale shape: the register table is O(groups × k) — the pairwise
    * self-join is over SKETCHES, never data; groups² pairs of 1 KB
    * registers is driver-trivial for thousands of groups. */
  def overlapMatrix(registers: DataFrame, groupCol: String, k: Int = 128): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    val a = registers.select(col(groupCol).as("group_a"), col("mins").as("__ma"))
    val b = registers.select(col(groupCol).as("group_b"), col("mins").as("__mb"))
    // sorted ascending = unsigned order on raw hashes (the XOR transform);
    // no recut needed — the estimator reads only element k and the size
    val merged = array_sort(array_distinct(concat(col("__ma"), col("__mb"))))
    a.join(b, col("group_a") < col("group_b"))
      .withColumn("__mu", merged)
      .withColumn("__ea", kmvEstimate(col("__ma"), k))
      .withColumn("__eb", kmvEstimate(col("__mb"), k))
      .withColumn("union_est", kmvEstimate(col("__mu"), k))
      .withColumn("inter_est",
        greatest(lit(0L), col("__ea") + col("__eb") - col("union_est")))
      .withColumn("jaccard",
        when(col("union_est") > 0,
          col("inter_est").cast("double") / col("union_est").cast("double"))
          .otherwise(lit(0.0)))
      .select(col("group_a"), col("group_b"),
        col("__ea").as("distinct_a"), col("__eb").as("distinct_b"),
        col("union_est"), col("inter_est"), col("jaccard"))
  }

  /** Exact frequency-threshold heavy hitters WITHOUT shuffling the full
    * key space: all values occurring in at least `minFreq` of the rows,
    * with exact counts. A plain `groupBy(value).count()` moves every
    * distinct key through the exchange — for token-grain corpus
    * frequency (stopword lists, tokenizer seeding, boilerplate
    * detection) that is the whole vocabulary; here only CANDIDATES do.
    *
    * Two passes:
    *  1. per-partition Misra–Gries summaries with k = ⌈2/minFreq⌉
    *     counters: any value with global count > n/k must exceed its
    *     share in some partition, so the UNION of per-partition
    *     candidate sets (≤ k × partitions keys, ≪ vocabulary) provably
    *     contains every value at ≥ minFreq — classic MG amortization
    *     makes the pass O(rows);
    *  2. exact recount of candidate rows only (the candidate set
    *     broadcasts; the map-side-combinable recount shuffles
    *     O(candidates)), then the ≥ ⌈n·minFreq⌉ cut.
    *
    * The MG summaries vary with partitioning; the OUTPUT does not — the
    * threshold cut over exact recounts is a pure function of the data
    * (the candidate superset property holds under any split), so any
    * engine reproduces it from the definition. Output: (value, cnt). */
  def heavyHitters(df: DataFrame, valueCol: Column, minFreq: Double): DataFrame = {
    require(minFreq > 0 && minFreq < 1, s"minFreq must be in (0,1), got $minFreq")
    val spark = df.sparkSession
    import spark.implicits._
    val k = math.max(2, math.ceil(2.0 / minFreq).toInt)
    val vals = df.select(valueCol.cast("string").as("v")).as[String]
    val n = vals.count()
    val minCount = math.ceil(n * minFreq).toLong
    val candidates = vals.mapPartitions { it =>
      val m = new scala.collection.mutable.HashMap[String, Long]()
      it.foreach { v =>
        if (v != null) {
          m.get(v) match {
            case Some(c) => m.update(v, c + 1)
            case None if m.size < k => m.update(v, 1L)
            case None => // decrement-all: amortized O(1) per row
              m.toArray.foreach { case (key, c) =>
                if (c == 1L) m.remove(key) else m.update(key, c - 1) }
          }
        }
      }
      m.keysIterator
    }.toDF("v").distinct()
    vals.toDF("v")
      .join(broadcast(candidates), Seq("v")) // semi-shaped: cuts pre-shuffle
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(col("v").as("value"), col("cnt"))
  }

  /** [[estimate]]'s estimator over a bare register array column. */
  private[ext] def kmvEstimate(mins: Column, k: Int): Column = {
    val uk = element_at(mins, k).cast(DecimalType(38, 0)) +
      lit("9223372036854775808").cast(DecimalType(38, 0))
    val num = lit((k - 1).toLong).cast(DecimalType(38, 0)) *
      lit("18446744073709551616").cast(DecimalType(38, 0))
    when(size(mins) < k, size(mins).cast("long"))
      .otherwise(call_function("div", num, uk).cast("long"))
  }
}

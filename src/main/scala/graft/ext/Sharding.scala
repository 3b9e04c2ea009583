package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus → training-shard engineering: sequence packing under a token
  * budget and deterministic train/val/test splits. Both are the ops a
  * pipeline runs LAST, right before writing shards — so both are exact,
  * reproducible, and cheap relative to the write they precede.
  */
object Sharding {

  /** Greedy sequence packing: walking documents in `idCol` order, each
    * doc's shard is `floor(tokens-before-it / budget)` — shards fill to
    * the budget and may overflow by at most one document (the standard
    * greedy semantic; a doc never splits).
    *
    * Scale shape — a DISTRIBUTED PREFIX SUM, not a global window (a
    * single `Window.orderBy` with no partition pulls the corpus through
    * one task): range-repartition on the order key (contiguous buckets),
    * per-bucket token totals collect to the driver (≤ #buckets rows),
    * the driver prefix-scans them into per-bucket offsets, and each
    * bucket computes its own cumulative sum in parallel plus its offset.
    * The bucketed frame is persisted so the offsets and the final pass
    * see the SAME range boundaries, and released before returning (the
    * result is eagerly checkpointed — this op immediately precedes a
    * shard write, so materialization is the point). */
  def packShards(docs: DataFrame, idCol: String, tokenCol: String,
                 budget: Long, numBuckets: Int = 0): DataFrame =
    packShardsStaged(docs, idCol, tokenCol, budget, numBuckets) match {
      case None => docs.withColumn("shard", lit(0L)).limit(0) // empty corpus
      case Some((out, ranged)) =>
        try out.localCheckpoint(true)
        finally ranged.unpersist(false)
    }

  /** [[packShards]] before its eager checkpoint: (lazy result, the
    * persisted bucketed frame the caller must unpersist). Exposed so
    * plan-shape tests can assert the window is bucket-partitioned —
    * the public method materializes, which collapses the plan. */
  private[graft] def packShardsStaged(docs: DataFrame, idCol: String, tokenCol: String,
                                      budget: Long, numBuckets: Int)
      : Option[(DataFrame, DataFrame)] = {
    require(budget > 0, "token budget must be positive")
    globalCumStaged(docs, idCol, tokenCol, numBuckets).map { case (cum, ranged) =>
      (cum.withColumn("shard", floor(col("__cum") / budget)).drop("__cum"), ranged)
    }
  }

  /** The shared distributed-prefix-sum stage: `docs` plus an exclusive
    * global running total `__cum` of `tokenCol` in `idCol` order (range
    * buckets + driver prefix scan + per-bucket windows — see
    * [[packShards]]'s scale note). Some((frame with `__cum`, the
    * persisted bucketed frame the CALLER must unpersist)); None on an
    * empty corpus. */
  private[graft] def globalCumStaged(docs: DataFrame, idCol: String, tokenCol: String,
                                     numBuckets: Int)
      : Option[(DataFrame, DataFrame)] = {
    val ranged = (if (numBuckets > 0) docs.repartitionByRange(numBuckets, col(idCol))
                  else docs.repartitionByRange(col(idCol)))
      .withColumn("__rb", spark_partition_id())
      .persist()
    val totals = ranged.groupBy("__rb").agg(sum(col(tokenCol)).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (totals.isEmpty) { ranged.unpersist(false); return None }
    val ids = totals.keys.toArray.sorted
    // exclusive prefix: tokens in all earlier buckets; attached via a
    // tiny broadcast join (a folded CASE expression would grow one
    // branch per bucket and fall out of codegen at high bucket counts)
    val spark = docs.sparkSession
    import spark.implicits._
    val offsets = ids.zip(ids.scanLeft(0L)((acc, b) => acc + totals(b)))
      .toSeq.toDF("__rb", "__off")
    val w = Window.partitionBy("__rb").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = ranged
      .join(broadcast(offsets), "__rb")
      .withColumn("__cum",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)) + col("__off"))
      .drop("__rb", "__off")
    Some((out, ranged))
  }

  /** GPT-style sequence packing (concat-and-chop): documents laid
    * end-to-end in `idCol` order form one global token stream, chopped
    * into fixed `seqLen`-token training sequences; a document crossing a
    * boundary SPLITS across the two sequences (how pretraining batches
    * are actually built — no padding waste, every sequence except the
    * last exactly full). Contrast [[packShards]]: there a doc never
    * splits and shards overflow; here sequences never overflow and docs
    * split. Output: one row per document × sequence it overlaps —
    * (`idCol`, `tokenCol`, seq_id, doc_off, seq_off, span_len), i.e.
    * tokens [doc_off, doc_off+span_len) of the doc land at
    * [seq_off, seq_off+span_len) of sequence seq_id. Pure integer
    * arithmetic on the exclusive prefix sum, so any engine reproduces
    * the layout bit-for-bit.
    *
    * Scale shape: the same distributed prefix sum as [[packShards]]
    * (range buckets + driver scan of ≤ #buckets totals + per-bucket
    * windows), then a map-only explode bounded by tokens/seqLen + 1
    * rows per doc — no further shuffle. */
  def packSequences(docs: DataFrame, idCol: String, tokenCol: String,
                    seqLen: Long, numBuckets: Int = 0): DataFrame = {
    require(seqLen > 0, "sequence length must be positive")
    globalCumStaged(docs, idCol, tokenCol, numBuckets) match {
      case None =>
        docs.select(col(idCol), col(tokenCol))
          .withColumn("seq_id", lit(0L)).withColumn("doc_off", lit(0L))
          .withColumn("seq_off", lit(0L)).withColumn("span_len", lit(0L))
          .limit(0)
      case Some((cum, ranged)) =>
        val first = expr(s"__cum div $seqLen")
        val last = expr(s"(__cum + $tokenCol - 1) div $seqLen")
        val out = cum
          .filter(col(tokenCol) > 0)
          .withColumn("seq_id", explode(sequence(first, last)))
          .withColumn("doc_off",
            greatest(lit(0L), col("seq_id") * seqLen - col("__cum")))
          .withColumn("span_len",
            least(col(tokenCol), (col("seq_id") + 1) * seqLen - col("__cum")) -
              col("doc_off"))
          .withColumn("seq_off",
            col("__cum") + col("doc_off") - col("seq_id") * seqLen)
          .select(col(idCol), col(tokenCol), col("seq_id"), col("doc_off"),
            col("seq_off"), col("span_len"))
        try out.localCheckpoint(true)
        finally ranged.unpersist(false): Unit
    }
  }

  /** Best-fit-decreasing bin packing within id-range buckets — the
    * padding-minimizing shard builder (docs never split; bins never
    * overflow, so `capacity − load` is real padding). Within each
    * bucket, docs sort by (tokens desc, id asc) and each goes to the
    * FULLEST bin that still fits (ties → lowest bin index; no fit → a
    * new bin, which also handles oversized docs: a doc longer than the
    * capacity sits alone and never receives a neighbor). Contrast
    * [[packShards]] (q55): that walks id order and lets shards
    * overflow; BFD trades the id-contiguity for measurably less
    * padding (Ding et al. 2024 use exactly this placement for
    * training-sequence packing).
    *
    * Scale shape: global BFD is INHERENTLY SEQUENTIAL (every placement
    * depends on all previous loads), so the scale unit is the id-range
    * BUCKET — `floor(id / bucketSize)` — packed exactly and
    * independently in parallel, one shuffle on the bucket key, per-task
    * memory bounded by `bucketSize` docs BY CONSTRUCTION. The bucket
    * boundary is the explicit approximation knob: padding approaches
    * global-BFD's as buckets grow, parallelism as they shrink. Pure
    * integer state and total orders throughout, so a sequential replay
    * reproduces every placement bit-for-bit (the q199 oracle re-runs
    * the whole fold in SQL).
    *
    * Deliberately NOT a maintained store (the round-14 decision,
    * SURVEY §2.4): packing assignments are not additive state — one
    * arriving doc can legally re-open any bin in its bucket, so an
    * "incremental" variant either re-packs the bucket (which is this
    * operator: buckets are independent, so re-packing touched buckets
    * per shard build IS the incremental algorithm) or drifts from the
    * exact-BFD semantics the oracle replays. A shard layout is an
    * artifact of one dataset snapshot; stable shard ids across corpus
    * growth are an anti-goal (epoch shuffling re-keys them anyway).
    *
    * Output: (`idCol`, `tokenCol`, bucket, bin) — bin is 1-based within
    * its bucket. */
  def bfdPack(docs: DataFrame, idCol: String, tokenCol: String,
              capacity: Long, bucketSize: Long): DataFrame =
    binPackBuckets(docs, idCol, tokenCol, capacity, bucketSize,
      bestFitDecreasing = true)

  /** First-fit packing in id order over the same bucketed kernel — the
    * baseline [[bfdPack]] is measured against (same bins-never-overflow
    * semantic, same bucketing; placement = the FIRST bin that fits
    * walking bin indices, arrival = plain id order). The bench artifact
    * reports the padded-token delta between the two. */
  def ffPack(docs: DataFrame, idCol: String, tokenCol: String,
             capacity: Long, bucketSize: Long): DataFrame =
    binPackBuckets(docs, idCol, tokenCol, capacity, bucketSize,
      bestFitDecreasing = false)

  private def binPackBuckets(docs: DataFrame, idCol: String, tokenCol: String,
                             capacity: Long, bucketSize: Long,
                             bestFitDecreasing: Boolean): DataFrame = {
    require(capacity > 0, "bin capacity must be positive")
    require(bucketSize > 0, "bucket size must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(tokenCol).cast("long"))
      .as[(Long, Long)]
      .groupByKey { case (id, _) => Math.floorDiv(id, bucketSize) }
      .flatMapGroups { (bucket: Long, it: Iterator[(Long, Long)]) =>
        // bounded by bucketSize docs by construction (id-range bucket)
        val items = it.toArray
        val ordered =
          if (bestFitDecreasing) items.sortBy { case (id, t) => (-t, id) }
          else items.sortBy(_._1)
        val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
        ordered.iterator.map { case (id, t) =>
          var pick = -1
          var i = 0
          if (bestFitDecreasing) {
            // fullest fitting bin; strict > keeps the LOWEST index on ties
            while (i < loads.length) {
              if (loads(i) + t <= capacity &&
                  (pick < 0 || loads(i) > loads(pick))) pick = i
              i += 1
            }
          } else {
            while (pick < 0 && i < loads.length) {
              if (loads(i) + t <= capacity) pick = i
              i += 1
            }
          }
          if (pick < 0) { loads += t; pick = loads.length - 1 }
          else loads(pick) += t
          (id, t, bucket, (pick + 1).toLong)
        }
      }
      .toDF(idCol, tokenCol, "bucket", "bin")
  }

  /** Padding accounting for a [[bfdPack]]/[[ffPack]] assignment: bins
    * opened, padded tokens (capacity − load, floored at 0 for the
    * oversized-doc bins), and the token total — the three numbers a
    * packing strategy is judged by. One aggregation, one row. */
  def packingWaste(assign: DataFrame, capacity: Long,
                   tokenCol: String = "n_tokens"): DataFrame =
    assign.groupBy("bucket", "bin")
      .agg(sum(tokenCol).as("load"))
      .agg(count(lit(1)).as("n_bins"),
        sum(greatest(lit(0L), lit(capacity) - col("load"))).as("padded_tokens"),
        sum(col("load")).as("token_total"))

  /** Deterministic global training-order shuffle: a seeded
    * pseudo-random permutation of the corpus — each row's epoch position
    * is its rank under (knuth-hash(id, seed), id) — cut into fixed-size
    * shards in permuted order. The step between packing (q118) and the
    * shard write: an epoch's read order must be (a) decorrelated from
    * document order (adjacent ids are near-duplicate crawl neighbors —
    * reading in id order is curriculum by accident), (b) different per
    * epoch (vary `seed`), and (c) exactly reproducible for resumable
    * training — which rules out RNG state and engine-specific hashes.
    * The hash is the same public Knuth multiplicative residue as
    * [[splitBucket]] (64-bit-safe: residue < 1e6+seed, × 2654435761
    * stays ≪ 2^63), so any engine replays the permutation bit-for-bit.
    *
    * Output: (`idCol`, shuffle_key, epoch_pos 0-based, shard).
    *
    * Scale shape: the same distributed global rank as [[ntileExact]] —
    * range-repartition on (hash, id), per-bucket counts collect to the
    * driver (≤ #buckets rows), exclusive offsets broadcast back, each
    * bucket ranks its own rows in parallel (every window is
    * bucket-partitioned; a bare `row_number() OVER (ORDER BY hash)`
    * pulls the corpus through ONE task). Shard assignment is then pure
    * integer `div`. */
  def epochShuffle(docs: DataFrame, idCol: String, seed: Long,
                   shardSize: Long, numBuckets: Int = 0): DataFrame = {
    require(shardSize > 0, "shard size must be positive")
    require(seed >= 0 && seed <= 2000000000L,
      "seed must be in [0, 2e9] (64-bit overflow guard: (residue + seed) * 2654435761 < 2^63)")
    val key = pmod((pmod(col(idCol), lit(1000003L)) + lit(seed)) * 2654435761L,
      lit(1000000007L))
    val keyed = docs.select(col(idCol)).withColumn("shuffle_key", key)
    val ranged = (if (numBuckets > 0)
                    keyed.repartitionByRange(numBuckets, col("shuffle_key"), col(idCol))
                  else keyed.repartitionByRange(col("shuffle_key"), col(idCol)))
      .withColumn("__rb", spark_partition_id())
      .persist()
    val counts = ranged.groupBy("__rb").agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) {
      ranged.unpersist(false)
      return keyed.withColumn("epoch_pos", lit(0L)).withColumn("shard", lit(0L)).limit(0)
    }
    val ids = counts.keys.toArray.sorted
    val spark = docs.sparkSession
    import spark.implicits._
    val offsets = ids.zip(ids.scanLeft(0L)((acc, b) => acc + counts(b)))
      .toSeq.toDF("__rb", "__off")
    val w = Window.partitionBy("__rb").orderBy(col("shuffle_key"), col(idCol))
    val out = ranged
      .join(broadcast(offsets), "__rb")
      .withColumn("epoch_pos", row_number().over(w).cast("long") - 1L + col("__off"))
      .withColumn("shard", expr(s"epoch_pos div $shardSize"))
      .drop("__rb", "__off")
    try out.localCheckpoint(true)
    finally ranged.unpersist(false)
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis,
    * IPL'06 — the "A-ES" exponential-race formulation): per stratum,
    * keep the k documents with the smallest e = −ln(u)/w, where u is a
    * deterministic per-id uniform and w the document's weight. The
    * kept set is a true weight-proportional sample, yet a pure
    * function of (ids, weights, seed) — rerunning the pipeline, or
    * running it on another engine, re-deals the SAME sample, which is
    * what makes a sampled training mix auditable.
    *
    * u comes from the same public Knuth multiplicative residue as
    * [[epochShuffle]] (no RNG state, no engine-specific hash);
    * e quantizes to round(e·10¹²) int64 units BEFORE the selection
    * (the q105 rounded-ln discipline: a 1-ulp ln() divergence between
    * engines cannot flip a rank), ties break on id asc.
    *
    * Scale shape: the hash and key are map-only; selection is the
    * bounded top-k heap per stratum (partial heaps combine map-side,
    * the shuffle moves O(strata × k) rows) — never a per-stratum sort
    * of the corpus. Weights must be positive.
    */
  def weightedSample(docs: DataFrame, strataCol: String, weightCol: String,
                     k: Int, idCol: String, seed: Long = 42L): DataFrame =
    aesSelect(aesKeyed(docs, strataCol, weightCol, idCol, seed), k)

  /** The (stratum, id, e_units) exponential-race key frame behind
    * [[weightedSample]] — split out because the key is a pure per-row
    * function of (id, weight, seed), which is what lets a STREAMING
    * reservoir fold batches incrementally ([[graft.streaming.SampleStream]]):
    * min-k over deterministic keys is associative. */
  private[graft] def aesKeyed(docs: DataFrame, strataCol: String,
                              weightCol: String, idCol: String,
                              seed: Long): DataFrame = {
    require(seed >= 0 && seed <= 2000000000L,
      "seed must be in [0, 2e9] (64-bit overflow guard)")
    val h = pmod((pmod(col(idCol), lit(1000003L)) + lit(seed)) * 2654435761L,
      lit(1000000007L))
    val u = (h + lit(1L)).cast("double") / lit(1000000008.0) // u ∈ (0, 1]
    docs
      .filter(col(weightCol) > 0)
      .select(col(strataCol).as("stratum"), col(idCol).as("id"),
        round(-log(u) / col(weightCol).cast("double") * 1e12).cast("long")
          .as("e_units"))
  }

  /** Per-stratum smallest-k over an (stratum, id, e_units) key frame —
    * the bounded-heap selection stage of [[weightedSample]]. */
  private[graft] def aesSelect(keyed: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    keyed
      // smallest-k = largest-k on the negated key; heap ties (equal
      // score) break on id asc, the oracle's (e_units, id) order
      .groupBy("stratum")
      .agg(graft.functions.TopK.top_k(k)(col("id"),
        -col("e_units").cast("double")).as("top"))
      .select(col("stratum"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("stratum"), col("t.id").as("id"),
        (-col("t.score")).cast("long").as("e_units"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Deterministic [0, 100) bucket from an integral id: Knuth
    * multiplicative hashing over a prime residue. Plain 64-bit-safe
    * arithmetic (no engine-specific hash function), so any SQL engine
    * reproduces the assignment bit-for-bit — the property a train/test
    * split must have to survive pipeline reruns and engine migrations.
    * Collision structure (ids ≡ mod 1000003 share a bucket) is harmless
    * for percentage splits. */
  def splitBucket(id: Column): Column =
    pmod((id % 1000003L) * 2654435761L, lit(100L))

  /** Assign 'train' / 'val' / 'test' deterministically by id hash:
    * val gets `valPct` buckets, test `testPct`, train the rest. */
  def assignSplit(docs: DataFrame, idCol: String,
                  valPct: Int = 5, testPct: Int = 5): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100)
    val b = splitBucket(col(idCol))
    docs.withColumn("split",
      when(b < lit(100L - valPct - testPct), "train")
        .when(b < lit(100L - testPct.toLong), "val")
        .otherwise("test"))
  }

  /** Leakage-safe train/val/test split: near-duplicate documents must
    * never straddle a split boundary — a test doc whose near-dup sits in
    * train leaks the answer into the training set and inflates eval
    * (the train/test contamination problem, one duplication hop removed).
    * Every doc is assigned by the [[splitBucket]] hash of its duplicate
    * CLUSTER representative (connected-component minimum id over
    * `pairs`; [[graft.ext.Dedup.clusterPairs]]), so whole clusters move
    * together; singletons root at themselves, reproducing [[assignSplit]]
    * exactly on the dup-free part of the corpus.
    *
    * Scale shape: the cluster frame is bounded by the VERIFIED pair list
    * (orders of magnitude below the corpus), the components run
    * large-star/small-star (O(log n) rounds, never diameter-bound), and
    * the only corpus-sized step is one equi-join of docs against that
    * small cluster frame (AQE broadcasts it when it fits) plus the
    * map-only modular hash. Output: (doc_id, cluster_id, split). */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame, idCol: String,
                       valPct: Int = 5, testPct: Int = 5): DataFrame = {
    val clusters = Dedup.clusterPairs(pairs.select("id1", "id2"))
      .withColumnRenamed("id", "__sid")
    val rooted = docs.select(col(idCol).cast("long").as("doc_id"))
      .join(clusters, col("doc_id") === col("__sid"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    assignSplit(rooted, "cluster_id", valPct, testPct)
  }

  /** Dedup-safe k-fold assignment — [[leakageSafeSplit]]'s machinery at
    * cross-validation shape: every doc's fold is the [[splitBucket]]
    * hash of its duplicate-cluster representative modulo `k`, so a
    * near-dup pair can never straddle folds and every held-out fold is
    * leak-free against its training complement. Output: (doc_id,
    * cluster_id, fold ∈ [0, k)). Same scale shape as the split (one
    * equi-join against the edge-bounded cluster frame + map-only
    * arithmetic). */
  def leakageSafeFolds(docs: DataFrame, pairs: DataFrame, idCol: String,
                       k: Int): DataFrame = {
    require(k >= 2, "k-fold needs k >= 2")
    val clusters = Dedup.clusterPairs(pairs.select("id1", "id2"))
      .withColumnRenamed("id", "__sid")
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(clusters, col("doc_id") === col("__sid"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("fold", pmod(splitBucket(col("cluster_id")), lit(k.toLong)))
  }

  /** Cap each group's contribution at `cap` rows, chosen
    * deterministically by ([[splitBucket]], id) — the per-domain
    * downsample that stops boilerplate-heavy sources from dominating a
    * corpus, reproducible with no RNG state.
    *
    * Scale shape: the selection runs through the bounded top-k
    * aggregator (map-side-combining partial heaps, shuffle O(groups ×
    * cap)), NOT a per-group window — a window would sort each hot
    * domain in full, and hot domains are exactly what the cap is for.
    * TopK's (score desc, id asc) order with score = -bucket reproduces
    * the (bucket asc, id asc) ranking bit-for-bit, so any SQL engine's
    * `row_number() OVER (PARTITION BY g ORDER BY bucket, id) <= cap`
    * selects the identical rows. Ids must be unique and integral. */
  def capPerGroup(docs: DataFrame, groupCol: String, idCol: String,
                  cap: Int): DataFrame = {
    require(cap > 0)
    val keep = docs
      .select(col(groupCol).as("__g"), col(idCol).cast("long").as("__id"))
      .withColumn("__score", -splitBucket(col("__id")).cast("double"))
      .groupBy("__g")
      .agg(graft.functions.TopK.top_k(cap)(col("__id"), col("__score")).as("__top"))
      .select(explode(col("__top.id")).as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Stratified sampling with EXACT per-stratum counts: keep precisely
    * `min(n_g, |stratum g|)` rows from each stratum, chosen
    * deterministically by the ([[splitBucket]], id) walk order — the
    * "exactly 10k docs per language / 1M per source" allocation step of
    * corpus mixing, where [[capPerGroup]]'s single global cap is too
    * coarse. No RNG state: the sample is a pure function of (id,
    * targets), reproducible by any engine as `row_number() OVER
    * (PARTITION BY g ORDER BY bucket, id) <= n_g`.
    *
    * Scale shape: identical to [[capPerGroup]] — the selection runs
    * through the bounded top-k aggregator sized to max(n_g) (map-side-
    * combining partial heaps, shuffle O(strata × max target)), NOT a
    * per-stratum window that would sort hot strata in full; the
    * per-stratum trim to its own n_g is a broadcast join + posexplode
    * over the config-sized heap frame. `targets` must be config-sized
    * ((group, n) rows — it is collected to size the heap) and ids unique
    * and integral. Strata absent from `targets` contribute nothing. */
  def sampleStratified(docs: DataFrame, groupCol: String, idCol: String,
                       targets: DataFrame): DataFrame = {
    val t = targets.toDF("__g", "__n")
    // config-sized spec by contract; max target sizes the shared heap.
    // Empty targets = every stratum absent = nothing selected (the
    // documented contract), not an NPE out of the null max() cell.
    val maxRow = t.agg(max(col("__n").cast("long"))).head()
    if (maxRow.isNullAt(0)) return docs.limit(0)
    val maxK = maxRow.getLong(0)
    require(maxK > 0 && maxK <= Int.MaxValue, s"targets must be in [1, 2^31), got max $maxK")
    val keep = docs
      .select(col(groupCol).as("__g"), col(idCol).cast("long").as("__id"))
      .join(broadcast(t.select("__g").distinct()), Seq("__g"), "left_semi")
      .withColumn("__score", -splitBucket(col("__id")).cast("double"))
      .groupBy("__g")
      .agg(graft.functions.TopK.top_k(maxK.toInt)(col("__id"), col("__score")).as("__top"))
      .join(broadcast(t), Seq("__g"))
      .select(col("__n"), posexplode(col("__top.id")).as(Seq("__pos", idCol)))
      .filter(col("__pos") < col("__n"))
      .select(idCol)
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Exact global NTILE(k) under the total order (`value`, `tieId`) —
    * equi-frequency binning (length-bucketed batching, exact quantile
    * bins for mixture analysis) with the standard SQL semantics: bucket
    * sizes differ by at most one, earlier buckets take the remainder.
    *
    * Scale shape — a DISTRIBUTED GLOBAL RANK, not `ntile() OVER (ORDER
    * BY ...)` (a partitionless window pulls the corpus through ONE
    * task): range-repartition on the order key gives contiguous
    * buckets, per-bucket row counts collect to the driver (≤ #buckets
    * rows), the driver prefix-scans them into per-bucket rank offsets,
    * and each bucket ranks its own rows in parallel; the ntile bucket
    * is then pure integer arithmetic on (rank, n, k). Same machinery as
    * [[packShards]]'s prefix sum, ranked by count instead of tokens. */
  def ntileExact(df: DataFrame, value: Column, tieId: Column, k: Int,
                 numBuckets: Int = 0): DataFrame =
    ntileExactStaged(df, value, tieId, k, numBuckets) match {
      case None => df.withColumn("bucket", lit(0L)).limit(0) // empty input
      case Some((out, ranged)) =>
        try out.localCheckpoint(true)
        finally ranged.unpersist(false)
    }

  /** [[ntileExact]] before its eager checkpoint: (lazy result, the
    * persisted range-bucketed frame the caller must unpersist). Exposed
    * so plan-shape tests can assert the rank window is bucket-
    * partitioned — the public method materializes, collapsing the plan. */
  private[graft] def ntileExactStaged(df: DataFrame, value: Column, tieId: Column,
                                      k: Int, numBuckets: Int)
      : Option[(DataFrame, DataFrame)] = {
    require(k > 0, "ntile bucket count must be positive")
    val ranged = (if (numBuckets > 0) df.repartitionByRange(numBuckets, value, tieId)
                  else df.repartitionByRange(value, tieId))
      .withColumn("__rb", spark_partition_id())
      .persist()
    val counts = ranged.groupBy("__rb").agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) { ranged.unpersist(false); return None }
    val ids = counts.keys.toArray.sorted
    val n = counts.values.sum
    val spark = df.sparkSession
    import spark.implicits._
    val offsets = ids.zip(ids.scanLeft(0L)((acc, b) => acc + counts(b)))
      .toSeq.toDF("__rb", "__off")
    val w = Window.partitionBy("__rb").orderBy(value, tieId)
    // standard ntile: q = n/k rows per bucket, the first n%k buckets
    // take one extra (for n < k this degenerates to bucket = rank);
    // `div` keeps the arithmetic in exact 64-bit integers (Column./ is
    // double division — lossy above 2^53)
    val (q, rem) = (n / k, n % k)
    val cutoff = (q + 1) * rem
    val bucket =
      if (q == 0) col("__rank")
      else when(col("__rank") <= cutoff, expr(s"(__rank - 1) div ${q + 1} + 1"))
        .otherwise(expr(s"$rem + (__rank - 1 - $cutoff) div $q + 1"))
    val out = ranged
      .join(broadcast(offsets), "__rb")
      .withColumn("__rank", row_number().over(w).cast("long") + col("__off"))
      .withColumn("bucket", bucket)
      .drop("__rb", "__off", "__rank")
    Some((out, ranged))
  }

  /** Cap each group's contribution at a TOKEN budget rather than a row
    * count — the form mixture specs actually come in ("≤ 30B tokens of
    * web text"), since document length varies by orders of magnitude
    * within a source. Documents are walked in deterministic
    * pseudo-random order ([[splitBucket]], id — no RNG state, any
    * engine reproduces it) and a doc is kept iff the tokens BEFORE it
    * are under the budget: the budget overflows by at most one document
    * (the same greedy no-split semantic as [[packShards]]), so a budget
    * smaller than the first doc still yields it.
    *
    * Scale shape — a PER-GROUP distributed prefix sum with no driver
    * round-trip: the walk order's own leading key ([[splitBucket]] ∈
    * [0,100)) doubles as the range bucket, so (group, bucket) token
    * totals come from one map-side-combinable hash aggregate; the
    * exclusive bucket offsets are a window over that TINY totals frame
    * (groups × 100 rows); and each (group, bucket) computes its own
    * in-bucket running sum in parallel — a hot source's window sort
    * spreads over 100 buckets instead of one task (a bare
    * `Window.partitionBy(group)` would sort each hot domain in full,
    * and hot domains are exactly what a token cap is for). Ids must be
    * unique and integral. */
  def capTokensPerGroup(docs: DataFrame, groupCol: String, idCol: String,
                        tokenCol: Column, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val base = docs
      .select(col(groupCol).as("__g"), col(idCol).cast("long").as("__id"),
        tokenCol.cast("long").as("__tok"))
      .withColumn("__sb", splitBucket(col("__id")))
    val wOff = Window.partitionBy("__g").orderBy("__sb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("__g", "__sb").agg(sum("__tok").as("__s"))
      .withColumn("__off", coalesce(sum(col("__s")).over(wOff), lit(0L)))
      .drop("__s")
    val wCum = Window.partitionBy("__g", "__sb").orderBy("__id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val keep = base.join(broadcast(offsets), Seq("__g", "__sb"))
      .withColumn("__before",
        coalesce(sum(col("__tok")).over(wCum), lit(0L)) + col("__off"))
      .filter(col("__before") < budget)
      .select(col("__id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Weighted UPSAMPLING for mixture weights above 1: a document with
    * weight w (in permille, e.g. 2750 = 2.75 epochs) is replicated
    * ⌊w/1000⌋ times, plus once more for the deterministic hash fraction
    * of docs selected at probability (w mod 1000)/1000 — the epoch-
    * repetition half of data mixing ([[graft.queries.Extended]] q77 is
    * the ≤1 downsampling half, same multiplicative-hash keep rule, so a
    * mixture spec can mix both regimes). Output carries `copy_id`
    * (1-based) so downstream shuffling/packing can tell copies apart.
    *
    * Scale shape: the spec broadcasts, the copy fan-out is a map-side
    * explode of an integer sequence — no shuffle, no RNG state, and the
    * result is a pure function of (id, spec) under any partitioning. */
  def upsampleByWeight(docs: DataFrame, weights: DataFrame,
                       groupCol: String = "source",
                       idCol: String = "doc_id",
                       permilleCol: String = "permille"): DataFrame = {
    val nCopies = expr(s"$permilleCol div 1000") +
      when(pmod((col(idCol) % 1000003L) * 2654435761L, lit(1000L)) <
        pmod(col(permilleCol), lit(1000L)), 1L).otherwise(0L)
    docs.join(broadcast(weights), Seq(groupCol))
      .withColumn("__n_copies", nCopies)
      .filter(col("__n_copies") > 0)
      .withColumn("copy_id", explode(sequence(lit(1L), col("__n_copies"))))
      .drop("__n_copies", permilleCol)
  }

  /** Temperature-weighted mixture sampling (the multilingual-LM recipe,
    * e.g. XLM-R, Conneau et al. 2020 §3.1: sample groups ∝ n^α with
    * α < 1 so low-resource groups are upweighted relative to their
    * share). This is [[sampleStratified]] with the targets COMPUTED
    * from the observed group sizes at α = 1/2:
    *
    *   t_g = min(n_g, ⌊totalTarget · w_g / Σw⌋),  w_g = ⌊√(n_g · 10⁶)⌋
    *
    * α = 1/2 keeps the weight exactly recomputable by any engine: IEEE
    * sqrt is correctly rounded (unlike pow(x, α), whose libm drift
    * could flip a floor), so ⌊√(n·10⁶)⌋ is the integer isqrt for any
    * n·10⁶ < 2⁵², and everything after it is exact integer arithmetic
    * (`totalTarget · w_g` must stay under 2⁶³ — ample: 10⁹ target rows
    * against 10¹²-row groups is ~10¹⁸).
    *
    * Scale shape: one count aggregation (O(groups) frame), integer
    * target arithmetic, then [[sampleStratified]]'s bounded-heap
    * selection — no per-group window, no RNG state; the mix is a pure
    * function of (ids, group sizes, totalTarget). */
  def temperatureMix(docs: DataFrame, groupCol: String, idCol: String,
                     totalTarget: Long): DataFrame = {
    require(totalTarget > 0)
    val counts = docs.groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__n"))
    val w = counts.withColumn("__w",
      floor(sqrt(col("__n") * lit(1000000.0))).cast("long"))
    // Σw is one O(groups) aggregate — a config-sized driver scalar (the
    // same contract as sampleStratified's own targets collect)
    val totW = w.agg(sum(col("__w"))).head().getLong(0)
    val targets = w
      .withColumn("__t", expr(s"least(__n, ($totalTarget * __w) div $totW)"))
      .filter(col("__t") > 0)
      .select(col("__g"), col("__t"))
    sampleStratified(docs, groupCol, idCol, targets)
  }

  /** Deterministic ring negative sampling — training-pair generation for
    * contrastive/embedding objectives: within each bucket (the caller's
    * matching criterion — length band, language, domain…), members sort
    * by a seeded Knuth hash into a ring and each anchor takes the next
    * `k` members as its negatives. Ring pairing is the standard
    * linear-cost stand-in for per-anchor random sampling: every member
    * is an anchor exactly once and a negative exactly min(k, n_b−1)
    * times (no hub over-sampling), the pairing is a pure function of
    * (ids, seed) — no RNG state, any engine replays it — and a new seed
    * re-deals every epoch. The seed enters MULTIPLICATIVELY
    * (id · (2s+1) mod p, p = 1000003 prime — a genuine residue
    * permutation per seed): an additive seed shift would rotate every
    * hash by a constant, and ring adjacency is invariant under rotation
    * — the epochShuffle-style `(id + seed)·M` hash can never re-deal a
    * ring.
    *
    * Scale shape: one per-bucket rank window (buckets are the caller's
    * matching bands — bounded slices of the corpus, so no partitionless
    * window), a map-side explode of ≤ k ranks, and ONE equi-join on
    * (bucket, position). Per-anchor sampling against the whole bucket
    * would be O(n·bucket) — the ring is O(n·k). Singleton buckets yield
    * no pairs; a bucket of n ≤ k members yields n−1 negatives each. */
  def ringNegatives(docs: DataFrame, idCol: String, bucketCol: Column,
                    k: Int, seed: Long = 7L): DataFrame = {
    require(k >= 1)
    val base = docs
      .select(col(idCol).cast("long").as("anchor_id"),
        bucketCol.cast("long").as("bucket"))
      .withColumn("__h",
        expr(s"((anchor_id % 1000003) * ((2 * $seed + 1) % 1000003) % 1000003)" +
          " * 2654435761 % 1000000007"))
    val pos = base
      .withColumn("__pos",
        row_number().over(Window.partitionBy("bucket").orderBy("__h", "anchor_id"))
          .cast("long") - 1)
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("bucket")))
    val fanned = pos.filter(col("__n") > 1)
      .select(col("anchor_id"), col("bucket"), col("__pos"), col("__n"),
        explode(sequence(lit(1L), least(lit(k.toLong), col("__n") - 1)))
          .as("neg_rank"))
      .withColumn("__ppos", (col("__pos") + col("neg_rank")) % col("__n"))
    fanned.join(
        pos.select(col("bucket"), col("__pos").as("__ppos"),
          col("anchor_id").as("negative_id")),
        Seq("bucket", "__ppos"))
      .select("anchor_id", "neg_rank", "negative_id", "bucket")
  }

  /** Morton (Z-order) interleave of two bucketed integer coordinates:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. Both
    * inputs are masked to the low `bits` bits — the caller buckets each
    * dimension into [0, 2^bits) first (quantile bucket, modulo, day
    * number…). The bit kernel is [[graft.core.Layout.interleaveBits]]
    * (the write-path Z-order clustering shares it); this entry adds the
    * masking contract and the 2-D shape [[zorderLayout]] consumes. */
  def mortonZ(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    val mask = (1L << bits) - 1
    graft.core.Layout.interleaveBits(
      Seq(x.cast("long").bitwiseAND(lit(mask)),
        y.cast("long").bitwiseAND(lit(mask))), bits)
  }

  /** Z-order data layout: assign each row to one of `nFiles` equal-size
    * files along the Morton curve of two bucketed dimensions — the
    * standard multi-column clustering for scan pruning (a predicate on
    * EITHER dimension now skips most files, where a linear sort only
    * serves its leading column). This is a LAYOUT op: it computes the
    * assignment a writer would partition by; rows keep all their
    * columns plus (`zvalue`, `file_id`).
    *
    * Scale shape: the z-value is map-only integer arithmetic
    * ([[mortonZ]]); the equal-size cut is [[ntileExact]]'s distributed
    * global rank over (zvalue, rowId) — range-repartition + per-bucket
    * windows, never a partitionless window. `rowId` must be unique: it
    * makes the total order (and therefore every file boundary)
    * engine-independent. */
  def zorderLayout(df: DataFrame, x: Column, y: Column, rowId: Column,
                   bits: Int = 16, nFiles: Int = 64): DataFrame = {
    require(nFiles >= 1)
    val base = df
      .withColumn("__zid", rowId.cast("long"))
      .withColumn("zvalue", mortonZ(x, y, bits))
    ntileExact(base, col("zvalue"), col("__zid"), nFiles)
      .withColumnRenamed("bucket", "file_id")
      .drop("__zid")
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022: train the
    * LM to infill by REORDERING a fraction of documents to
    * prefix–suffix–middle with sentinel tokens — the data-side op is a
    * pure, deterministic rearrangement). Per document:
    *
    *  - selection: `ratePermille` of documents with ≥ `minTokens`
    *    tokens transform; the rest pass through verbatim. Selection and
    *    split points derive from the engine-reproducible multiplicative
    *    hash (the q77 keep-rule arithmetic — no RNG state, a pure
    *    function of (id, seed) under any partitioning);
    *  - two split points 1 ≤ i ≤ j ≤ n−1 cut prefix `[1..i]`, middle
    *    `[i+1..j]` (possibly empty when i = j), suffix `[j+1..n]`;
    *  - PSM rendering: `<PRE> prefix <SUF> suffix <MID> middle` — the
    *    infill-training order (the model sees both context sides before
    *    generating the middle).
    *
    * Output: (id, n_tokens, fim boolean, text_fim). Map-only: slices of
    * the staged token array, no shuffle, no join; at 100 TB this is
    * pure per-split work like every other shard-engineering pass. */
  def fimTransform(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", minTokens: Int = 8,
                   ratePermille: Int = 500, seed: Long = 17L): DataFrame = {
    val staged = docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        filter(split(col(textCol), " "), t => t =!= "").as("__toks"))
    val toks = col("__toks")
    val n = size(toks).cast("long")
    // id ≥ 0 PRECONDITION, enforced loudly: the selection/split hashes
    // use pmod (always non-negative) while an engine replaying them with
    // truncated `%` diverges on negative ids — parity would silently
    // break rather than fail. assert_true is NULL on success, so the
    // coalesce(+0) rides the hash without changing it.
    val idGuard = coalesce(
      assert_true(col(idCol) >= 0,
        lit(s"fimTransform requires non-negative $idCol (hash precondition)"))
        .cast("long"), lit(0L))
    def mhash(salt: Long): Column =
      pmod(((col(idCol) + idGuard + lit(salt)) % 1000003L) * 2654435761L,
        lit(1000003L))
    val selected = n >= minTokens &&
      pmod(mhash(seed), lit(1000L)) < ratePermille
    val a = pmod(mhash(seed + 1), n - 1) + 1L
    val b = pmod(mhash(seed + 2), n - 1) + 1L
    val i = least(a, b)
    val j = greatest(a, b)
    // array concatenation, ONE join: an empty middle slice contributes
    // nothing (no dangling separator ambiguity between engines)
    val psm = array_join(concat(
      array(lit("<PRE>")), slice(toks, lit(1), i.cast("int")),
      array(lit("<SUF>")), slice(toks, (j + 1).cast("int"), (n - j).cast("int")),
      array(lit("<MID>")), slice(toks, (i + 1).cast("int"), (j - i).cast("int"))), " ")
    staged.select(col(idCol), n.as("n_tokens"),
      selected.as("fim"),
      when(selected, psm).otherwise(array_join(toks, " ")).as("text_fim"))
  }
}

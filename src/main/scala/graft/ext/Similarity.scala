package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{array, array_sort, broadcast, coalesce, col, collect_list, count, explode, expr, floor, least, lit, max, max_by, posexplode, row_number, sqrt, struct, sum, transform, when}

import graft.functions.TopK
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - `topKBruteForce`: exact cosine top-k — the correctness baseline.
  *    Query side is broadcast (queries ≪ corpus), so the corpus is
  *    scanned ONCE with no shuffle of corpus rows; only (Q × k)-ish
  *    candidates shuffle for the final per-query ranking.
  *  - `topKLsh`: sign-random-projection LSH — the 100 TB path. Corpus
  *    rows shuffle only by bucket id; each query probes its own buckets,
  *    exact cosine re-ranks the candidates. Recall is tunable via
  *    (numTables, bitsPerTable).
  */
object Similarity {

  /** Rank scored candidates: bounded top-k aggregation (map-side
    * combinable — shuffles O(queries × k), not O(candidates); see
    * [[graft.functions.TopK]]), exploded back to one row per neighbor. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(TopK.top_k(k)(col("neighbor_id"), col("sim")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
              col("col.score").as("sim"), (col("pos") + 1).cast("long").as("rank"))

  /** Exact top-k neighbors per query vector.
    * Output: (query_id, neighbor_id, sim, rank) — rank 1 = best.
    * Excludes the trivial self-match when query ids came from the corpus.
    * The corpus is scanned once (query side broadcast); only per-partition
    * top-k heaps shuffle. */
  def topKBruteForce(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine_similarity(col("_cv"), col("_qv")))
    rankTopK(scored, k)
  }

  /** Semantic decontamination: flag corpus vectors whose cosine to ANY
    * benchmark vector reaches `threshold` — the embedding-space
    * complement of the shingle-containment decontaminate ([[Dedup]]):
    * a paraphrased eval item shares no 8-gram with its source but sits
    * right next to it in embedding space. Output: one row per flagged
    * corpus vector — (vec_id, n_hits, top_bench_id, max_sim_micro),
    * ties on sim → smallest bench id; sims compare as ⌊sim·10⁶⌋
    * integers so the flag set is engine-stable.
    *
    * Scale shape: the BENCHMARK side is bounded by construction (an
    * eval suite is thousands of items — it broadcasts), so the scan is
    * map-only O(corpus × |bench|) dots with a map-side-combinable
    * per-vector reduce: no shuffle of the corpus, embarrassingly
    * parallel, the shape production semantic-decon sweeps actually run.
    * When the bench side outgrows the broadcast threshold, bucket IT
    * (IVF on the benchmark, probe per corpus vector) — the [[IvfPq]]
    * composition; the exact broadcast form is the reference semantics. */
  def semanticDecontaminate(corpus: DataFrame, bench: DataFrame,
                            threshold: Double, idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val b = broadcast(bench.select(col(idCol).as("bench_id"), col(vecCol).as("_bv")))
    corpus.select(col(idCol).as("vec_id"), col(vecCol).as("_cv"))
      .crossJoin(b)
      .withColumn("sim_micro",
        floor(cosine_similarity(col("_cv"), col("_bv")) * lit(1e6)).cast("long"))
      .filter(col("sim_micro") >= lit(math.floor(threshold * 1e6).toLong))
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_hits"),
        max_by(col("bench_id"), struct(col("sim_micro"), -col("bench_id")))
          .as("top_bench_id"),
        max(col("sim_micro")).as("max_sim_micro"))
  }

  /** [[topKBruteForce]] over DOUBLE vectors — the PCA-reduced search
    * space ([[PCA.projectVectors]]). Cosine composes from three
    * sequential double dots (dot/(√na·√nb), 0 on a zero norm) so an
    * independent engine reproduces every sim bit-for-bit from the same
    * reduced vectors; ranking and tie-break match [[topKBruteForce]]. */
  def topKBruteForceD(corpus: DataFrame, queries: DataFrame, k: Int,
                      idCol: String = "vec_id", vecCol: String = "pvec"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv")))
    val num = double_dot_product(col("_cv"), col("_qv"))
    val na = double_dot_product(col("_cv"), col("_cv"))
    val nb = double_dot_product(col("_qv"), col("_qv"))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        when(na === 0.0 || nb === 0.0, lit(0.0))
          .otherwise(num / (sqrt(na) * sqrt(nb))))
    rankTopK(scored, k)
  }

  /** LSH candidate pairs: (query_id, neighbor_id) sharing ≥1 bucket in
    * ≥1 hash table — deterministic for a fixed seed, which is what lets
    * the driver oracle re-rank EXACTLY this set in DuckDB (approximate
    * in recall, exact in ranking). Bare id pairs only; vectors attach in
    * [[rankCandidates]]. */
  def lshCandidates(corpus: DataFrame, queries: DataFrame,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    seed: Long = 42L, numTables: Int = 8, bitsPerTable: Int = 10): DataFrame = {
    def bucketed(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id),
        explode(lsh_buckets(col(vecCol), seed, numTables, bitsPerTable)).as("bucket"))

    bucketed(corpus, "neighbor_id")
      .join(broadcast(bucketed(queries, "query_id")), "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id") // same pair from several tables
  }

  /** Exact-cosine re-rank of a bare-id candidate pair set: vectors join
    * back per side (query side broadcast, corpus side one hash join),
    * bounded top-k aggregation ranks. Shared tail of the LSH and IVF
    * paths — dragging 64-float payloads through the candidate-pair
    * shuffle instead is what turns ANN from cheap into O(candidates ×
    * vector width) network, the dominant cost at 100 TB. */
  def rankCandidates(candidates: DataFrame, corpus: DataFrame, queries: DataFrame,
                     k: Int, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val withVecs = candidates
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv")), "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))), "query_id")
    rankTopK(withVecs.withColumn("sim", cosine_similarity(col("_cv"), col("_qv"))), k)
  }

  /** LSH-bucketed approximate top-k: candidates share ≥1 bucket in ≥1
    * hash table with the query ([[lshCandidates]]), then exact cosine
    * re-ranks ([[rankCandidates]]). */
  def topKLsh(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              seed: Long = 42L, numTables: Int = 8, bitsPerTable: Int = 10): DataFrame =
    rankCandidates(lshCandidates(corpus, queries, idCol, vecCol, seed, numTables, bitsPerTable),
      corpus, queries, k, idCol, vecCol)

  /** MULTI-PROBE LSH candidates (Lv et al., VLDB'07): the query side
    * probes its own bucket plus every 1-bit-flip neighbor in each table
    * — (bits+1) probes per table — while the CORPUS side still indexes
    * one bucket per table. A near-miss (query lands one hyperplane on
    * the wrong side of a neighbor) is recovered by the flipped probe
    * instead of by another table, so the same recall needs ~(bits+1)×
    * fewer tables: the corpus-side index — the part that is 10⁹ rows at
    * 100 TB while queries are thousands — shrinks by that factor, and
    * probing is query-side-only arithmetic on the (broadcast) small
    * side. Bucket ids are `(table << bits) | signBits`, so a flip is a
    * pure XOR of one low bit — the table prefix is untouched and probes
    * never cross tables. Deterministic for a fixed seed (same oracle
    * contract as [[lshCandidates]]: the dump re-ranks exactly). */
  def lshMultiProbeCandidates(corpus: DataFrame, queries: DataFrame,
                              idCol: String = "vec_id", vecCol: String = "embedding",
                              seed: Long = 42L, numTables: Int = 4,
                              bitsPerTable: Int = 10): DataFrame = {
    val masks = array(lit(0L) +: (0 until bitsPerTable).map(j => lit(1L << j)): _*)
    val probed = queries
      .select(col(idCol).as("query_id"),
        explode(lsh_buckets(col(vecCol), seed, numTables, bitsPerTable)).as("__b"))
      .select(col("query_id"),
        explode(transform(masks, m => col("__b").bitwiseXOR(m))).as("bucket"))
    corpus
      .select(col(idCol).as("neighbor_id"),
        explode(lsh_buckets(col(vecCol), seed, numTables, bitsPerTable)).as("bucket"))
      .join(broadcast(probed), "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
  }

  /** Maximal-marginal-relevance diversified re-rank (Carbonell &
    * Goldstein, SIGIR'98): from each query's exact top-`nCandidates`,
    * greedily select `k` results maximizing
    * `λ·sim(q,c) − μ·max_{s∈selected} sim(c,s)` — relevance traded
    * against redundancy, the standard post-processor when near-duplicate
    * neighbors would crowd out coverage (retrieval-augmented training
    * batches, dedup-aware search). λ and μ are SEPARATE parameters, not
    * λ/(1−λ): `1 − 0.7` in IEEE is 0.30000000000000004 while the
    * literal `0.3` is not — two engines can only agree when both parse
    * the same literal.
    *
    * Determinism: scores round to 4 decimals BEFORE each argmax and
    * ties break on the candidate id, so every greedy step — and
    * therefore the whole selection — is a pure function of the vectors.
    * Scale shape: candidates and their pairwise sims are bounded
    * (n per query, n² pairs per query) and checkpointed once; each of
    * the k steps is one anti-join + one bounded aggregate + one
    * per-query window over ≤ n rows — never a corpus scan. The oracle
    * replays ALL k greedy steps in SQL from raw vectors (the q114
    * unrolled-iteration discipline): a full ground-truth oracle, no
    * candidate dump needed because the exact top-n is itself SQL. */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                nCandidates: Int = 20, lambda: Double = 0.7, mu: Double = 0.3,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && nCandidates >= k)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{max, round, row_number}
    val cand = topKBruteForce(corpus, queries, nCandidates, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
      .localCheckpoint(true) // reused by all k steps + the pair join
    val vecs = corpus.select(col(idCol).as("__vid"), col(vecCol).as("__v"))
    val pairSims = cand.select(col("query_id"), col("neighbor_id").as("cand_a"))
      .join(cand.select(col("query_id"), col("neighbor_id").as("cand_b")),
        Seq("query_id"))
      .filter(col("cand_a") =!= col("cand_b"))
      .join(vecs.select(col("__vid").as("cand_a"), col("__v").as("__va")), "cand_a")
      .join(vecs.select(col("__vid").as("cand_b"), col("__v").as("__vb")), "cand_b")
      .select(col("query_id"), col("cand_a"), col("cand_b"),
        cosine_similarity(col("__va"), col("__vb")).as("sim_ab"))
      .localCheckpoint(true)
    val w = Window.partitionBy("query_id")
      .orderBy(col("__score").desc, col("neighbor_id"))
    var selected: DataFrame = null
    for (i <- 1 to k) {
      val scored =
        if (selected == null)
          cand.withColumn("__score", round(lit(lambda) * col("sim"), 4))
        else {
          val maxSel = pairSims
            .join(selected.select(col("query_id"), col("neighbor_id").as("cand_b")),
              Seq("query_id", "cand_b"))
            .groupBy(col("query_id"), col("cand_a").as("neighbor_id"))
            .agg(max(col("sim_ab")).as("__maxSel"))
          cand
            .join(selected.select("query_id", "neighbor_id"),
              Seq("query_id", "neighbor_id"), "left_anti")
            .join(maxSel, Seq("query_id", "neighbor_id"))
            .withColumn("__score",
              round(lit(lambda) * col("sim") - lit(mu) * col("__maxSel"), 4))
        }
      val pick = scored
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("query_id"), col("neighbor_id"), col("sim"),
          col("__score").as("mmr_score"), lit(i.toLong).as("mmr_rank"))
      selected =
        (if (selected == null) pick else selected.unionByName(pick))
          .localCheckpoint(true) // one-step lineage per greedy round
    }
    selected.select("query_id", "mmr_rank", "neighbor_id", "sim", "mmr_score")
  }

  /** Multi-probe LSH top-k: [[lshMultiProbeCandidates]] + exact cosine
    * re-rank ([[rankCandidates]]). */
  def topKLshMultiProbe(corpus: DataFrame, queries: DataFrame, k: Int,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        seed: Long = 42L, numTables: Int = 4,
                        bitsPerTable: Int = 10): DataFrame =
    rankCandidates(
      lshMultiProbeCandidates(corpus, queries, idCol, vecCol, seed, numTables, bitsPerTable),
      corpus, queries, k, idCol, vecCol)

  /** IVF (inverted-file) approximate top-k: a DISTRIBUTED spherical
    * k-means coarse quantizer ([[KMeans.fit]] — deterministic decimal
    * update arithmetic, seeded hash-minimal init, optional hash
    * subsampling) partitions the corpus into centroid cells, and each
    * query probes only its `nProbe` nearest cells.
    *
    * Scale shape: training is `iterations` map-side-combinable
    * aggregation passes over a (subsampled) corpus — vectors never
    * collect to the driver; the corpus is scanned once to tag `cell`
    * (a codegen'd expression over broadcast-referenced centroids), the
    * candidate join is an equi-join on `cell`, and ranking is the
    * bounded top-k aggregation. Versus LSH: IVF adapts to the data's
    * density (cells follow clusters), and `nProbe` gives a smooth
    * recall/latency dial. */
  def topKIvf(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              numCentroids: Int = 64, nProbe: Int = 8, iterations: Int = 5,
              trainTarget: Int = 100000, seed: Long = 42L): DataFrame =
    rankCandidates(
      ivfCandidates(corpus, queries, idCol, vecCol, numCentroids, nProbe,
        iterations, trainTarget, seed),
      corpus, queries, k, idCol, vecCol)

  /** IVF candidate pairs: (query_id, neighbor_id) where the neighbor's
    * cell is among the query's `nProbe` nearest cells. Deterministic for
    * a fixed seed and corpus regardless of partitioning ([[KMeans.fit]]'s
    * exact-arithmetic contract), so the driver oracle can re-rank exactly
    * this set. Bare id pairs; vectors attach in [[rankCandidates]] —
    * same shuffle discipline as [[lshCandidates]].
    *
    * `trainTarget` bounds the TRAINING COST, not a driver collect: above
    * it, training runs on a deterministic hash subsample of ~that many
    * rows (`<= 0` trains on the full corpus). */
  def ivfCandidates(corpus: DataFrame, queries: DataFrame,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    numCentroids: Int = 64, nProbe: Int = 8, iterations: Int = 5,
                    trainTarget: Int = 100000, seed: Long = 42L): DataFrame = {
    import graft.functions.VectorFunctions

    val first = corpus.select(col(vecCol)).limit(1).collect()
    require(first.nonEmpty, "empty corpus")
    val dim = first.head.getSeq[Float](0).length
    val centroids = KMeans.fit(corpus, idCol, vecCol, numCentroids, dim,
      iterations, seed, trainTarget)

    val cb = corpus.select(col(idCol).as("neighbor_id"),
      VectorFunctions.nearest_centroids(col(vecCol), centroids, dim, 1)(0).as("cell"))
    val qb = broadcast(queries.select(col(idCol).as("query_id"),
      explode(VectorFunctions.nearest_centroids(col(vecCol), centroids, dim, nProbe)).as("cell")))

    cb.join(qb, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
  }

  /** [[rankCandidates]] for a CORPUS-SIZED query side (knn join): both
    * vector join-backs are shuffle hash equi-joins — broadcasting the
    * query vectors, correct when queries ≪ corpus, is exactly wrong
    * when the query side IS the corpus. Candidates still move as bare
    * id pairs; each side's vectors attach once, keyed by id. */
  def rankCandidatesLarge(candidates: DataFrame, corpus: DataFrame,
                          k: Int, idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val withVecs = candidates
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv")), "neighbor_id")
      .join(corpus.select(col(idCol).as("query_id"), col(vecCol).as("_qv")), "query_id")
    rankTopK(withVecs.withColumn("sim", cosine_similarity(col("_cv"), col("_qv"))), k)
  }

  /** All-corpus knn join: every vector's top-k cosine neighbors — the
    * workhorse of semantic clustering, retrieval-augmentation indexing,
    * and graph-based curation, where the "query set" is the corpus
    * itself and nothing may broadcast.
    *
    * Shape: IVF cells auto-sized to a constant occupancy
    * (cells = n / targetCellSize — the q104/q108 discipline), each
    * vector probes its `nProbe` nearest cells, and the candidate join is
    * a shuffle EQUI-JOIN on cell between the corpus and its own probe
    * list: per-cell work is bounded by nProbe · targetCellSize per
    * vector, so the whole join is O(n · nProbe · targetCellSize) —
    * linear in n at fixed occupancy, against brute force's O(n²).
    * Ranking is [[rankCandidatesLarge]] (no broadcast anywhere) into
    * the bounded top-k heap. Deterministic for a fixed seed
    * ([[KMeans.fit]]'s exact-arithmetic contract), so the driver oracle
    * re-ranks exactly the dumped candidate set. */
  def knnJoin(corpus: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              targetCellSize: Int = 128, nProbe: Int = 4, iterations: Int = 5,
              trainTarget: Int = 100000, seed: Long = 42L): DataFrame =
    rankCandidatesLarge(
      knnJoinCandidates(corpus, idCol, vecCol, targetCellSize, nProbe,
        iterations, trainTarget, seed),
      corpus, k, idCol, vecCol)

  /** [[knnJoin]]'s candidate pairs — bare (query_id, neighbor_id) ids
    * sharing a probed cell. Exposed for the candidate-dump oracle.
    *
    * Cell count grows with the corpus (cells = n / targetCellSize), so
    * past `hierThreshold` cells the flat O(n·cells) argmax — the q108
    * scale-killer — switches to the two-level layout: √cells supers ×
    * √cells children, the corpus side assigned top-1 and the probe side
    * top-`nProbe` through the SAME fit ([[graft.functions.NearestChildCells]],
    * O(√cells) per row), so corpus cell ≡ first probe by construction. */
  def knnJoinCandidates(corpus: DataFrame,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        targetCellSize: Int = 128, nProbe: Int = 4,
                        iterations: Int = 5, trainTarget: Int = 100000,
                        seed: Long = 42L, hierThreshold: Int = 1024,
                        nProbeSuper: Int = 4): DataFrame = {
    import graft.functions.VectorFunctions
    val first = corpus.select(col(vecCol)).limit(1).collect()
    require(first.nonEmpty, "empty corpus")
    val dim = first.head.getSeq[Float](0).length
    val n = math.max(1L, corpus.count())
    val cells = math.max(32L, n / targetCellSize).toInt
    val (cb, qb) =
      if (cells <= hierThreshold) {
        val cents = KMeans.fit(corpus, idCol, vecCol, cells, dim,
          iterations, seed, trainTarget)
        (corpus.select(col(idCol).as("neighbor_id"),
           VectorFunctions.nearest_centroids(col(vecCol), cents, dim, 1)(0).as("cell")),
         corpus.select(col(idCol).as("query_id"),
           explode(VectorFunctions.nearest_centroids(col(vecCol), cents, dim, nProbe)).as("cell")))
      } else {
        val k1 = math.max(2, math.ceil(math.sqrt(cells.toDouble)).toInt)
        val k2 = math.max(2, math.ceil(cells.toDouble / k1).toInt)
        val (superFlat, childFlat) = KMeans.fitHier(corpus, idCol, vecCol,
          k1, k2, dim, iterations, seed, trainTarget)
        val probe = math.min(nProbeSuper, superFlat.length / dim)
        (corpus.select(col(idCol).as("neighbor_id"),
           VectorFunctions.nearest_child_cells(col(vecCol), superFlat, childFlat,
             dim, k2, probe, 1)(0).as("cell")),
         corpus.select(col(idCol).as("query_id"),
           explode(VectorFunctions.nearest_child_cells(col(vecCol), superFlat, childFlat,
             dim, k2, probe, nProbe)).as("cell")))
      }
    // shuffle equi-join on cell — NO broadcast: both sides are the corpus
    cb.join(qb, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, found via shared
    * LSH buckets (corpus self-join on bucket, id1 < id2, exact verify).
    * Same shuffle discipline as topKLsh: the self-join and dedup move
    * (bucket, id) rows only; vectors join back per verified candidate. */
  /** `corpusPersisted = true`: the caller already persisted `corpus`
    * (or a frame a rename-only projection of it resolves to) — skip the
    * internal vector-side persist, whose plan is cache-equivalent to the
    * caller's and would only emit CacheManager "already cached" noise
    * while Spark reuses the outer entry anyway. */
  /** [[nearDupPairs]] with (bitsPerTable, numTables) sized from the
    * corpus instead of fixed: FIXED bits mean bucket occupancy grows
    * linearly with corpus size, so the bucket self-join grows
    * QUADRATICALLY — the ×10 scale bench measured q31's fixed 4-bit
    * tables at 2.1× per-row cost, and at 100× they'd be the job.
    *
    *  - bits = log2(n / targetOccupancy): expected bucket depth stays
    *    `targetOccupancy` at any corpus size (candidate volume ~
    *    tables · n · occupancy — linear in n);
    *  - tables solved from the hyperplane collision probability
    *    p = 1 − acos(threshold)/π so that threshold-level pairs are
    *    caught with probability ≥ targetRecall: the n^ρ cost LSH
    *    theory prescribes — MORE tables at larger n, never deeper
    *    buckets.
    *
    * When `maxTables` caps the solved table count the recall target is
    * not met; that is LOUD (stderr + the returned frame is still
    * exact-verified, just lower recall) — low thresholds (≤ ~0.5) on
    * random embeddings have ρ → 1 and genuinely approach brute-force
    * cost; raise the threshold or use exact top-k for that regime. */
  def nearDupPairsAuto(corpus: DataFrame, threshold: Double,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       seed: Long = 42L, targetRecall: Double = 0.98,
                       targetOccupancy: Int = 64, maxTables: Int = 64,
                       maxBucketSize: Int = 10000): DataFrame = {
    require(threshold > 0 && threshold < 1 && targetRecall > 0 && targetRecall < 1)
    require(maxTables >= 1 && maxTables <= 64, "the LSH kernel packs ≤ 64 tables")
    val n = math.max(1L, corpus.count())
    val p = 1.0 - math.acos(threshold) / math.Pi
    def solvedTables(b: Int): Int = math.max(1, math.ceil(
      math.log1p(-targetRecall) / math.log1p(-math.pow(p, b))).toInt)
    val bits0 = math.max(2,
      math.ceil(math.log(n.toDouble / targetOccupancy) / math.log(2)).toInt)
    // recall is the CONTRACT: if the occupancy-ideal bits need more
    // tables than the kernel allows, walk bits DOWN (deeper buckets,
    // more candidates — a loud cost, never a silent recall loss) until
    // the recall target fits in maxTables.
    val bits = (bits0 to 2 by -1).find(b => solvedTables(b) <= maxTables).getOrElse(2)
    val tables = math.min(maxTables, solvedTables(bits))
    if (solvedTables(bits) > maxTables)
      System.err.println(f"[graft-similarity] nearDupPairsAuto: recall target " +
        f"$targetRecall%.3f unreachable within $maxTables tables even at 2 " +
        f"bits (threshold $threshold%.2f, n=$n) — achieved recall " +
        f"${1 - math.pow(1 - p * p, maxTables)}%.3f. This regime is " +
        "near-brute-force; raise the threshold or go exact.")
    else if (bits < bits0)
      System.err.println(f"[graft-similarity] nearDupPairsAuto: holding recall " +
        f"$targetRecall%.3f within $maxTables tables cost ${bits0 - bits} bits " +
        f"of bucket depth (expected occupancy ${n.toDouble / (1L << bits)}%.0f " +
        f"instead of $targetOccupancy; threshold $threshold%.2f has " +
        "near-brute-force LSH cost — production near-dup runs ≥ ~0.8).")
    nearDupPairs(corpus, threshold, idCol, vecCol, seed, tables, bits, maxBucketSize)
  }

  /** Fixed-parameter embedding near-dup (LSH bucket join + exact verify).
    * PRODUCTION CALLERS: use [[nearDupPairsAuto]] — fixed `bitsPerTable`
    * means bucket occupancy grows linearly with corpus size, and the
    * bucket self-join quadratically (measured 2.1× per-row at ×10 rows,
    * BASELINE.md §4). Auto-sizing bits to log2(n/occupancy) keeps bucket
    * depth constant as n grows; this fixed variant exists as the
    * pinned-parameter oracle surface (q31) and the kernel `auto` sizes
    * into. */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   seed: Long = 42L, numTables: Int = 8, bitsPerTable: Int = 10,
                   maxBucketSize: Int = 10000,
                   corpusPersisted: Boolean = false): DataFrame = {
    val (b0, vecs, verified) = nearDupVerifiedLazy(corpus, threshold, idCol,
      vecCol, seed, numTables, bitsPerTable, maxBucketSize, corpusPersisted)
    val out = verified.localCheckpoint(true) // then release the caches
    b0.unpersist(false)
    if (!corpusPersisted) vecs.unpersist(false)
    out
  }

  /** Un-materialized [[nearDupPairs]]: (bucket cache, vector cache, lazy
    * verified frame) — package-private so PlanShapeSpec can pin the
    * banded-join shape the public method's localCheckpoint erases.
    * Callers must unpersist both handles. */
  private[graft] def nearDupVerifiedLazy(
      corpus: DataFrame, threshold: Double, idCol: String, vecCol: String,
      seed: Long, numTables: Int, bitsPerTable: Int, maxBucketSize: Int,
      corpusPersisted: Boolean = false): (DataFrame, DataFrame, DataFrame) = {
    // persist the RAW bucket projection, not the capped frame: the skew
    // guard's count pass and both self-join sides then read the cached
    // rows instead of re-running the lsh_buckets kernel three times
    val b0 = corpus.select(col(idCol).as("id"),
        explode(lsh_buckets(col(vecCol), seed, numTables, bitsPerTable)).as("bucket"))
      .persist()
    val b = graft.core.Skew.capGroupSize(b0, Seq("bucket"), maxBucketSize)
    val pairs = b.toDF("id1", "bucket").join(b.toDF("id2", "bucket"), Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2")
      .dropDuplicates("id1", "id2")
    // vectors join back once per pair SIDE — persist so a derived corpus
    // (e.g. q46's synthesized media features) computes its vectors once
    val vecs = corpus.select(col(idCol).as("_vid"), col(vecCol).as("_v"))
    if (!corpusPersisted) vecs.persist()
    val verified = pairs
      .join(vecs.select(col("_vid").as("id1"), col("_v").as("v1")), "id1")
      .join(vecs.select(col("_vid").as("id2"), col("_v").as("v2")), "id2")
      .withColumn("sim", cosine_similarity(col("v1"), col("v2")))
      .filter(col("sim") >= threshold)
      .select("id1", "id2", "sim")
    (b0, vecs, verified)
  }

  /** Per-group centroid representative: for each group, the member
    * vector closest (squared L2) to the group's mean embedding — the
    * cluster-summary / prototype-selection step of embedding-based data
    * curation (inspect one exemplar per source/topic; seed curricula
    * from prototypes). Output: (group, rep id, member count, scaled
    * squared distance).
    *
    * EXACT and engine-portable: values quantize to floor(x·10⁶)
    * microunit longs (the [[graft.queries.Extended]] q75 discipline), and
    * the centroid is never divided out — distances compare as
    * Σ_d (x_d·n − S_d)², i.e. scaled by n², in DECIMAL(38,0) (microunit
    * diffs reach ~1e15 at billions of rows per group; their squares
    * overflow 64-bit). Argmin is a plain lexicographic struct-min,
    * ties to the smaller id.
    *
    * Scale shape: two map-side-combinable hash aggregates over the
    * posexploded (group, dim) melt with a BROADCAST of the tiny
    * (groups × dims) centroid frame between them — no window, no join
    * keyed on anything bigger than (group, dim), nothing unbounded. */
  def groupRepresentatives(embeds: DataFrame, groupCol: String = "label",
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val m = embeds
      .select(col(groupCol).as("__g"), col(idCol).cast("long").as("__id"),
        posexplode(col(vecCol)).as(Seq("__pos", "__x")))
      .withColumn("__xm", floor(col("__x").cast("double") * lit(1e6)).cast("long"))
    val cent = m.groupBy("__g", "__pos")
      .agg(sum(col("__xm")).as("__s"), count(lit(1)).as("__n"))
    // decimal BEFORE the multiply: microunit × multi-billion-row counts
    // exceed 2^63, and a 64-bit product would silently wrap where the
    // scaladoc promises DECIMAL(38,0) exactness (the oracle's HUGEINT
    // multiply agrees bit-for-bit in-range and errors, not wraps, beyond)
    val diff = col("__xm").cast(DecimalType(20, 0)) * col("__n") - col("__s")
    val dist = m.join(broadcast(cent), Seq("__g", "__pos"))
      .groupBy("__g", "__id")
      .agg(sum(diff * diff).as("__d2"), max(col("__n")).as("__n"))
    dist.groupBy("__g")
      .agg(min(struct(col("__d2"), col("__id"))).as("__best"),
        max(col("__n")).as("n_members"))
      .select(col("__g").as(groupCol), col("__best.__id").as("rep_id"),
        col("n_members"), col("__best.__d2").as("dist2n2"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", arXiv:2303.09540): a k-means clustering partitions
    * the corpus into semantic cells sized ~`targetCellSize`, exact
    * cosine ≥ threshold pairs are verified WITHIN cells only (the
    * SemDeDup approximation — semantic duplicates land in the same cell
    * by construction), connected components group them, and the
    * smallest id per component survives.
    *
    * Output: one row per corpus vector — (idCol, rep_id, kept); kept
    * vectors are their own representative.
    *
    * Scale shape: numCells = n / targetCellSize, so total within-cell
    * pair work is n × targetCellSize — LINEAR in n (the same
    * occupancy-sizing argument as [[nearDupPairsAuto]]'s bits). The
    * cell self-join moves (id, cell) rows only; vectors join back per
    * candidate pair; components run on the verified EDGE list (bounded
    * union-find below 1M edges, large-star/small-star above —
    * [[Dedup.clusterPairs]]); `maxCellSize` caps degenerate cells
    * LOUDLY ([[graft.core.Skew.capGroupSize]]). Deterministic for
    * (corpus, params, seed) per [[KMeans.fit]]'s exact-arithmetic
    * contract — the cell dump lets an oracle recompute the whole
    * downstream exactly. */
  def semanticDedup(corpus: DataFrame, threshold: Double,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    targetCellSize: Int = 256, iterations: Int = 5,
                    seed: Long = 42L, trainTarget: Int = 100000,
                    maxCellSize: Int = 10000): DataFrame =
    semanticDedupFromCells(corpus,
      semanticCells(corpus, idCol, vecCol, targetCellSize, iterations, seed,
        trainTarget),
      threshold, idCol, vecCol, maxCellSize)

  /** The (id, cell) semantic-cell assignment [[semanticDedup]] verifies
    * within — split out so an oracle dump IS the assignment the query
    * used (q74/q102's dumped-fit contract). */
  def semanticCells(corpus: DataFrame,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    targetCellSize: Int = 256, iterations: Int = 5,
                    seed: Long = 42L, trainTarget: Int = 100000,
                    hierThreshold: Int = 64, nProbeSuper: Int = 4): DataFrame = {
    import graft.functions.VectorFunctions
    val n = math.max(1L, corpus.count())
    val k = math.max(4L, n / math.max(1, targetCellSize)).toInt
    val first = corpus.select(col(vecCol)).limit(1).collect()
    require(first.nonEmpty, "empty corpus")
    val dim = first.head.getSeq[Float](0).length
    if (k <= hierThreshold) {
      val cents = KMeans.fit(corpus, idCol, vecCol, k, dim, iterations, seed,
        trainTarget)
      corpus.select(col(idCol).as("id"),
        VectorFunctions.nearest_centroids(col(vecCol), cents, dim, 1)(0).as("cell"))
    } else {
      // cell count grows with the corpus (k = n/cellSize), so the flat
      // O(n·k) argmax is the scale-killer here — switch to the two-level
      // assignment: √k supers × √k children, O(k1 + nProbe·k2) per row.
      // Any deterministic vector→cell function is a valid SemDeDup
      // partition (the dedup verifies exact cosine WITHIN cells, and the
      // oracle recomputes downstream from the dumped assignment); the
      // nProbe-super probe keeps boundary vectors from splitting off
      // their neighborhood's cell.
      val k1 = math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)
      val k2 = math.max(2, math.ceil(k.toDouble / k1).toInt)
      val (superFlat, childFlat) = KMeans.fitHier(corpus, idCol, vecCol,
        k1, k2, dim, iterations, seed, trainTarget)
      corpus.select(col(idCol).as("id"),
        VectorFunctions.nearest_child_cell(col(vecCol), superFlat, childFlat,
          dim, k2, math.min(nProbeSuper, superFlat.length / dim)).as("cell"))
    }
  }

  /** [[semanticDedup]] over a precomputed (id, cell) assignment. */
  def semanticDedupFromCells(corpus: DataFrame, cells: DataFrame,
                             threshold: Double,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding",
                             maxCellSize: Int = 10000): DataFrame = {
    val c0 = cells.persist() // capGroupSize counts, then both join sides
    val b = graft.core.Skew.capGroupSize(c0, Seq("cell"), maxCellSize)
    val pairs = b.toDF("id1", "cell").join(b.toDF("id2", "cell"), Seq("cell"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2")
    val vecs = corpus.select(col(idCol).as("_vid"), col(vecCol).as("_v")).persist()
    val verified = pairs
      .join(vecs.select(col("_vid").as("id1"), col("_v").as("v1")), "id1")
      .join(vecs.select(col("_vid").as("id2"), col("_v").as("v2")), "id2")
      .filter(cosine_similarity(col("v1"), col("v2")) >= threshold)
      .select("id1", "id2")
      .localCheckpoint(true) // edge list materialized; release the caches
    c0.unpersist(false)
    vecs.unpersist(false)
    val clusters = Dedup.clusterPairs(verified) // (id, cluster_id = min id)
    corpus.select(col(idCol))
      .join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("rep_id"))
      .withColumn("kept", col("rep_id") === col(idCol))
  }

  /** Prototypicality-based density pruning (the "keep the hard
    * examples" data-pruning rule of Sorscher et al., NeurIPS'22
    * "Beyond neural scaling laws", applied with SemDeDup's k-means
    * cells, Abbas et al. '23): within each semantic cell, rank members
    * by cosine similarity to the cell CENTROID and drop the
    * `dropPct`-percent most prototypical — of a cell of near-redundant
    * web pages, the ones closest to the cell mean carry the least
    * marginal information, so they go first when a 100 TB corpus must
    * shrink to a token budget. Every cell keeps at least one member.
    *
    * Exactness: per-dim centroid sums are floor-microunit INTEGERS
    * (partitioning-independent — the q136 discipline); the centroid is
    * one exact division per dim; member→centroid cosine composes from
    * three sequential double dots; ranking happens on
    * floor(sim·10⁶) with id tie-breaks, so the kept set is a pure
    * function of (vectors, cells, dropPct) that any engine reproduces.
    *
    * Scale shape: the melt is O(n·dim) map-side-combinable partial
    * sums; centroids are O(cells·dim) rows; scoring is one equi-join
    * on cell + map-only dot arithmetic; the rank window partitions by
    * cell (cells are occupancy-bounded by construction —
    * [[semanticCells]] sizes k = n/targetCellSize). Nothing global.
    *
    * `cells` must be the (id, cell) assignment the corpus was
    * partitioned with ([[semanticCells]] — dump it for the oracle).
    */
  def densityPrune(corpus: DataFrame, cells: DataFrame, dropPct: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding"):
      DataFrame = {
    require(dropPct >= 0 && dropPct < 100, "dropPct must be in [0, 100)")
    val m = corpus
      .select(col(idCol).as("id"), transform(col(vecCol), _.cast("double")).as("__dv"))
      .join(cells.select(col("id"), col("cell")), "id")
    val sums = m
      .select(col("cell"), posexplode(col("__dv")).as(Seq("dim", "x")))
      .groupBy("cell", "dim")
      .agg(sum(floor(col("x") * 1e6).cast("long")).as("sm"))
    val cnt = m.groupBy("cell").agg(count(lit(1)).as("n_cell"))
    val cents = sums.join(cnt, "cell")
      .groupBy("cell", "n_cell")
      .agg(array_sort(collect_list(struct(col("dim"), col("sm")))).as("__ds"))
      .select(col("cell"), col("n_cell"),
        transform(col("__ds"), s => s("sm").cast("double") / col("n_cell")).as("__cv"))
    val num = double_dot_product(col("__dv"), col("__cv"))
    val na = double_dot_product(col("__dv"), col("__dv"))
    val nb = double_dot_product(col("__cv"), col("__cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cell").orderBy(col("proto_micro").desc, col("id"))
    m.join(cents, "cell")
      .withColumn("proto_micro",
        floor(when(na === 0.0 || nb === 0.0, lit(0.0))
          .otherwise(num / (sqrt(na) * sqrt(nb))) * 1e6).cast("long"))
      .withColumn("proto_rank", row_number().over(w).cast("long"))
      // ceil(n·pct/100) in pure int64 arithmetic; never empty a cell
      .withColumn("__ndrop",
        least(expr(s"(n_cell * $dropPct + 99) div 100"), col("n_cell") - 1))
      .select(col("id"), col("cell"), col("n_cell"), col("proto_micro"),
        col("proto_rank"), (col("proto_rank") > col("__ndrop")).as("kept"))
  }

  /** Plain-Scala exact top-k oracle for tests (drives nothing at scale). */
  def bruteForceOracle(corpus: Seq[(Long, Array[Float])], queries: Seq[(Long, Array[Float])],
                       k: Int): Map[Long, Seq[Long]] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      val d = math.sqrt(na) * math.sqrt(nb); if (d == 0) 0.0 else dot / d
    }
    queries.map { case (qid, qv) =>
      qid -> corpus.filter(_._1 != qid)
        .map { case (cid, cv) => (cid, cos(cv, qv)) }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(k).map(_._1)
    }.toMap
  }

  /** Margin-based mutual-nearest-neighbor pair mining (Artetxe &
    * Schwenk, ACL'19 "Margin-based Parallel Corpus Mining" — the
    * standard bitext/paired-data miner, also the alignment step of
    * cross-modal pair curation): a pair (a, b) survives when each side
    * is the other's best candidate under the RATIO margin
    *
    *   margin(a, b) = cos(a, b) / ((avgTopK_B(a) + avgTopK_A(b)) / 2)
    *
    * which normalizes away hubness — a vector whose whole neighborhood
    * is close (a hub) must beat its own neighborhood average to pair.
    *
    * This overload mines over PRE-COMPUTED per-side candidate lists
    * (`ab` = per-a top-k in B, `ba` = per-b top-k in A, both in
    * [[topKBruteForce]]'s (query_id, neighbor_id, sim, rank) shape) —
    * the 100 TB path feeds ANN candidates ([[topKLsh]] / [[topKIvf]] /
    * [[graft.ext.IvfPq.topKIvfPq]]) instead of exact lists; the margin
    * algebra downstream is identical. Per-id denominators are
    * rank-ordered sequential folds (deterministic regardless of
    * partitioning); margins round to `scale` decimals before the
    * argmax, ties to the smaller counterpart id.
    *
    * Scale shape: candidate frames are O(n·k); denominator frames are
    * O(n); the best-pair windows partition per id over ≤ 2k rows.
    * Output: (id_a, id_b, sim, margin) for mutual pairs with
    * margin ≥ minMargin (and sim ≥ minSim when set — the ratio margin
    * normalizes hubness, not absolute quality, so on weakly-aligned
    * spaces practitioners also floor the raw cosine), the bit-exact
    * cosine alongside the rounded margin. */
  def mutualMarginPairsFrom(ab: DataFrame, ba: DataFrame,
                            minMargin: Double, scale: Int = 4,
                            minSim: Double = -1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    def sideAvg(knn: DataFrame, idOut: String, avgOut: String): DataFrame =
      knn.groupBy(col("query_id").as(idOut))
        .agg((aggregate(
          transform(array_sort(collect_list(struct(col("rank"), col("sim")))),
            s => s.getField("sim")),
          lit(0.0), (acc, x) => acc + x) / count(lit(1))).as(avgOut))
    val aAvg = sideAvg(ab, "id_a", "avg_a")
    val bAvg = sideAvg(ba, "id_b", "avg_b")
    val pairs = ab.select(col("query_id").as("id_a"),
        col("neighbor_id").as("id_b"), col("sim"))
      .unionByName(ba.select(col("neighbor_id").as("id_a"),
        col("query_id").as("id_b"), col("sim")))
      // key-dedup, NOT distinct(): approximate candidate lists (per-side
      // IVF-PQ with different codebooks) can surface the same pair with
      // two different sims — distinct() would keep both rows and rank-1
      // could split across the copies, dropping a genuinely mutual pair
      .groupBy("id_a", "id_b").agg(max(col("sim")).as("sim"))
    val m = pairs
      .join(aAvg, Seq("id_a"))
      .join(bAvg, Seq("id_b"))
      .withColumn("margin",
        round(col("sim") / ((col("avg_a") + col("avg_b")) / 2), scale))
    val fwd = Window.partitionBy("id_a").orderBy(col("margin").desc, col("id_b").asc)
    val bwd = Window.partitionBy("id_b").orderBy(col("margin").desc, col("id_a").asc)
    m.withColumn("__rf", row_number().over(fwd))
      .withColumn("__rb", row_number().over(bwd))
      .filter(col("__rf") === 1 && col("__rb") === 1 &&
        col("margin") >= minMargin && col("sim") >= minSim)
      .select("id_a", "id_b", "sim", "margin")
  }

  /** [[mutualMarginPairsFrom]] with exact brute-force candidate lists —
    * the small-corpus / validation path (each side broadcasts as the
    * query batch of the other's scan). */
  def mutualMarginPairs(a: DataFrame, b: DataFrame, k: Int, minMargin: Double,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        scale: Int = 4, minSim: Double = -1.0): DataFrame =
    mutualMarginPairsFrom(
      topKBruteForce(b, a, k, idCol, vecCol),
      topKBruteForce(a, b, k, idCol, vecCol), minMargin, scale, minSim)
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI'11) — the memory-bounded ANN path.
  *
  * The vector splits into `m` subvectors; each subspace gets its own
  * k-means codebook ([[KMeans.fit]] per subspace — deterministic exact
  * update arithmetic, so codebooks and therefore codes and candidate
  * sets are reproducible for (corpus, params, seed), which is what lets
  * the driver oracle re-rank EXACTLY the dumped candidate set, the same
  * contract as the LSH/IVF paths). A vector is then `m` small codes: at
  * (m=8, k=16) a 64-float embedding becomes 8 codes — a 256-byte row
  * shrinks to 8, so the ANN scan reads ~32× less and a 10⁹-vector index
  * fits where raw vectors never would.
  *
  * Scoring is ADC (asymmetric distance computation): the query stays
  * exact; the corpus side is reconstructed from codebook centroids —
  * expressed here as `cosine_similarity(reconstruct(codes), query)` over
  * a broadcast-literal codebook, so the whole scoring pass is built-in
  * codegen'd expressions over the CODES table; raw corpus vectors are
  * touched only to exact-re-rank the final `k × refine` candidates per
  * query.
  *
  * Scale shape: corpus scanned once (codes only), queries broadcast,
  * per-query candidates ranked by the bounded [[graft.functions.TopK]]
  * heap (shuffle O(queries × k·refine), never a global sort), exact
  * re-rank joins vectors back for candidates only.
  */
object PQ {

  /** Per-subspace codebooks: `books(s)(j)` = centroid j of subspace s. */
  final case class Codebooks(m: Int, subDim: Int, k: Int,
                             books: Seq[Seq[Seq[Float]]])

  /** Fit per-subspace codebooks. `dim` must split evenly into `m`.
    *
    * Small-corpus fast path: when the whole training set fits the driver
    * threshold (the regime [[KMeans.fit]] would run its in-memory
    * Lloyd's for anyway), ONE collect carries the vector plus all `m`
    * per-subspace sort hashes, and the m sub-fits run locally —
    * 2 Spark jobs instead of m×(count + collect). Bit-exact with the
    * per-subspace path: same hash sort keys (`xxhash64(id, seed + s)`),
    * same slice, same [[KMeans.lloyd]] arithmetic. Above the threshold
    * (or when subsampling would differ per subspace) each subspace runs
    * [[KMeans.fit]]'s usual bounded-cost path — at deployment scale the
    * fit is once-per-index and `trainTarget` bounds it regardless. */
  def fit(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
          m: Int = 8, k: Int = 16, iterations: Int = 5, seed: Long = 42L,
          trainTarget: Int = 100000, driverThreshold: Long = 20000L): Codebooks = {
    require(dim % m == 0, s"dim=$dim must split into m=$m subvectors")
    val subDim = dim / m
    // one cached projection feeds all m sub-fits — each KMeans.fit runs
    // count + `iterations` passes, and without the cache every pass of
    // every subspace would re-scan the source
    val base = corpus.select(col(idCol), col(vecCol)).persist()
    try {
      val n = base.count()
      require(n > 0, "empty training corpus")
      val sampleOneIn =
        if (trainTarget <= 0) 1L else math.max(1L, n / trainTarget)
      val books =
        // clamp to KMeans.fit's own in-driver threshold (20000): above it
        // the slow path would choose fitDistributed (decimal sums), and the
        // "bit-exact with the per-subspace path" contract only holds while
        // both paths would run the same in-memory lloyd
        if (n <= math.min(driverThreshold, 20000L) && sampleOneIn == 1) {
          val rows = base.select(col(vecCol).cast("array<float>").as("__v"),
              array((0 until m).map(s =>
                xxhash64(col(idCol), lit(seed + s))): _*).as("__hs"))
            .collect()
            .map(r => (r.getSeq[Float](0), r.getSeq[Long](1)))
          (0 until m).map { s =>
            val sample = rows.sortBy(_._2(s))
              .map(_._1.slice(s * subDim, (s + 1) * subDim).toArray)
            val kk = math.min(k, sample.length)
            val init = sample.take(kk)
              .map(v => KMeans.normalize(v.map(_.toDouble).padTo(subDim, 0.0)))
            KMeans.lloyd(sample, init, subDim, iterations)
              .map(_.toSeq).toSeq
          }
        } else (0 until m).map { s =>
          val sub = base.select(col(idCol),
            expr(s"slice($vecCol, ${s * subDim + 1}, $subDim)").as("__sub"))
          KMeans.fit(sub, idCol, "__sub", k, subDim, iterations, seed + s, trainTarget)
            .grouped(subDim).map(_.toSeq).toSeq
        }
      Codebooks(m, subDim, k, books)
    } finally { base.unpersist(false): Unit }
  }

  /** The `m` per-subspace code columns for `vecCol` — shared by [[encode]]
    * and [[IvfPq.encode]] (which keeps its coarse `cell` column alongside). */
  private[ext] def codeColumns(cb: Codebooks, vecCol: String): Seq[Column] =
    (0 until cb.m).map { s =>
      VectorFunctions.nearest_centroids(
        expr(s"slice($vecCol, ${s * cb.subDim + 1}, ${cb.subDim})"),
        cb.books(s).flatten.toArray, cb.subDim, 1)(0)
    }

  /** Encode every vector as its `m` nearest-subspace-centroid codes.
    * One map-side pass; the codegen'd nearest-centroid kernel runs per
    * subspace over the sliced vector. */
  def encode(corpus: DataFrame, cb: Codebooks,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol), array(codeColumns(cb, vecCol): _*).as("codes"))

  /** `reconstruct(codes)` as a Column: concatenation of each subspace's
    * coded centroid from the broadcast-literal codebook — array<float>,
    * feeding the same codegen'd cosine kernel the exact paths use. */
  private[ext] def reconstruct(cb: Codebooks, codes: Column): Column = {
    // flat literal: entry s*k + j = centroid j of subspace s
    val flat = typedlit(cb.books.flatten)
    flatten(transform(sequence(lit(0), lit(cb.m - 1)),
      s => element_at(flat, s * cb.k + element_at(codes, s + 1) + 1)))
  }

  /** PQ candidate pairs: per query, the `nCandidates` best corpus ids by
    * ADC score over the codes table. Deterministic for (corpus, params,
    * seed) — the driver oracle re-ranks exactly this set. */
  def pqCandidates(corpus: DataFrame, queries: DataFrame, cb: Codebooks,
                   nCandidates: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    pqCandidatesFromCodes(encode(corpus, cb, idCol, vecCol), queries, cb,
      nCandidates, idCol, vecCol)

  /** [[pqCandidates]] over a PRE-ENCODED codes table (idCol, codes) —
    * the path a materialized PQ index takes ([[graft.streaming.AnnStream]]
    * stores codes once per micro-batch; queries then scan 8-byte code
    * rows instead of re-encoding the corpus, and a parquet-backed codes
    * store reads ONLY the codes column). Identical plan downstream of
    * the encode, so `pqCandidates ≡ pqCandidatesFromCodes ∘ encode` by
    * construction. */
  def pqCandidatesFromCodes(codes: DataFrame, queries: DataFrame, cb: Codebooks,
                            nCandidates: Int,
                            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv")))
    val scored = codes.select(col(idCol).as("neighbor_id"), col("codes"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("_adc", VectorFunctions.cosine_similarity(
        reconstruct(cb, col("codes")), col("_qv")))
    scored.groupBy("query_id")
      .agg(graft.functions.TopK.top_k(nCandidates)(col("neighbor_id"), col("_adc")).as("top"))
      .select(col("query_id"), explode(col("top")).as("c"))
      .select(col("query_id"), col("c.id").as("neighbor_id"))
  }

  /** PQ approximate top-k: ADC candidates, exact cosine re-rank of the
    * `k × refine` survivors — raw vectors touched only for those. */
  def topKPq(corpus: DataFrame, queries: DataFrame, k: Int, cb: Codebooks,
             refine: Int = 4,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Similarity.rankCandidates(
      pqCandidates(corpus, queries, cb, k * refine, idCol, vecCol),
      corpus, queries, k, idCol, vecCol)
}

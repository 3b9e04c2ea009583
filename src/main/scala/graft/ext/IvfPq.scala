package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** IVF-PQ: the composed billion-vector ANN index (Jégou et al., TPAMI'11
  * §V "IVFADC") — an IVF coarse quantizer partitions the corpus into
  * centroid cells, and a product quantizer codes each vector's RESIDUAL
  * (vector − cell centroid) within its cell. Queries probe only their
  * `nProbe` nearest cells and ADC-score only the codes stored there.
  *
  * Why the composition beats either half alone at 100 TB:
  *  - flat PQ ([[PQ]]) still scans EVERY code row per query — small rows,
  *    but O(corpus) work per batch of queries;
  *  - IVF ([[Similarity.topKIvf]]) prunes to nProbe/numCells of the
  *    corpus but drags full float vectors through the candidate scan;
  *  - IVF-PQ prunes the scan AND shrinks the scanned rows to `m` byte-ish
  *    codes — the scan cost is (nProbe/numCells) × (codes width), the
  *    standard architecture for 10⁹-vector indexes. Residual coding also
  *    quantizes finer: displacements within a cell are much smaller than
  *    raw vectors, so the same m×k code budget spends its resolution on
  *    the part the coarse quantizer didn't explain.
  *
  * Scale shape: the codes store is (id, cell, codes) — written
  * `partitionBy("cell")` via [[writeCodes]], probed cells become a STATIC
  * `cell IN (...)` partition filter ([[candidatesFromCodesDir]]): the file
  * scan reads only probed directories (the probe-cell set is known before
  * the scan and is ≤ numCells values — never data-dependent collection).
  * The probe side broadcasts (queries ≪ corpus), ADC scoring is built-in
  * codegen'd expressions over a broadcast-literal codebook, candidates
  * rank through the bounded [[graft.functions.TopK]] heap, and raw
  * vectors are touched only to exact-re-rank `k × refine` survivors.
  *
  * Determinism: both fits are [[KMeans.fit]] (exact decimal update
  * arithmetic — partitioning-independent), so (corpus, params, seed)
  * reproduce the index, the codes, and therefore the candidate set
  * exactly: the driver oracle re-ranks EXACTLY the dumped candidates,
  * the same contract as the LSH/IVF/PQ paths (q30/q33/q91).
  */
object IvfPq {

  /** A fitted IVF-PQ index: flat coarse centroids (row-major, `numCells ×
    * dim`) + per-subspace residual codebooks. */
  final case class Index(centroidsFlat: Array[Float], dim: Int, numCells: Int,
                         cb: PQ.Codebooks)

  /** Cell centroid as a Column: a slice of the broadcast-literal flat
    * centroid array at the (runtime) cell id. */
  private def centroidOf(idx: Index, cell: Column): Column =
    slice(typedlit(idx.centroidsFlat.toSeq), cell * idx.dim + 1, lit(idx.dim))

  /** Tag each vector with its coarse cell and compute the residual the
    * product quantizer codes. One map-side pass, all codegen'd built-ins. */
  private def residuals(corpus: DataFrame, idx: Index,
                        idCol: String, vecCol: String): DataFrame =
    corpus
      .withColumn("__cell", VectorFunctions.nearest_centroids(
        col(vecCol), idx.centroidsFlat, idx.dim, 1)(0))
      .select(col(idCol), col("__cell").as("cell"),
        zip_with(col(vecCol), centroidOf(idx, col("__cell")),
          (a, b) => a - b).as("__resid"))

  /** Fit the coarse quantizer, then the residual PQ codebooks.
    * `trainTarget` bounds BOTH training passes via [[KMeans.fit]]'s
    * deterministic hash subsample — never a driver collect of the corpus. */
  def fit(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
          numCells: Int = 64, m: Int = 8, k: Int = 16, iterations: Int = 5,
          seed: Long = 42L, trainTarget: Int = 100000): Index = {
    require(dim % m == 0, s"dim=$dim must split into m=$m subvectors")
    val cents = KMeans.fit(corpus, idCol, vecCol, numCells, dim, iterations,
      seed, trainTarget)
    val coarse = Index(cents, dim, cents.length / dim, null)
    // residual corpus feeds the PQ fit: disjoint seed space from the
    // coarse fit so subspace s of the PQ never reuses a coarse hyperplane
    val resid = residuals(corpus, coarse, idCol, vecCol)
    val cb = PQ.fit(resid, idCol, "__resid", dim, m, k, iterations,
      seed + 7919, trainTarget)
    coarse.copy(cb = cb)
  }

  /** Encode the corpus as (id, cell, codes): the coarse cell plus the `m`
    * residual codes. This is the index's ENTIRE per-vector storage — at
    * (m=8, k=16) a 64-float row becomes one int + 8 small ints. */
  def encode(corpus: DataFrame, idx: Index,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val r = residuals(corpus, idx, idCol, vecCol)
    r.select(col(idCol), col("cell"),
      array(PQ.codeColumns(idx.cb, "__resid"): _*).as("codes"))
  }

  /** Materialize the codes store partitioned by cell: probed cells then
    * prune whole directories ([[candidatesFromCodesDir]]) — the layout
    * that turns "probe 8 of 1024 cells" into reading 8/1024 of the index. */
  def writeCodes(corpus: DataFrame, idx: Index, path: String,
                 idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    encode(corpus, idx, idCol, vecCol)
      .write.partitionBy("cell").mode("overwrite").parquet(path)

  /** ADC candidate generation over any (id, cell, codes) frame: queries
    * probe `nProbe` cells (broadcast), the equi-join on `cell` prunes the
    * codes side, ADC = cosine(cell centroid + reconstructed residual,
    * query) — all broadcast-literal codegen'd expressions — and the
    * bounded top-k heap keeps `nCandidates` per query. */
  def candidatesFromCodes(codes: DataFrame, queries: DataFrame, idx: Index,
                          nProbe: Int, nCandidates: Int,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("_qv"),
      explode(VectorFunctions.nearest_centroids(
        col(vecCol), idx.centroidsFlat, idx.dim, nProbe)).as("cell")))
    val scored = codes
      .select(col(idCol).as("neighbor_id"), col("cell"), col("codes"))
      .join(q, "cell") // a neighbor lives in exactly ONE cell: pairs unique
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("_adc", VectorFunctions.cosine_similarity(
        zip_with(centroidOf(idx, col("cell")),
          PQ.reconstruct(idx.cb, col("codes")), (a, b) => a + b),
        col("_qv")))
    scored.groupBy("query_id")
      .agg(graft.functions.TopK.top_k(nCandidates)(
        col("neighbor_id"), col("_adc")).as("top"))
      .select(col("query_id"), explode(col("top")).as("c"))
      .select(col("query_id"), col("c.id").as("neighbor_id"))
  }

  /** [[candidatesFromCodes]] over a [[writeCodes]] store, with the probe
    * cells pushed down as a STATIC partition filter: the probe-cell set
    * is computed first (≤ numCells distinct values — bounded by the index
    * shape, not the data), so the parquet scan plans `cell IN (...)` in
    * PartitionFilters and never opens a non-probed directory. Static
    * pruning is deliberate over dynamic: the cell set is known before the
    * scan, and a plan-time filter survives every join strategy. */
  def candidatesFromCodesDir(spark: SparkSession, codesPath: String,
                             queries: DataFrame, idx: Index,
                             nProbe: Int, nCandidates: Int,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding"): DataFrame = {
    val probed = queries.select(explode(VectorFunctions.nearest_centroids(
        col(vecCol), idx.centroidsFlat, idx.dim, nProbe)).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val codes = spark.read.parquet(codesPath)
      .filter(col("cell").isin(probed: _*))
    candidatesFromCodes(codes, queries, idx, nProbe, nCandidates, idCol, vecCol)
  }

  /** IVF-PQ candidates straight from a raw corpus (encode inline). */
  def ivfPqCandidates(corpus: DataFrame, queries: DataFrame, idx: Index,
                      nProbe: Int, nCandidates: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame =
    candidatesFromCodes(encode(corpus, idx, idCol, vecCol), queries, idx,
      nProbe, nCandidates, idCol, vecCol)

  /** IVF-PQ approximate top-k: cell-pruned ADC candidates, exact cosine
    * re-rank of the `k × refine` survivors — raw vectors touched only for
    * those ([[Similarity.rankCandidates]]' shuffle discipline). */
  def topKIvfPq(corpus: DataFrame, queries: DataFrame, k: Int, idx: Index,
                nProbe: Int = 8, refine: Int = 4,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Similarity.rankCandidates(
      ivfPqCandidates(corpus, queries, idx, nProbe, k * refine, idCol, vecCol),
      corpus, queries, k, idCol, vecCol)
}

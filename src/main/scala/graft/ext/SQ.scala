package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Int8 scalar quantization (SQ8) for the ANN scan — the middle rung of
  * the compression ladder: raw float32 (q29) → SQ8 at 4× smaller →
  * PQ/IVF-PQ (q91/q102) at ~32×. Each dimension gets a linear [lo, hi]
  * grid from corpus min/max; vectors become `dim` BYTES and the
  * candidate scan reads bytes instead of floats with far less recall
  * loss than PQ (256 levels per dim vs 16 centroids per 8-dim subspace).
  * The faiss `ScalarQuantizer(QT_8bit)` / Lucene int8-HNSW layout.
  *
  * Scale shape: the fit is ONE map-side-combinable aggregation pass
  * (per-dim min/max partials — 2·dim doubles per partition reach the
  * shuffle, the model is O(dim) and rides expressions as
  * broadcast-literal arrays); encode and the ADC scan are map-only
  * codegen'd expressions ([[graft.functions.Sq8Encode]] /
  * [[graft.functions.Sq8Cosine]]); candidate selection is the bounded
  * top-k heap (shuffles O(queries × n), never the corpus); the exact
  * re-rank joins raw vectors back for candidate rows only
  * ([[Similarity.rankCandidates]]'s discipline).
  *
  * Determinism: min/max involve no arithmetic (exact, order-independent),
  * the encode rule is explicit IEEE ops in a fixed order
  * (floor((x − lo)/step + 0.5), clamp), and the ADC score is a
  * sequential per-row fold — so the fit, the codes, and the candidate
  * set are pure functions of (corpus, dim), independent of partitioning,
  * and the driver oracle can exactly re-rank the dumped candidates.
  */
object SQ {

  /** The quantization grid: per-dim lower bound and step (hi − lo)/255.
    * O(dim) — broadcast-literal, never a join. */
  case class Model(lo: Array[Double], step: Array[Double])

  /** Per-dim corpus min/max → [[Model]]. One aggregation pass: posexplode
    * is map-side (fused into the scan), partial min/max combine before
    * the 2·dim-value shuffle; `dim` rows collect to the driver. */
  def fit(corpus: DataFrame, vecCol: String, dim: Int): Model = {
    require(dim > 0, "dim must be positive")
    val rows = corpus
      .select(posexplode(col(vecCol)).as(Seq("__j", "__x")))
      .groupBy("__j")
      .agg(min(col("__x")).as("__lo"), max(col("__x")).as("__hi"))
      .collect()
    val lo = new Array[Double](dim)
    val step = new Array[Double](dim)
    rows.foreach { r =>
      val j = r.getInt(0)
      if (j < dim) {
        lo(j) = r.getFloat(1).toDouble
        step(j) = (r.getFloat(2).toDouble - r.getFloat(1).toDouble) / 255.0
      }
    }
    Model(lo, step)
  }

  /** (id, sq_code BINARY) — the `dim`-byte index frame. Map-only. */
  def encode(df: DataFrame, model: Model,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol),
      VectorFunctions.sq8_encode(col(vecCol), model.lo, model.step).as("sq_code"))

  /** Deterministic SQ8 candidate pairs: per query, the `nCandidates`
    * corpus ids with the highest dequantized-cosine ADC score (ties to
    * the smaller id — [[graft.functions.TopK]]'s contract). Bare id
    * pairs; vectors attach only in the re-rank. */
  def sqCandidates(corpus: DataFrame, queries: DataFrame, model: Model,
                   nCandidates: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = encode(corpus, model, idCol, vecCol)
      .withColumnRenamed(idCol, "neighbor_id").withColumnRenamed("sq_code", "__cc")
    val qb = broadcast(encode(queries, model, idCol, vecCol)
      .withColumnRenamed(idCol, "query_id").withColumnRenamed("sq_code", "__qc"))
    val scored = cb.crossJoin(qb)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__sim",
        VectorFunctions.sq8_cosine(col("__cc"), col("__qc"), model.lo, model.step))
    scored.groupBy("query_id")
      .agg(graft.functions.TopK.top_k(nCandidates)(col("neighbor_id"), col("__sim")).as("top"))
      .select(col("query_id"), explode(col("top")).as("c"))
      .select(col("query_id"), col("c.id").as("neighbor_id"))
  }

  /** SQ8 approximate top-k: byte-code ADC scan selects k·refine
    * candidates, exact cosine re-ranks ([[Similarity.rankCandidates]] —
    * q30/q33/q91's contract, so the same candidate-dump oracle applies). */
  def topKSq(corpus: DataFrame, queries: DataFrame, k: Int, model: Model,
             refine: Int = 4,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Similarity.rankCandidates(
      sqCandidates(corpus, queries, model, k * refine, idCol, vecCol),
      corpus, queries, k, idCol, vecCol)
}

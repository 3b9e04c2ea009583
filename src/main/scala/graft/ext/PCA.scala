package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorFunctions

/** Principal component analysis over an embedding column — the
  * dimensionality-reduction stage a 100 TB vector pipeline runs before
  * indexing (project 64-dim → 8-dim, then build the ANN index on the
  * compact vectors; the same role Johnson–Lindenstrauss projections and
  * OPQ rotations play in billion-scale retrieval stacks).
  *
  * Scale shape — covariance is ONE distributed pass, eigensolving is
  * driver-side O(dim³) on a dim×dim matrix (trivial at embedding dims;
  * the corpus size never touches the eigensolver):
  *  1. each row melts its upper-triangle outer product (dim·(dim+1)/2
  *     entries) plus its raw components into (k, value) pairs — a
  *     map-side-combinable hash aggregation of ≤ dim² + dim groups, so
  *     the shuffle moves per-partition partial sums, never row data;
  *  2. sums accumulate in DECIMAL(38,18): every double term rounds to
  *     the same fixed point regardless of arrival order, so the model
  *     is partitioning-independent bit-for-bit (the KMeans
  *     fitDistributed discipline);
  *  3. the driver assembles the covariance matrix and runs cyclic
  *     Jacobi (fixed sweep order → deterministic), sorts eigenpairs by
  *     descending eigenvalue, and sign-fixes each eigenvector (largest-
  *     magnitude component positive) so the model is unique.
  *
  * Projection is map-only: per component, one codegen'd sequential
  * double dot product ([[graft.functions.DoubleDotProduct]]) against a
  * broadcast-literal component vector, minus a precomputed mean bias —
  * the bit-identical shape DuckDB's list kernels recompute, which is
  * what makes the query oracle-able.
  */
object PCA {

  /** `mean` is the column mean; `components`(c) is the c-th unit
    * eigenvector (descending `eigenvalues`); both length-`dim`. */
  case class Model(dim: Int, n: Long, mean: Array[Double],
                   eigenvalues: Array[Double],
                   components: Array[Array[Double]]) {
    /** dot(mean, component c) — the constant the centered projection
      * subtracts: dot(x − μ, w) = dot(x, w) − dot(μ, w). */
    def bias(c: Int): Double = {
      var s = 0.0; var j = 0
      while (j < dim) { s += mean(j) * components(c)(j); j += 1 }
      s
    }
  }

  /** One-pass covariance + driver Jacobi. `nComponents` ≤ `dim`. */
  def fit(corpus: DataFrame, vecCol: String, dim: Int,
          nComponents: Int): Model = {
    require(dim > 0 && nComponents > 0 && nComponents <= dim)
    val v = corpus.select(col(vecCol).cast("array<double>").as("__v"))
      .filter(size(col("__v")) === dim)
    // melt: upper-triangle products keyed i*dim+j, raw components keyed
    // dim*dim+j, one constant count key dim*dim+dim. The lambdas index a
    // BOUND column (__v), so element_at is O(1) per access.
    val tri = flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
      transform(sequence(i, lit(dim - 1)), j =>
        struct((i * dim + j).cast("long").as("k"),
          (element_at(col("__v"), (i + 1).cast("int")) *
            element_at(col("__v"), (j + 1).cast("int"))).as("p")))))
    val raw = transform(sequence(lit(0), lit(dim - 1)), j =>
      struct((j + dim * dim).cast("long").as("k"),
        element_at(col("__v"), (j + 1).cast("int")).as("p")))
    val one = array(struct(lit((dim * dim + dim).toLong).as("k"),
      lit(1.0).as("p")))
    val sums = v
      .select(explode(concat(tri, raw, one)).as("e"))
      .groupBy(col("e.k").as("k"))
      .agg(sum(col("e.p").cast(DecimalType(38, 18))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    val n = sums.getOrElse((dim * dim + dim).toLong, 0.0)
    require(n >= 2, s"PCA needs >= 2 rows of dim=$dim, saw ${n.toLong}")
    val mean = Array.tabulate(dim)(j => sums((j + dim * dim).toLong) / n)
    val cov = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- i until dim) {
      val s2 = sums((i * dim + j).toLong)
      val c = s2 / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (values, vectors) = jacobi(cov, dim)
    // order: eigenvalue desc, original index asc on exact ties; then
    // sign-fix (largest-|component| entry positive, first index wins)
    val order = (0 until dim).sortBy(c => (-values(c), c)).take(nComponents)
    val comps = order.map { c =>
      val w = Array.tabulate(dim)(j => vectors(j)(c))
      val pivot = (0 until dim).maxBy(j => (math.abs(w(j)), -j))
      if (w(pivot) < 0) w.map(x => -x) else w
    }.toArray
    Model(dim, n.toLong, mean, order.map(values).toArray, comps)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector COLUMNS). Fixed (p,q) sweep order and a
    * fixed convergence threshold make the result a pure function of the
    * input matrix. */
  private def jacobi(a0: Array[Array[Double]], dim: Int)
      : (Array[Double], Array[Array[Double]]) = {
    val a = a0.map(_.clone())
    val vec = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 100 && offDiag(a, dim) > 1e-11) {
      for (p <- 0 until dim - 1; q <- p + 1 until dim if a(p)(q) != 0.0) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
            case 0.0 => 1.0 // theta == 0 → 45° rotation
            case x => x
          }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (k <- 0 until dim) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
        }
        for (k <- 0 until dim) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
        }
        for (k <- 0 until dim) {
          val vkp = vec(k)(p); val vkq = vec(k)(q)
          vec(k)(p) = c * vkp - s * vkq
          vec(k)(q) = s * vkp + c * vkq
        }
      }
      sweep += 1
    }
    (Array.tabulate(dim)(i => a(i)(i)), vec)
  }

  private def offDiag(a: Array[Array[Double]], dim: Int): Double = {
    var s = 0.0
    for (i <- 0 until dim - 1; j <- i + 1 until dim) s += math.abs(a(i)(j))
    s
  }

  /** Long-format centered projections: one row per (id, component),
    * `proj` = dot(x − μ, w_c) rounded to `scale` decimals. Map-only —
    * components ride the task binary as array literals, each projection
    * is one codegen'd sequential dot product, and the posexplode fans
    * out `nComponents` rows per input row with no shuffle. */
  def project(corpus: DataFrame, idCol: String, vecCol: String,
              model: Model, scale: Int = 4): DataFrame = {
    val x = col(vecCol).cast("array<double>")
    val projections = array(model.components.indices.map { c =>
      round(VectorFunctions.double_dot_product(x, lit(model.components(c))) -
        model.bias(c), scale)
    }: _*)
    corpus
      .select(col(idCol), posexplode(projections).as(Seq("comp", "proj")))
      .select(col(idCol), col("comp").cast("long").as("comp"), col("proj"))
  }

  /** The model as a frame — (comp, j, w, bias) rows — for dumping next
    * to projection outputs so an independent engine can recompute the
    * projections from raw vectors (the aux-dump oracle contract). */
  def modelFrame(model: Model, corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    model.components.indices.flatMap { c =>
      model.components(c).indices.map(j =>
        (c.toLong, j.toLong, model.components(c)(j), model.bias(c)))
    }.toDF("comp", "j", "w", "bias")
  }

  /** Fraction of total variance the model's components carry —
    * the fit-quality scalar an index-build job logs. */
  def explainedVariance(model: Model, totalVariance: Double): Double =
    if (totalVariance <= 0) 0.0 else model.eigenvalues.sum / totalVariance
}

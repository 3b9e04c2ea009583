package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  *  1. each partition accumulates the upper-triangle outer-product sums
  *     (dim·(dim+1)/2 entries) plus the component sums in a tight
  *     primitive loop over QUANTIZED components (x·10⁶ rounded to
  *     long): integer products are exact, partial sums fold into
  *     BigInt before a long could overflow, and the per-partition
  *     result is one ~(dim²/2)-entry array — what reaches the exchange
  *     is #partitions small arrays, never row data. (An expression-
  *     level melt — posexplode of the products + a decimal-sum hash
  *     aggregate — computes the same thing but pushes n·dim²/2 rows
  *     through Generate+HashAgg: measured 14× slower at 64 dims. This
  *     is the mapPartitions-as-last-resort case: a fixed-shape
  *     numerical kernel no built-in aggregate expresses.)
  *  2. exact integer partials merge on the driver in any order to the
  *     same totals, so the model is partitioning-independent
  *     bit-for-bit — the discipline KMeans.fitDistributed gets from
  *     decimal sums, here with zero per-term rounding (quantization
  *     happens once per input component, not per product);
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
    val nTri = dim * (dim + 1) / 2
    val (sums, n) = covSums(v, dim)
    require(n >= 2, s"PCA needs >= 2 rows of dim=$dim, saw $n")
    // quantized-integer totals → doubles: products carry scale 10¹²,
    // raw component sums scale 10⁶
    val mean = Array.tabulate(dim)(j =>
      (BigDecimal(sums(nTri + j)) / BigDecimal(1000000L)).toDouble / n.toDouble)
    // position → (i, j): the same (i asc, j >= i) enumeration the kernel used
    val triIndex = for (i <- 0 until dim; j <- i until dim) yield (i, j)
    val cov = Array.ofDim[Double](dim, dim)
    for (k <- 0 until nTri) {
      val (i, j) = triIndex(k)
      val s2 = (BigDecimal(sums(k)) / BigDecimal(1000000000000L)).toDouble
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

  /** The distributed covariance kernel: per partition, one tight loop
    * accumulates quantized (x·10⁶ → long) upper-triangle products plus
    * component sums into long arrays, folding into BigInt every 512
    * rows — products of |q| ≤ 10⁸ stay under 10¹⁶, so 512 terms cannot
    * overflow a long (the fold is ~4 BigInt adds per input row,
    * amortized noise). Exact integer arithmetic end-to-end: partials
    * merge to the same totals in any order. Requires |x| ≤ 100 per
    * component (any normalized embedding space is ≤ 1; enforced).
    * Returns (nTri products ++ dim component sums, n). */
  private def covSums(v: DataFrame, dim: Int): (Array[BigInt], Long) = {
    val nTri = dim * (dim + 1) / 2
    val width = nTri + dim
    val partials = v.queryExecution.toRdd.mapPartitions { it =>
      val acc = Array.fill(width)(BigInt(0))
      val lo = new Array[Long](width)
      val q = new Array[Long](dim)
      var cnt = 0L; var since = 0
      def flush(): Unit = {
        var k = 0
        while (k < width) { if (lo(k) != 0) { acc(k) += lo(k); lo(k) = 0 }; k += 1 }
        since = 0
      }
      while (it.hasNext) {
        val arr = it.next().getArray(0)
        var j = 0
        while (j < dim) {
          val x = arr.getDouble(j)
          require(math.abs(x) <= 100.0,
            s"PCA.fit expects |component| <= 100, saw $x")
          q(j) = Math.round(x * 1e6)
          j += 1
        }
        var k = 0; var i = 0
        while (i < dim) {
          val qi = q(i)
          var jj = i
          while (jj < dim) { lo(k) += qi * q(jj); k += 1; jj += 1 }
          i += 1
        }
        j = 0
        while (j < dim) { lo(nTri + j) += q(j); j += 1 }
        cnt += 1; since += 1
        if (since == 512) flush()
      }
      flush()
      Iterator.single((acc, cnt))
    }.collect()
    val totals = Array.fill(width)(BigInt(0))
    var n = 0L
    for ((acc, cnt) <- partials) {
      var k = 0
      while (k < width) { totals(k) += acc(k); k += 1 }
      n += cnt
    }
    (totals, n)
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

  /** Wide variant of [[project]]: (`idCol`, pvec) with the rounded
    * projections as ONE array<double> per row — the reduced vector the
    * ANN path indexes (the point of the reduction: a dim→c projection
    * cuts every downstream distance computation and index byte by
    * dim/c). Same per-component arithmetic as [[project]]. */
  def projectVectors(corpus: DataFrame, idCol: String, vecCol: String,
                     model: Model, scale: Int = 4): DataFrame = {
    val x = col(vecCol).cast("array<double>")
    corpus.select(col(idCol), array(model.components.indices.map { c =>
      round(VectorFunctions.double_dot_product(x, lit(model.components(c))) -
        model.bias(c), scale)
    }: _*).as("pvec"))
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

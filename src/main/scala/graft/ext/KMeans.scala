package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorFunctions

/** Spherical k-means over an embedding column — the coarse-quantizer
  * trainer for the IVF path.
  *
  * Two paths, chosen by TRAINING-SET size (the same adaptive discipline
  * as [[Dedup.clusterPairs]]):
  *  - at or below `driverThreshold` rows the (possibly subsampled)
  *    training set is collected and Lloyd's runs in memory — a bounded
  *    collect (100k × 64 floats ≈ 25 MB), orders of magnitude cheaper
  *    than launching one distributed aggregation per iteration;
  *  - above it, every iteration is distributed: assignment is the
  *    codegen'd [[VectorFunctions.nearest_centroids]] cosine argmax over
  *    the cached training frame, and the update is a posexplode →
  *    map-side-combinable partial agg into k×dim groups (the shuffle
  *    moves O(partitions × k × dim) pre-aggregated rows, not vectors;
  *    only k×dim scalars reach the driver). The full corpus NEVER
  *    collects regardless of size.
  *
  * DETERMINISTIC on both paths, independent of partitioning:
  *  - seeding: the k vectors with the smallest `xxhash64(id, seed)` — a
  *    seeded shuffle any engine reproduces, fetched via a top-k sort
  *    (TakeOrdered), never a full sort;
  *  - subsampling (`trainTarget`): `xxhash64(id, seed) % oneIn == 0`, a
  *    deterministic distributed filter — never a driver-bounded prefix;
  *  - driver path: the collected sample is sorted by the same hash, so
  *    float accumulation order is fixed no matter how the scan
  *    partitioned;
  *  - distributed path: per-(cell, dimension) sums in DECIMAL — exact,
  *    order-independent arithmetic, so task scheduling cannot perturb
  *    the fit. (Double sums would make the centroids — and every
  *    downstream IVF candidate set — depend on the task schedule,
  *    breaking the seed-deterministic contract the IVF oracle re-ranks
  *    against.)
  *
  * Path choice is itself deterministic (a row count), so a given
  * (corpus, parameters) pair always yields the same centroids.
  */
object KMeans {

  /** Fit unit-norm centroids; returns them row-major flattened (the shape
    * [[VectorFunctions.nearest_centroids]] broadcasts).
    *
    * `trainTarget` bounds training COST: above it the trainer uses a
    * deterministic hash subsample of ~that many rows (`<= 0` = train on
    * everything). `driverThreshold` picks the in-memory vs distributed
    * Lloyd's path by training-set size. */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
          k: Int, dim: Int, iterations: Int = 5, seed: Long = 42L,
          trainTarget: Int = 100000, driverThreshold: Long = 20000L): Array[Float] = {
    require(k > 0 && dim > 0 && iterations >= 0)
    val base = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val n = base.count()
    require(n > 0, "empty training corpus")
    val sampleOneIn =
      if (trainTarget <= 0) 1L else math.max(1L, n / trainTarget)
    val train =
      if (sampleOneIn > 1)
        base.filter(pmod(xxhash64(col("__id"), lit(seed)), lit(sampleOneIn)) === 0)
      else base
    val hashed = train.select(col("__v"), xxhash64(col("__id"), lit(seed)).as("__h"))
    if (n / sampleOneIn <= driverThreshold) fitDriver(hashed, k, dim, iterations)
    else fitDistributed(hashed, k, dim, iterations)
  }

  private[ext] def normalize(v: Array[Double]): Array[Float] = {
    val nrm = math.sqrt(v.map(x => x * x).sum)
    if (nrm == 0) v.map(_.toFloat) else v.map(x => (x / nrm).toFloat)
  }

  /** In-memory Lloyd's over the hash-SORTED sample: fixed accumulation
    * order ⇒ partitioning-independent floats. Ties go to the lower
    * centroid index, matching [[graft.functions.IvfKernel.nearest]]. */
  private def fitDriver(hashed: DataFrame, k: Int, dim: Int,
                        iterations: Int): Array[Float] = {
    val sample = hashed.orderBy("__h").collect()
      .map(_.getSeq[Float](0).toArray)
    val kk = math.min(k, sample.length)
    val init = sample.take(kk).map(v => normalize(v.map(_.toDouble).padTo(dim, 0.0)))
    lloyd(sample, init, dim, iterations).flatten
  }

  /** The deterministic in-memory Lloyd's loop both the driver path and
    * the per-super child fits run: fixed sample order, ties to the lower
    * centroid index, empty cells keep their centroid. */
  private[ext] def lloyd(sample: Array[Array[Float]], init: Array[Array[Float]],
                    dim: Int, iterations: Int): Array[Array[Float]] = {
    var centroids = init
    val kk = init.length
    var iter = 0
    while (iter < iterations && kk > 0) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      sample.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < kk) {
          var dot = 0.0; var i = 0; val cv = centroids(c)
          while (i < math.min(v.length, dim)) { dot += v(i) * cv(i); i += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
          c += 1
        }
        var i = 0
        while (i < math.min(v.length, dim)) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(kk) { c =>
        if (counts(c) == 0) centroids(c) else normalize(sums(c))
      }
      iter += 1
    }
    centroids
  }

  /** Two-level fit for hierarchical assignment
    * ([[graft.functions.VectorFunctions.nearest_child_cell]]): `k1`
    * super-centroids trained by [[fit]]'s usual path, then `k2` children
    * PER super fitted in memory over that super's slice of the hash
    * subsample. Returns (superFlat, childFlat) with every super owning
    * exactly `k2` contiguous children (supers with fewer sample vectors
    * than `k2` pad with their own super-centroid — duplicate children
    * tie toward the lower cell id, so assignment stays deterministic).
    *
    * Scale shape: fit cost is O(sample·k1·iter) + O(sample·iter·k2)
    * (each sample row trains against ONE super's k2 children), and the
    * resulting assignment kernel is O(k1 + nProbe·k2) per row — with
    * k1 ≈ k2 ≈ √k both stay O(√k) while flat fit/assign are O(k). */
  def fitHier(corpus: DataFrame, idCol: String, vecCol: String,
              k1: Int, k2: Int, dim: Int, iterations: Int = 5, seed: Long = 42L,
              trainTarget: Int = 100000): (Array[Float], Array[Float]) = {
    require(k1 > 0 && k2 > 0 && dim > 0 && iterations >= 0)
    val superFlat = fit(corpus, idCol, vecCol, k1, dim, iterations, seed, trainTarget)
    val nSup = superFlat.length / dim

    val base = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val n = base.count()
    val sampleOneIn =
      if (trainTarget <= 0) 1L else math.max(1L, n / trainTarget)
    val train =
      if (sampleOneIn > 1)
        base.filter(pmod(xxhash64(col("__id"), lit(seed)), lit(sampleOneIn)) === 0)
      else base
    // hash-sorted collect: same bounded size and determinism as fitDriver
    val sample = train
      .select(col("__v"), xxhash64(col("__id"), lit(seed)).as("__h"))
      .orderBy("__h").collect()
      .map(_.getSeq[Float](0).toArray)

    def superOf(v: Array[Float]): Int = {
      var best = 0; var bestDot = Double.NegativeInfinity
      var s = 0
      while (s < nSup) {
        var dot = 0.0; var i = 0; val b = s * dim
        while (i < math.min(v.length, dim)) { dot += v(i) * superFlat(b + i); i += 1 }
        if (dot > bestDot) { bestDot = dot; best = s }
        s += 1
      }
      best
    }
    val bySuper = Array.fill(nSup)(Vector.newBuilder[Array[Float]])
    sample.foreach(v => bySuper(superOf(v)) += v) // sample order preserved
    val childFlat = new Array[Float](nSup * k2 * dim)
    var s = 0
    while (s < nSup) {
      val grp = bySuper(s).result().toArray
      val kk = math.min(k2, grp.length)
      val init = grp.take(kk).map(v => normalize(v.map(_.toDouble).padTo(dim, 0.0)))
      val fitted = lloyd(grp, init, dim, iterations)
      var c = 0
      while (c < k2) {
        val src =
          if (c < fitted.length) fitted(c)
          else superFlat.slice(s * dim, (s + 1) * dim) // pad: the super itself
        System.arraycopy(src, 0, childFlat, (s * k2 + c) * dim, dim)
        c += 1
      }
      s += 1
    }
    (superFlat, childFlat)
  }

  private def fitDistributed(hashed: DataFrame, k: Int, dim: Int,
                             iterations: Int): Array[Float] = {
    val train = hashed.persist() // iterations + 1 passes read it
    // seeded deterministic init: k hash-minimal vectors
    val seeds = train
      .orderBy("__h").limit(k)
      .collect()
      .map(_.getSeq[Float](0).toArray)
    var centroids: Array[Float] = seeds
      .map(v => normalize(v.map(_.toDouble).padTo(dim, 0.0)))
      .flatten
    val nC = seeds.length // may be < k on tiny corpora

    var iter = 0
    while (iter < iterations) {
      val cell = VectorFunctions.nearest_centroids(col("__v"), centroids, dim, 1)(0)
      val rows = train
        .select(cell.as("__cell"), posexplode(col("__v")).as(Seq("__pos", "__x")))
        .groupBy("__cell", "__pos")
        .agg(sum(col("__x").cast(DecimalType(28, 10))).as("__s"),
             count(lit(1)).as("__n"))
        .collect()
      val sums = Array.fill(nC)(new Array[Double](dim))
      val counts = new Array[Long](nC)
      rows.foreach { r =>
        val c = r.getInt(0); val p = r.getInt(1)
        if (p < dim) {
          sums(c)(p) = r.getDecimal(2).doubleValue()
          counts(c) = r.getLong(3)
        }
      }
      centroids = Array.tabulate(nC) { c =>
        if (counts(c) == 0) // empty cell keeps its centroid (same rule as
          centroids.slice(c * dim, c * dim + dim) // the driver path)
        else normalize(sums(c))
      }.flatten
      iter += 1
    }
    train.unpersist(false)
    centroids
  }

  /** Cluster-separation monitor (a linear-time silhouette stand-in in
    * similarity space): for each vector, `own` is the dot product to its
    * assigned centroid (the same argmax-dot, ties-to-lower-cell rule as
    * [[VectorFunctions.nearest_centroids]]) and `second` the best dot
    * among the REMAINING centroids; `margin = own − second ≥ 0` is how
    * decisively the vector belongs to its cell. Per-cell output —
    * member count, microunit sums of own/margin, and the minimum margin
    * (the cell's weakest member) — is the continuous fit-quality gate an
    * index-build or SemDeDup job checks before trusting its clustering
    * (k set too low ⇒ margins collapse; a dead cell ⇒ missing row).
    *
    * True silhouette compares mean distances to ALL points (O(n²));
    * against centroids it is O(n·k) map-only arithmetic — no shuffle at
    * all until the k-row rollup. Determinism: per-cell dots are
    * sequential double accumulation ([[VectorFunctions
    * .double_dot_product]] = DuckDB's list kernels, the q74/q119
    * contract); sort/argmax over identical doubles is engine-stable; and
    * `floor(x·10⁶)` microunits make the sums exact integers, so an
    * independent engine reproduces every row from the dumped centroids
    * (q75's quantization discipline). */
  def clusterQuality(corpus: DataFrame, idCol: String, vecCol: String,
                     centroidsFlat: Array[Float], dim: Int): DataFrame = {
    require(dim >= 1 && centroidsFlat.length % dim == 0)
    val k = centroidsFlat.length / dim
    require(k >= 2, "separation needs at least two centroids")
    val x = col(vecCol).cast("array<double>")
    val dots = array((0 until k).map { c =>
      val cv = Array.tabulate(dim)(j => centroidsFlat(c * dim + j).toDouble)
      VectorFunctions.double_dot_product(x, lit(cv))
    }: _*)
    val micro = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1e6)).cast("long")
    corpus
      .select(col(idCol), dots.as("__d"),
        sort_array(dots, asc = false).as("__s"))
      .select(col(idCol),
        (array_position(col("__d"), col("__s")(0)) - 1).cast("long").as("cell"),
        col("__s")(0).as("__own"),
        (col("__s")(0) - col("__s")(1)).as("__margin"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vectors"),
        sum(micro(col("__own"))).as("sum_own_micro"),
        sum(micro(col("__margin"))).as("sum_margin_micro"),
        min(micro(col("__margin"))).as("min_margin_micro"))
  }
}

package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math over ArrayType(FloatType).
  *
  * These are (b)-tier per the extension preference order (compose built-ins
  * > custom Expression > custom plan): scalar vector kernels with
  * `doGenCode`, so they stay inside whole-stage codegen — no UDF
  * serialization, no boxing of 64-float arrays per row.
  */
abstract class BinaryVectorExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
}

/** cosine(a, b) ∈ [-1, 1]; 0 when either norm is 0. Length mismatch uses
  * the common prefix (embeddings are fixed-dim; no exception in the hot
  * loop). */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      // promote BEFORE multiplying: a float-precision product loses ~1e-7
      // relative accuracy and (worse) diverges from every engine that does
      // vector math in double — double products make the result
      // bit-identical to DuckDB's list_cosine_similarity on DOUBLE[]
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    // clamp: float rounding can push dot/denom a few ulp past ±1 for
    // (near-)identical vectors; cosine is mathematically in [-1, 1] and
    // DuckDB's list_cosine_similarity clamps the same way
    if (denom == 0.0) 0.0
    else math.max(-1.0, math.min(1.0, dot / denom))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y"); val den = ctx.freshName("den")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = $a.getFloat($i); final double $y = $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |final double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($den == 0.0) ? 0.0
         |  : java.lang.Math.max(-1.0, java.lang.Math.min(1.0, $dot / $den));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(a, b) over float vectors. */
case class DotProduct(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $dot += (double) $a.getFloat($i) * $b.getFloat($i); }
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(a, b) over DOUBLE vectors — the [[DotProduct]] kernel at double
  * input precision, for math whose weights are themselves doubles (PCA
  * components). Sequential left-to-right accumulation, the same order
  * DuckDB's list kernels use, so cross-engine results compare
  * bit-for-bit (the q29 contract). */
case class DoubleDotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "double_dot_product"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $dot += $a.getDouble($i) * $b.getDouble($i); }
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sign-random-projection LSH buckets for cosine similarity.
  *
  * Emits one bucket id per hash table: bucket(t) = (t << bits) | signbits,
  * where bit j of `signbits` is sign(⟨v, h_{t,j}⟩) and the hyperplane
  * components are deterministic ±1 draws seeded by (seed, t, j, dim-index)
  * — a valid LSH family for angular distance, with nothing to broadcast.
  */
case class HyperplaneLshBuckets(child: Expression, seed: Long, numTables: Int, bitsPerTable: Int)
  extends UnaryExpression {

  require(bitsPerTable > 0 && bitsPerTable <= 24, "bitsPerTable in (0, 24]")
  require(numTables > 0 && numTables <= 64, "numTables in (0, 64]")

  override def prettyName: String = "hyperplane_lsh_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    ArrayData.toArrayData(LshKernel.buckets(a, seed, numTables, bitsPerTable))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.functions.LshKernel.buckets($v, ${seed}L, $numTables, $bitsPerTable));")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static kernel shared by interpreted eval and generated code. */
object LshKernel {
  /** splitmix64 — deterministic pseudo-random stream from a key. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def buckets(vec: ArrayData, seed: Long, numTables: Int, bitsPerTable: Int): Array[Long] = {
    val dim = vec.numElements()
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bits = 0L
      var j = 0
      while (j < bitsPerTable) {
        var acc = 0.0
        val planeKey = seed ^ (t.toLong << 32) ^ j.toLong
        var i = 0
        while (i < dim) {
          // ±1 component from one splitmix draw per (plane, dim)
          val sgn = if ((mix(planeKey * 0x100000001b3L + i) & 1L) == 0L) 1.0f else -1.0f
          acc += vec.getFloat(i) * sgn
          i += 1
        }
        if (acc >= 0.0) bits |= (1L << j)
        j += 1
      }
      out(t) = (t.toLong << bitsPerTable) | bits
      t += 1
    }
    out
  }
}

/** Indices of the `take` nearest centroids (by dot product against
  * unit-norm centroids ≙ cosine order) for a float vector — the IVF
  * assignment/probe kernel. Centroids ride along as a codegen reference
  * object, flattened row-major. */
case class NearestCentroids(child: Expression, centroidsFlat: Array[Float], dim: Int, take: Int)
  extends UnaryExpression {
  require(dim > 0 && take > 0 && centroidsFlat.length % dim == 0)

  override def prettyName: String = "nearest_centroids"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayData.toArrayData(IvfKernel.nearest(v.asInstanceOf[ArrayData], centroidsFlat, dim, take))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", centroidsFlat, "float[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.functions.IvfKernel.nearest($v, $cRef, $dim, $take));")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Two-level (hierarchical) cell assignment: nearest child centroid among
  * the children of the `nProbe` nearest super-centroids — O(k1 + nProbe·k2)
  * dot products per row instead of the flat argmax's O(k1·k2). The scale
  * path for cell counts that grow with the corpus (SemDeDup's k = n/cell
  * size): per-row assignment cost grows as √k, not k. Layout: `childFlat`
  * holds each super's `k2` children contiguously; cell id = super·k2 +
  * child index, so ids remain dense in [0, k1·k2). */
case class NearestChildCell(child: Expression, superFlat: Array[Float],
                            childFlat: Array[Float], dim: Int, k2: Int, nProbe: Int)
  extends UnaryExpression {
  require(dim > 0 && k2 > 0 && nProbe > 0 && superFlat.length % dim == 0 &&
    childFlat.length == (superFlat.length / dim) * k2 * dim)

  override def prettyName: String = "nearest_child_cell"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    IvfKernel.nearestChild(v.asInstanceOf[ArrayData], superFlat, childFlat, dim, k2, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("hierSupers", superFlat, "float[]")
    val cRef = ctx.addReferenceObj("hierChildren", childFlat, "float[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.IvfKernel.nearestChild($v, $sRef, $cRef, $dim, $k2, $nProbe);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Top-`take` cells under the two-level layout: the [[NearestChildCell]]
  * probe generalized to a PROBE LIST — the nProbe-cell query side of an
  * IVF index whose cell count grew past the flat-argmax regime
  * (knn join at auto-sized cells). O(k1 + nProbeSuper·k2) dot products
  * per row; ties to the lower cell id on both levels, so at full super
  * probe the top-1 equals the flat argmax. */
case class NearestChildCells(child: Expression, superFlat: Array[Float],
                             childFlat: Array[Float], dim: Int, k2: Int,
                             nProbeSuper: Int, take: Int)
  extends UnaryExpression {
  require(dim > 0 && k2 > 0 && nProbeSuper > 0 && take > 0 &&
    superFlat.length % dim == 0 &&
    childFlat.length == (superFlat.length / dim) * k2 * dim)

  override def prettyName: String = "nearest_child_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayData.toArrayData(IvfKernel.nearestChildren(
      v.asInstanceOf[ArrayData], superFlat, childFlat, dim, k2, nProbeSuper, take))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("hierSupers", superFlat, "float[]")
    val cRef = ctx.addReferenceObj("hierChildren", childFlat, "float[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.functions.IvfKernel.nearestChildren($v, $sRef, $cRef, $dim, $k2, $nProbeSuper, $take));")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object IvfKernel {
  /** [[NearestChildCells]]'s kernel: top-`take` cells by dot product over
    * the children of the `nProbeSuper` nearest supers; selection ties to
    * the lower cell id (the [[nearest]] / [[nearestChild]] convention). */
  def nearestChildren(vec: ArrayData, superFlat: Array[Float], childFlat: Array[Float],
                      dim: Int, k2: Int, nProbeSuper: Int, take: Int): Array[Int] = {
    val probes = nearest(vec, superFlat, dim, nProbeSuper)
    val n = math.min(vec.numElements(), dim)
    val nCand = probes.length * k2
    val cells = new Array[Int](nCand)
    val scores = new Array[Double](nCand)
    var idx = 0
    var p = 0
    while (p < probes.length) {
      val s = probes(p)
      var c = 0
      while (c < k2) {
        var dot = 0.0; var i = 0; val base = (s * k2 + c) * dim
        while (i < n) { dot += vec.getFloat(i).toDouble * childFlat(base + i); i += 1 }
        cells(idx) = s * k2 + c
        scores(idx) = dot
        idx += 1
        c += 1
      }
      p += 1
    }
    val k = math.min(take, nCand)
    val out = new Array[Int](k)
    val used = new Array[Boolean](nCand)
    var j = 0
    while (j < k) {
      var best = -1; var bestScore = Double.NegativeInfinity; var bestCell = Int.MaxValue
      var i = 0
      while (i < nCand) {
        if (!used(i) && (scores(i) > bestScore ||
            (scores(i) == bestScore && cells(i) < bestCell))) {
          best = i; bestScore = scores(i); bestCell = cells(i)
        }
        i += 1
      }
      used(best) = true; out(j) = cells(best); j += 1
    }
    out
  }

  /** [[NearestChildCell]]'s kernel: argmax dot product over the children
    * of the `nProbe` nearest supers; ties to the lower cell id on both
    * levels (the [[nearest]] convention, so flat and hierarchical paths
    * break ties identically). */
  def nearestChild(vec: ArrayData, superFlat: Array[Float], childFlat: Array[Float],
                   dim: Int, k2: Int, nProbe: Int): Int = {
    val probes = nearest(vec, superFlat, dim, nProbe)
    val n = math.min(vec.numElements(), dim)
    var bestCell = -1
    var bestDot = Double.NegativeInfinity
    var p = 0
    while (p < probes.length) {
      val s = probes(p)
      var c = 0
      while (c < k2) {
        var dot = 0.0; var i = 0; val base = (s * k2 + c) * dim
        while (i < n) { dot += vec.getFloat(i).toDouble * childFlat(base + i); i += 1 }
        val cell = s * k2 + c
        if (dot > bestDot || (dot == bestDot && cell < bestCell)) {
          bestDot = dot; bestCell = cell
        }
        c += 1
      }
      p += 1
    }
    bestCell
  }

  /** Top-`take` centroid indices by dot product, ties to lower index. */
  def nearest(vec: ArrayData, centroidsFlat: Array[Float], dim: Int, take: Int): Array[Int] = {
    val nC = centroidsFlat.length / dim
    val n = math.min(vec.numElements(), dim)
    val scores = new Array[Double](nC)
    var c = 0
    while (c < nC) {
      var dot = 0.0; var i = 0; val base = c * dim
      while (i < n) { dot += vec.getFloat(i).toDouble * centroidsFlat(base + i); i += 1 }
      scores(c) = dot
      c += 1
    }
    val k = math.min(take, nC)
    val out = new Array[Int](k)
    val used = new Array[Boolean](nC)
    var j = 0
    while (j < k) {
      var best = -1; var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < nC) {
        if (!used(i) && scores(i) > bestScore) { best = i; bestScore = scores(i) }
        i += 1
      }
      used(best) = true; out(j) = best; j += 1
    }
    out
  }

}

/** SimHash64 over an array of string tokens: per-token 64-bit hash votes
  * ±1 on each bit; the sign of each bit's tally is the fingerprint bit.
  * Near-duplicate docs land within small Hamming distance.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    SimHashKernel.simhash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = graft.functions.SimHashKernel.simhash($v);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass MinHash signature over an array of string shingles.
  *
  * Output: array<long> of `numHashes` minima of h_j(s) = (a_j·h(s) + b_j)
  * mod (2³¹−1), coefficients drawn deterministically from `seed`.
  * A single traversal of the shingle array updates all `numHashes` minima
  * at once — the composed-builtin alternative (`numHashes` separate
  * `transform` calls) materializes `numHashes` intermediate arrays per row
  * and re-hashes every shingle per function; this kernel hashes each
  * shingle once.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
  extends UnaryExpression {
  require(numHashes > 0 && numHashes <= 1024)

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> or array<long> (pre-hashed shingles), got ${t.simpleString}")
  }

  private def longInput: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  @transient private lazy val coeffs: Array[Long] = MinHashKernel.coefficients(numHashes, seed)

  override def nullSafeEval(v: Any): Any =
    ArrayData.toArrayData(
      if (longInput) MinHashKernel.signatureLongs(v.asInstanceOf[ArrayData], coeffs)
      else MinHashKernel.signature(v.asInstanceOf[ArrayData], coeffs))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coeffsRef = ctx.addReferenceObj("minhashCoeffs", coeffs, "long[]")
    val method = if (longInput) "signatureLongs" else "signature"
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.functions.MinHashKernel.$method($v, $coeffsRef));")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashKernel {
  val Prime: Long = 2147483647L // 2^31 - 1

  /** Interleaved (a_0, b_0, a_1, b_1, ...) with a in [1, p), b in [0, p). */
  def coefficients(numHashes: Int, seed: Long): Array[Long] = {
    val rnd = new scala.util.Random(seed)
    val out = new Array[Long](numHashes * 2)
    var j = 0
    while (j < numHashes) {
      out(2 * j) = rnd.nextInt(Int.MaxValue - 1).toLong + 1
      out(2 * j + 1) = rnd.nextInt(Int.MaxValue).toLong
      j += 1
    }
    out
  }

  def signature(shingles: ArrayData, coeffs: Array[Long]): Array[Long] = {
    val k = coeffs.length / 2
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = java.lang.Long.remainderUnsigned(
          SimHashKernel.tokenHash(shingles.getUTF8String(i)), Prime)
        var j = 0
        while (j < k) {
          val v = (coeffs(2 * j) * h + coeffs(2 * j + 1)) % Prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    mins
  }

  /** Same signature over PRE-HASHED shingles (array<long> from xxhash64 of
    * token-hash windows): skips per-shingle string construction entirely —
    * the string path's dominant cost at corpus scale. */
  def signatureLongs(shingles: ArrayData, coeffs: Array[Long]): Array[Long] = {
    val k = coeffs.length / 2
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val h = java.lang.Long.remainderUnsigned(shingles.getLong(i), Prime)
      var j = 0
      while (j < k) {
        val v = (coeffs(2 * j) * h + coeffs(2 * j + 1)) % Prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    mins
  }
}

/** 64-bit hashed word n-gram shingles straight from the raw text.
  *
  * One pass over the UTF-8 bytes: tokenize on single 0x20 bytes (the
  * same token boundaries as `split(text, " ")` / DuckDB `string_split`,
  * empty tokens included — UTF-8 multibyte sequences can't contain
  * 0x20), hash each token in place (no substring allocation), then emit
  * one combined hash per n-token window. Docs with fewer than n tokens
  * collapse to a single whole-doc shingle, mirroring
  * `Dedup.shingles`' fallback. Output is SET-equivalent (whp) to
  * hashing the string n-grams, at a fraction of the cost: the string
  * path materializes ~|tokens| short strings per row and profiles as
  * the dominant cost of the minhash pipeline.
  */
case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 16)

  override def prettyName: String = "hashed_shingles"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayData.toArrayData(ShingleKernel.hashedShingles(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.functions.ShingleKernel.hashedShingles($v, $n));")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleKernel {

  @inline private def mix(acc: Long, h: Long): Long = {
    var z = (acc ^ h) * 0xff51afd7ed558ccdL
    z ^= z >>> 33
    z * 0xc4ceb9fe1a85ec53L
  }

  /** Hash of the byte range [start, end) of `base` via murmur+splitmix —
    * identical family to [[SimHashKernel.tokenHash]] without allocating
    * the token substring. */
  @inline private def rangeHash(base: AnyRef, offset: Long, len: Int): Long = {
    val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(base, offset, len, 42)
    var z = h.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hashedShingles(text: org.apache.spark.unsafe.types.UTF8String, n: Int): Array[Long] = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    // pass 1: count tokens (spaces + 1)
    var spaces = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) spaces += 1
      i += 1
    }
    val nTok = spaces + 1
    val tokH = new Array[Long](nTok)
    // pass 2: hash each token byte range in place
    var t = 0
    var start = 0
    i = 0
    while (i <= len) {
      if (i == len || org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        tokH(t) = rangeHash(base, off + start, i - start)
        t += 1
        start = i + 1
      }
      i += 1
    }
    if (nTok < n) {
      // whole-doc fallback: one order-sensitive combined shingle
      var acc = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < nTok) { acc = mix(acc, tokH(j)); j += 1 }
      return Array(acc)
    }
    val out = new Array[Long](nTok - n + 1)
    var w = 0
    while (w < out.length) {
      var acc = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < n) { acc = mix(acc, tokH(w + j)); j += 1 }
      out(w) = acc
      w += 1
    }
    out
  }
}

/** Fast ISO-8601 rendering of a (UTC) timestamp: micros-since-epoch →
  * `yyyy-MM-dd'T'HH:mm:ss.SSSSSS`, written digit-by-digit with the civil-
  * from-days calendar algorithm — no `DateTimeFormatter`, no per-row
  * java.time allocation. Byte-identical to
  * `date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")` under a UTC session
  * (and to DuckDB `strftime(ts, '%Y-%m-%dT%H:%M:%S.%f')`), which makes it
  * the cheap canonical rendering for oracle-compared outputs
  * (`graft.core.Canon`). */
case class IsoMicros(child: Expression) extends UnaryExpression {
  override def prettyName: String = "iso_micros"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects a timestamp, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = IsoKernel.format(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = graft.functions.IsoKernel.format($v);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object IsoKernel {
  private val MicrosPerDay = 86400000000L

  @inline private def put2(b: Array[Byte], at: Int, v: Int): Unit = {
    b(at) = ('0' + v / 10).toByte; b(at + 1) = ('0' + v % 10).toByte
  }

  /** micros since epoch (UTC) → `yyyy-MM-ddTHH:mm:ss.SSSSSS` (26 bytes).
    * Intended domain: years 0001–9999 (4 rendered digits — the corpus
    * and any sane event time); outside it, use `date_format`. */
  def format(us: Long): org.apache.spark.unsafe.types.UTF8String = {
    val days = Math.floorDiv(us, MicrosPerDay)
    val rem = Math.floorMod(us, MicrosPerDay)
    val secOfDay = (rem / 1000000L).toInt
    val micro = (rem % 1000000L).toInt
    // civil-from-days (Hinnant): proleptic Gregorian, exact for ±int range
    val z = days + 719468L
    val era = Math.floorDiv(z, 146097L)
    val doe = (z - era * 146097L).toInt
    val yoe = (doe - doe / 1460 + doe / 36524 - doe / 146096) / 365
    val doy = doe - (365 * yoe + yoe / 4 - yoe / 100)
    val mp = (5 * doy + 2) / 153
    val d = doy - (153 * mp + 2) / 5 + 1
    val m = if (mp < 10) mp + 3 else mp - 9
    val y = (yoe + era * 400 + (if (m <= 2) 1 else 0)).toInt

    val b = new Array[Byte](26)
    put2(b, 0, y / 100); put2(b, 2, y % 100)
    b(4) = '-'; put2(b, 5, m)
    b(7) = '-'; put2(b, 8, d)
    b(10) = 'T'
    put2(b, 11, secOfDay / 3600)
    b(13) = ':'; put2(b, 14, (secOfDay / 60) % 60)
    b(16) = ':'; put2(b, 17, secOfDay % 60)
    b(19) = '.'
    put2(b, 20, micro / 10000); put2(b, 22, (micro / 100) % 100); put2(b, 24, micro % 100)
    org.apache.spark.unsafe.types.UTF8String.fromBytes(b)
  }
}

/** Order-sensitive FNV-1a-style document fingerprint over string tokens:
  * acc = (acc ^ h(token)) * FNV_PRIME with wrapping 64-bit arithmetic. */
case class TokenFingerprint64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "token_fingerprint64"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    SimHashKernel.fingerprint(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = graft.functions.SimHashKernel.fingerprint($v);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-token 64-bit hashes (the [[SimHashKernel.tokenHash]] each
  * fingerprint/simhash fold consumes), exposed as a column so oracle
  * harnesses can dump them and independently recompute the folds. */
case class TokenHashes(child: Expression) extends UnaryExpression {
  override def prettyName: String = "token_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    SimHashKernel.tokenHashes(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = graft.functions.SimHashKernel.tokenHashes($v);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHashKernel {

  def tokenHashes(tokens: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = tokens.numElements()
    // null tokens are SKIPPED, exactly as fingerprint's fold skips them,
    // so folding this dump always reproduces fingerprint
    val out = new Array[Long](n)
    var i = 0; var k = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) { out(k) = tokenHash(tokens.getUTF8String(i)); k += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (k == n) out else java.util.Arrays.copyOf(out, k))
  }

  /** 64-bit per-token hash: murmur3_32 widened through splitmix64. */
  @inline def tokenHash(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
    var z = h.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def fingerprint(tokens: ArrayData): Long = {
    var acc = -3750763034362895579L // FNV-1a 64 offset basis
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        acc = (acc ^ tokenHash(tokens.getUTF8String(i))) * 1099511628211L
      }
      i += 1
    }
    acc
  }

  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val z = tokenHash(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((z >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** ==== STUB codec ==== media feature extraction as a scalar expression:
  * binary content → unit-norm float vector. The kernel delegates to the
  * same deterministic stand-in as Multimodal.decodeStub (this container
  * has no codecs); the expression contract — binary in, array<float> out,
  * codegen'd, null-safe — is what a real decoder plugs into. */
case class MediaFeatures(child: Expression, dim: Int) extends UnaryExpression {
  require(dim > 0 && dim <= 4096)

  override def prettyName: String = "media_features"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayData.toArrayData(graft.ext.Multimodal.decodeStub(v.asInstanceOf[Array[Byte]], dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.ext.Multimodal.decodeStub($v, $dim));")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-dimension int8 scalar quantization (SQ8): codes[j] =
  * clamp(floor((x[j] − lo[j]) / step[j] + 0.5), 0, 255), stored as
  * (code − 128) so the whole vector packs into `dim` BYTES — a 4× scan
  * reduction vs float32 (the faiss `SQ8` / Lucene `int8` layout, between
  * PQ's ~32× and raw floats). Dims with step = 0 (constant across the
  * corpus) code to 0. The quantization grid rides the expression as
  * broadcast-literal arrays — nothing joins, the encode is map-only
  * inside whole-stage codegen. */
case class Sq8Encode(child: Expression, lo: Array[Double], step: Array[Double])
  extends UnaryExpression {
  require(lo.length == step.length && lo.nonEmpty)

  override def prettyName: String = "sq8_encode"
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    SqKernel.encode(v.asInstanceOf[ArrayData], lo, step)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sqLo", lo, "double[]")
    val stRef = ctx.addReferenceObj("sqStep", step, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SqKernel.encode($v, $loRef, $stRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Asymmetric-free SQ8 similarity: cosine over the DEQUANTIZED codes
  * (x̂[j] = lo[j] + code[j]·step[j]) of both sides, one fused pass over
  * the two byte arrays — the ADC scan of the SQ8 ANN path reads `dim`
  * bytes per side where brute force reads `dim` floats. Sequential
  * double accumulation ⇒ the score is a pure per-row function of the two
  * codes (partitioning-independent), which is what makes the candidate
  * dump deterministic. 0 when either dequantized norm is 0. */
case class Sq8Cosine(left: Expression, right: Expression,
                     lo: Array[Double], step: Array[Double])
  extends BinaryExpression {
  require(lo.length == step.length && lo.nonEmpty)

  override def prettyName: String = "sq8_cosine"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == BinaryType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two binary arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def nullSafeEval(l: Any, r: Any): Any =
    SqKernel.cosine(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]], lo, step)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sqLo", lo, "double[]")
    val stRef = ctx.addReferenceObj("sqStep", step, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SqKernel.cosine($a, $b, $loRef, $stRef);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SqKernel {
  /** [[Sq8Encode]]'s kernel. Explicit op order — (x − lo) / step + 0.5,
    * floor, clamp — so an independent engine recomputes every code from
    * the dumped (lo, step) grid bit-for-bit. */
  def encode(vec: ArrayData, lo: Array[Double], step: Array[Double]): Array[Byte] = {
    val dim = lo.length
    val n = math.min(vec.numElements(), dim)
    val out = new Array[Byte](dim)
    var j = 0
    while (j < n) {
      val code =
        if (step(j) == 0.0) 0
        else {
          val c = math.floor((vec.getFloat(j).toDouble - lo(j)) / step(j) + 0.5)
          if (c < 0.0) 0 else if (c > 255.0) 255 else c.toInt
        }
      out(j) = (code - 128).toByte
      j += 1
    }
    out
  }

  /** [[Sq8Cosine]]'s kernel: one pass, three accumulators. */
  def cosine(a: Array[Byte], b: Array[Byte], lo: Array[Double], step: Array[Double]): Double = {
    val n = math.min(math.min(a.length, b.length), lo.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var j = 0
    while (j < n) {
      val xa = lo(j) + (a(j) + 128) * step(j)
      val xb = lo(j) + (b(j) + 128) * step(j)
      dot += xa * xb; na += xa * xa; nb += xb * xb
      j += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Column wrappers + SQL registration. */
/** Static kernel for [[BpeApplyMerges]]: apply a learned merge table to
  * a token array — each merge sequentially, left-to-right non-overlap
  * within a merge (the exact semantics of TextAnalysis.mergeFold:
  * "a a a" + (a,a) merges once, the third `a` survives). One tight
  * O(merges × tokens) scan per row, replacing a chain of `merges`
  * codegen'd aggregate() expressions each materializing an
  * intermediate array. */
object BpeKernel {
  import org.apache.spark.unsafe.types.UTF8String

  def applyMerges(toks: ArrayData, lhs: Array[UTF8String],
                  rhs: Array[UTF8String], merged: Array[UTF8String]): ArrayData = {
    var cur = new Array[AnyRef](toks.numElements())
    var n = cur.length
    var i = 0
    while (i < n) {
      cur(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    var m = 0
    while (m < lhs.length) {
      val a = lhs(m); val b = rhs(m); val ab = merged(m)
      val out = new Array[AnyRef](n)
      var j = 0; var k = 0
      while (j < n) {
        if (j < n - 1 && a == cur(j) && b == cur(j + 1)) {
          out(k) = ab; j += 2
        } else { out(k) = cur(j); j += 1 }
        k += 1
      }
      cur = out; n = k
      m += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(cur, n))
  }
}

/** [[BpeApplyMergesIndexed]]'s kernel: the SAME semantics as
  * [[BpeKernel.applyMerges]] (each merge in training order, left-to-right
  * non-overlap within a merge) at a cost INDEPENDENT of table depth —
  * O(tokens · log tokens + merge applications) per document instead of
  * O(merges × tokens). The production-encode half of the deep-BPE story:
  * the batched trainer (q166) makes TRAINING a 10³–10⁵-merge table
  * reachable; this makes ENCODING a corpus with it reachable (a 100k-merge
  * table under the sequential kernel costs 100k array scans per document,
  * ~10⁴× the document's own size).
  *
  * Per document: one scan buckets each adjacent pair's position under the
  * RANK of the merge that would rewrite it (a hash lookup against the
  * broadcast rank table); ranks are then processed in increasing order off
  * a min-heap — identical to running the sequential passes in training
  * order while SKIPPING every merge with no occurrence. Merging at a
  * position splices a doubly-linked token list and routes the two newly
  * adjacent pairs to their merges' buckets, but ONLY to ranks strictly
  * above the current one: a pair whose merge rank is below the rank being
  * processed missed its pass, exactly as in the sequential rewrite. A
  * pair adopted at several training rounds (later merges can recreate
  * earlier pairs, and the trainer may re-adopt them) keeps ALL its ranks,
  * and each new occurrence routes to the smallest unprocessed one. Stale
  * bucket entries (positions rewritten by an earlier merge) are dropped by
  * re-verifying the pair's tokens at processing time. BpeIndexedSpec pins
  * bit-equality against the sequential kernel on trained tables and on
  * adversarial hand cases. */
object BpeIndexedKernel {
  import org.apache.spark.unsafe.types.UTF8String

  private val Nul = UTF8String.fromString("\u0000")

  def pairKey(a: UTF8String, b: UTF8String): UTF8String =
    UTF8String.concat(a, Nul, b)

  /** Smallest rank in the (ascending) list strictly above `r`, or -1. */
  private def firstRankAbove(ranks: Array[Int], r: Int): Int = {
    var i = 0
    while (i < ranks.length) {
      if (ranks(i) > r) return ranks(i)
      i += 1
    }
    -1
  }

  def applyMergesIndexed(toks: ArrayData,
                         rankOf: java.util.HashMap[UTF8String, Array[Int]],
                         lhs: Array[UTF8String], rhs: Array[UTF8String],
                         merged: Array[UTF8String]): ArrayData = {
    val n = toks.numElements()
    if (n == 0) return ArrayData.toArrayData(Array.empty[AnyRef])
    val tok = new Array[UTF8String](n)
    val next = new Array[Int](n)
    val prev = new Array[Int](n)
    var i = 0
    while (i < n) {
      tok(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      next(i) = if (i < n - 1) i + 1 else -1
      prev(i) = i - 1
      i += 1
    }
    val buckets = new java.util.HashMap[Integer, java.util.ArrayList[Integer]]()
    val heap = new java.util.PriorityQueue[Integer]()
    def route(p: Int, above: Int): Unit = {
      val a = tok(p); val q = next(p)
      if (a == null || q == -1) return
      val b = tok(q)
      if (b == null) return
      val ranks = rankOf.get(pairKey(a, b))
      if (ranks == null) return
      val r = firstRankAbove(ranks, above)
      if (r < 0) return
      var bucket = buckets.get(r)
      if (bucket == null) {
        bucket = new java.util.ArrayList[Integer]()
        buckets.put(r, bucket)
        heap.add(r)
      }
      bucket.add(p): Unit
    }
    i = 0
    while (i < n - 1) { route(i, -1); i += 1 }
    var count = n
    while (!heap.isEmpty) {
      val r = heap.poll()
      val bucket = buckets.remove(r)
      java.util.Collections.sort(bucket) // appends from earlier ranks arrive unordered
      val a = lhs(r); val b = rhs(r); val ab = merged(r)
      var bi = 0
      while (bi < bucket.size()) {
        val p = bucket.get(bi).intValue()
        val q = next(p)
        // re-verify: the position may have been rewritten since routing
        // (overlap within this merge, or an earlier merge's splice)
        if (q != -1 && a == tok(p) && b == tok(q)) {
          tok(p) = ab
          tok(q) = null
          next(p) = next(q)
          if (next(q) != -1) prev(next(q)) = p
          count -= 1
          val lp = prev(p)
          if (lp != -1) route(lp, r)
          route(p, r)
        }
        bi += 1
      }
    }
    val out = new Array[AnyRef](count)
    var k = 0
    i = 0
    while (i != -1) {
      out(k) = tok(i); k += 1; i = next(i)
    }
    ArrayData.toArrayData(out)
  }
}

/** Apply a BPE merge table (in training order) to a token array —
  * the batched trainer's rewrite step as ONE codegen'd expression.
  * The merge table rides along as codegen reference objects, like
  * [[NearestCentroids]]' centroids. Fields are Seq (not Array) so the
  * case-class equals/hashCode compare merge-table CONTENT — two
  * instances carrying identical tables are `semanticEquals`, keeping
  * subexpression elimination and plan-equality checks working. */
case class BpeApplyMerges(child: Expression, lhs: Seq[String], rhs: Seq[String])
  extends UnaryExpression {
  require(lhs.length == rhs.length, "lhs/rhs merge arrays must align")
  import org.apache.spark.unsafe.types.UTF8String

  @transient private lazy val lhsU = lhs.iterator.map(UTF8String.fromString).toArray
  @transient private lazy val rhsU = rhs.iterator.map(UTF8String.fromString).toArray
  @transient private lazy val mergedU =
    lhs.indices.iterator.map(i => UTF8String.fromString(lhs(i) + " " + rhs(i))).toArray

  override def prettyName: String = "bpe_apply_merges"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    BpeKernel.applyMerges(v.asInstanceOf[ArrayData], lhsU, rhsU, mergedU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.unsafe.types.UTF8String[]"
    val lRef = ctx.addReferenceObj("bpeLhs", lhsU, cls)
    val rRef = ctx.addReferenceObj("bpeRhs", rhsU, cls)
    val mRef = ctx.addReferenceObj("bpeMerged", mergedU, cls)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BpeKernel.applyMerges($v, $lRef, $rRef, $mRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** [[BpeApplyMerges]] at table-depth-independent cost — the
  * [[BpeIndexedKernel]] rank-routing encode, bit-identical output by
  * contract (BpeIndexedSpec). Use this one whenever the merge table is
  * vocabulary-scale (the sequential kernel is fine for trainer batches
  * of ≤ a few dozen merges, where its single tight scan wins on
  * constant factors). */
case class BpeApplyMergesIndexed(child: Expression, lhs: Seq[String], rhs: Seq[String])
  extends UnaryExpression {
  require(lhs.length == rhs.length, "lhs/rhs merge arrays must align")
  import org.apache.spark.unsafe.types.UTF8String

  @transient private lazy val lhsU = lhs.iterator.map(UTF8String.fromString).toArray
  @transient private lazy val rhsU = rhs.iterator.map(UTF8String.fromString).toArray
  @transient private lazy val mergedU =
    lhs.indices.iterator.map(i => UTF8String.fromString(lhs(i) + " " + rhs(i))).toArray
  /** pair key → ASCENDING ranks adopting that pair (normally one; the
    * trainer may re-adopt a pair that later merges recreate). */
  @transient private lazy val rankOf: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, scala.collection.mutable.ArrayBuffer[Int]]()
    lhs.indices.foreach { i =>
      m.computeIfAbsent(BpeIndexedKernel.pairKey(lhsU(i), rhsU(i)),
        _ => scala.collection.mutable.ArrayBuffer.empty[Int]) += i
    }
    val out = new java.util.HashMap[UTF8String, Array[Int]](m.size())
    m.forEach((k, v) => out.put(k, v.toArray): Unit)
    out
  }

  override def prettyName: String = "bpe_apply_merges_indexed"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    BpeIndexedKernel.applyMergesIndexed(v.asInstanceOf[ArrayData], rankOf,
      lhsU, rhsU, mergedU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arrCls = "org.apache.spark.unsafe.types.UTF8String[]"
    val mapCls = "java.util.HashMap"
    val kRef = ctx.addReferenceObj("bpeRankOf", rankOf, mapCls)
    val lRef = ctx.addReferenceObj("bpeLhs", lhsU, arrCls)
    val rRef = ctx.addReferenceObj("bpeRhs", rhsU, arrCls)
    val mRef = ctx.addReferenceObj("bpeMerged", mergedU, arrCls)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BpeIndexedKernel.applyMergesIndexed(" +
        s"$v, ($mapCls) $kRef, $lRef, $rRef, $mRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorFunctions {
  private def c(e: Expression): Column = Bridge.column(e)
  private def e(col: Column): Expression = Bridge.expression(col)

  def cosine_similarity(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))
  def dot_product(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  def double_dot_product(a: Column, b: Column): Column = c(DoubleDotProduct(e(a), e(b)))
  def lsh_buckets(v: Column, seed: Long, numTables: Int, bitsPerTable: Int): Column =
    c(HyperplaneLshBuckets(e(v), seed, numTables, bitsPerTable))
  def simhash64(tokens: Column): Column = c(SimHash64(e(tokens)))
  def token_fingerprint64(tokens: Column): Column = c(TokenFingerprint64(e(tokens)))
  def token_hashes(tokens: Column): Column = c(TokenHashes(e(tokens)))
  def minhash_signature(shingles: Column, numHashes: Int, seed: Long): Column =
    c(MinHashSignature(e(shingles), numHashes, seed))
  def hashed_shingles(text: Column, n: Int): Column = c(HashedShingles(e(text), n))
  def iso_micros(ts: Column): Column = c(IsoMicros(e(ts)))
  def nearest_centroids(v: Column, centroidsFlat: Array[Float], dim: Int, take: Int): Column =
    c(NearestCentroids(e(v), centroidsFlat, dim, take))
  def nearest_child_cell(v: Column, superFlat: Array[Float], childFlat: Array[Float],
                         dim: Int, k2: Int, nProbe: Int): Column =
    c(NearestChildCell(e(v), superFlat, childFlat, dim, k2, nProbe))
  def nearest_child_cells(v: Column, superFlat: Array[Float], childFlat: Array[Float],
                          dim: Int, k2: Int, nProbeSuper: Int, take: Int): Column =
    c(NearestChildCells(e(v), superFlat, childFlat, dim, k2, nProbeSuper, take))
  def media_features(content: Column, dim: Int): Column = c(MediaFeatures(e(content), dim))
  def bpe_apply_merges(toks: Column, lhs: Seq[String], rhs: Seq[String]): Column =
    c(BpeApplyMerges(e(toks), lhs, rhs))
  def bpe_apply_merges_indexed(toks: Column, lhs: Seq[String], rhs: Seq[String]): Column =
    c(BpeApplyMergesIndexed(e(toks), lhs, rhs))
  def sq8_encode(v: Column, lo: Array[Double], step: Array[Double]): Column =
    c(Sq8Encode(e(v), lo, step))
  def sq8_cosine(a: Column, b: Column, lo: Array[Double], step: Array[Double]): Column =
    c(Sq8Cosine(e(a), e(b), lo, step))

  /** Register for `spark.sql` use: cosine_similarity(a, b), etc. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("token_fingerprint64",
      exprs => TokenFingerprint64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("iso_micros",
      exprs => IsoMicros(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("hashed_shingles",
      exprs => HashedShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
  }
}

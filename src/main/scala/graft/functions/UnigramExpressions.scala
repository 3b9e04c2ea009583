package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** [[UnigramViterbiStats]]'s kernel: exact Viterbi segmentation of each
  * word against a unigram piece inventory with INTEGER costs — the
  * SentencePiece-unigram inference shape (Kudo 2018) under the
  * integer-exact objective cost(piece) = K − weight(piece): minimizing
  * total cost first minimizes the PIECE COUNT (every piece carries the
  * dominant K) and then, among equal-length segmentations, maximizes
  * the total occurrence weight — a deterministic objective with no
  * floating-point log-probs, so the oracle's DP agrees bit-for-bit.
  * The per-word optimum COST is unique even when several segmentations
  * achieve it, which is why the emitted statistics (cost, piece count
  * recovered exactly as (cost + K − 1) / K since 0 < Σweights < K) are
  * engine-independent while the segmentation string itself would not be.
  *
  * Forward DP per word: best[p] = min over piece lengths l of
  * best[p−l] + cost(word[p−l..p]) — O(numChars × maxPieceLen) hash
  * probes, one long array per word. A position no piece reaches (never,
  * with the character-covering inventories [[graft.ext.Unigram]]
  * builds) consumes one character at cost K. Positions are CODE POINTS
  * (`substringSQL`), matching SQL `substr` exactly. Map-only at any
  * scale: the bounded inventory rides the closure as codegen reference
  * objects.
  */
object UnigramKernel {
  import org.apache.spark.unsafe.types.UTF8String

  /** Per document: (Σ word Viterbi costs, Σ word piece counts) over the
    * non-empty words of `toks`. */
  def viterbi(toks: ArrayData, costOf: java.util.HashMap[UTF8String, java.lang.Long],
              maxLen: Int, k: Long): InternalRow = {
    var total = 0L
    var pieces = 0L
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val w = toks.getUTF8String(i)
        val len = w.numChars()
        if (len > 0) {
          val best = new Array[Long](len + 1)
          var p = 1
          while (p <= len) {
            // min over matching pieces; the 1-char cost-K fallback fires
            // ONLY when nothing matches (the oracle's coalesce semantics)
            var b = Long.MaxValue
            var l = 1
            val cap = math.min(maxLen, p)
            while (l <= cap) {
              val c = costOf.get(w.substringSQL(p - l + 1, l))
              if (c != null) {
                val cand = best(p - l) + c.longValue()
                if (cand < b) b = cand
              }
              l += 1
            }
            best(p) = if (b == Long.MaxValue) best(p - 1) + k else b
            p += 1
          }
          total += best(len)
          pieces += (best(len) + k - 1) / k
        }
      }
      i += 1
    }
    InternalRow(total, pieces)
  }

  /** The (unique) deterministic optimal SEGMENTATION of one word: the
    * forward DP of [[viterbi]], then a backtrace that at each end
    * position takes the LONGEST piece achieving the optimal cost — the
    * piece at a fixed (end, length) is a fixed substring, so the
    * tie-break makes the emitted segmentation a pure function of
    * (word, inventory) that any engine replays (the EM trainer's
    * E-step and its oracle both consume exactly this). A position no
    * piece reaches consumes one character (the [[viterbi]] fallback;
    * never taken over the character-covering inventories
    * [[graft.ext.Unigram]] builds). */
  def segment(w: UTF8String,
              costOf: java.util.HashMap[UTF8String, java.lang.Long],
              maxLen: Int, k: Long): ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val len = w.numChars()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val best = new Array[Long](len + 1)
    var p = 1
    while (p <= len) {
      var b = Long.MaxValue
      var l = 1
      val cap = math.min(maxLen, p)
      while (l <= cap) {
        val c = costOf.get(w.substringSQL(p - l + 1, l))
        if (c != null) {
          val cand = best(p - l) + c.longValue()
          if (cand < b) b = cand
        }
        l += 1
      }
      best(p) = if (b == Long.MaxValue) best(p - 1) + k else b
      p += 1
    }
    // backtrace, longest-achieving piece first — deterministic
    val out = new scala.collection.mutable.ArrayBuffer[Any](len)
    p = len
    while (p > 0) {
      var chosen = 0
      var l = math.min(maxLen, p)
      while (l >= 1 && chosen == 0) {
        val piece = w.substringSQL(p - l + 1, l)
        val c = costOf.get(piece)
        if (c != null && best(p - l) + c.longValue() == best(p)) chosen = l
        l -= 1
      }
      if (chosen == 0) { // fallback: single char at cost K
        out += w.substringSQL(p, 1); p -= 1
      } else {
        out += w.substringSQL(p - chosen + 1, chosen); p -= chosen
      }
    }
    new GenericArrayData(out.reverseIterator.toArray)
  }

  /** SOFT-EM E-step accounting for one word (Kudo 2018 §3.2 as
    * published): forward–backward over the word's segmentation lattice
    * under piece PROBABILITIES, emitting each piece's expected count —
    * the posterior-weighted occurrence total over ALL segmentations,
    * where [[segment]] counts only the Viterbi one.
    *
    *   α(0) = 1;  α(j) = Σ_l α(j−l)·θ(word[j−l..j])
    *   β(L) = 1;  β(i) = Σ_l θ(word[i..i+l])·β(i+l)
    *   E[piece at (i, j)] = α(i)·θ(piece)·β(j) / α(L)
    *
    * Deterministic per word: fixed position/length iteration order, so
    * the emitted doubles are a pure function of (word, inventory) —
    * only the corpus-level SUM of expected counts is fp-order
    * sensitive, which is why the soft path is engine-side (spec-gated)
    * rather than DuckDB-hash-gated. Output structs sort by piece. An
    * uncoverable word (α(L) = 0 — impossible over the char-covering,
    * positive-θ inventories the trainer builds) emits nothing. */
  def expectedCounts(w: UTF8String,
                     probOf: java.util.HashMap[UTF8String, java.lang.Double],
                     maxLen: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val len = w.numChars()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val alpha = new Array[Double](len + 1)
    alpha(0) = 1.0
    var p = 1
    while (p <= len) {
      var s = 0.0
      var l = 1
      val cap = math.min(maxLen, p)
      while (l <= cap) {
        val t = probOf.get(w.substringSQL(p - l + 1, l))
        if (t != null) s += alpha(p - l) * t.doubleValue()
        l += 1
      }
      alpha(p) = s
      p += 1
    }
    val z = alpha(len)
    if (z <= 0.0) return new GenericArrayData(Array.empty[Any])
    val beta = new Array[Double](len + 1)
    beta(len) = 1.0
    p = len - 1
    while (p >= 0) {
      var s = 0.0
      var l = 1
      val cap = math.min(maxLen, len - p)
      while (l <= cap) {
        val t = probOf.get(w.substringSQL(p + 1, l))
        if (t != null) s += t.doubleValue() * beta(p + l)
        l += 1
      }
      beta(p) = s
      p -= 1
    }
    val acc = new java.util.TreeMap[UTF8String, java.lang.Double]()
    p = 0
    while (p < len) {
      var l = 1
      val cap = math.min(maxLen, len - p)
      while (l <= cap) {
        val piece = w.substringSQL(p + 1, l)
        val t = probOf.get(piece)
        if (t != null) {
          val e = alpha(p) * t.doubleValue() * beta(p + l) / z
          if (e > 0.0) {
            val prev = acc.get(piece)
            acc.put(piece,
              java.lang.Double.valueOf(if (prev == null) e else prev.doubleValue() + e))
          }
        }
        l += 1
      }
      p += 1
    }
    val out = new Array[Any](acc.size())
    var i = 0
    val it = acc.entrySet().iterator()
    while (it.hasNext) {
      val ent = it.next()
      out(i) = InternalRow(ent.getKey, ent.getValue.doubleValue())
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[expectedCounts]] with PER-OCCURRENCE fixed-point rounding —
    * the DuckDB-gateable soft E-step (q212; VERDICT r14 #7): each
    * lattice occurrence's posterior e = α(i)·θ·β(j)/α(L) rounds to
    * ⌊e·scale + 0.5⌋ BEFORE any accumulation, so every sum from here
    * up — within the word, across words, across the corpus — is
    * INTEGER and free of floating-point accumulation order. The
    * doubles themselves are deterministic per (word, inventory): the
    * recursions run in fixed position/length order using only +/×/÷
    * (no libm anywhere), so an independent engine replaying the same
    * operation order reproduces the same IEEE doubles and therefore
    * the same longs. floor(x + 0.5) is deliberately the SHARED
    * rounding contract (not Math.round vs SQL round half-away
    * semantics): both engines evaluate the identical IEEE expression.
    * Occurrences rounding to 0 contribute nothing on either side.
    * Output structs sort by piece; zero-total pieces are omitted. */
  def expectedCountsFixed(w: UTF8String,
                          probOf: java.util.HashMap[UTF8String, java.lang.Double],
                          maxLen: Int, scale: Long): ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val len = w.numChars()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val alpha = new Array[Double](len + 1)
    alpha(0) = 1.0
    var p = 1
    while (p <= len) {
      var s = 0.0
      var l = 1
      val cap = math.min(maxLen, p)
      while (l <= cap) {
        val t = probOf.get(w.substringSQL(p - l + 1, l))
        if (t != null) s += alpha(p - l) * t.doubleValue()
        l += 1
      }
      alpha(p) = s
      p += 1
    }
    val z = alpha(len)
    if (z <= 0.0) return new GenericArrayData(Array.empty[Any])
    val beta = new Array[Double](len + 1)
    beta(len) = 1.0
    p = len - 1
    while (p >= 0) {
      var s = 0.0
      var l = 1
      val cap = math.min(maxLen, len - p)
      while (l <= cap) {
        val t = probOf.get(w.substringSQL(p + 1, l))
        if (t != null) s += t.doubleValue() * beta(p + l)
        l += 1
      }
      beta(p) = s
      p -= 1
    }
    val acc = new java.util.TreeMap[UTF8String, java.lang.Long]()
    p = 0
    while (p < len) {
      var l = 1
      val cap = math.min(maxLen, len - p)
      while (l <= cap) {
        val piece = w.substringSQL(p + 1, l)
        val t = probOf.get(piece)
        if (t != null) {
          val e = alpha(p) * t.doubleValue() * beta(p + l) / z
          val f = math.floor(e * scale + 0.5).toLong
          if (f > 0L) {
            val prev = acc.get(piece)
            acc.put(piece, java.lang.Long.valueOf(
              if (prev == null) f else prev.longValue() + f))
          }
        }
        l += 1
      }
      p += 1
    }
    val out = new Array[Any](acc.size())
    var i = 0
    val it = acc.entrySet().iterator()
    while (it.hasNext) {
      val ent = it.next()
      out(i) = InternalRow(ent.getKey, ent.getValue.longValue())
      i += 1
    }
    new GenericArrayData(out)
  }

  /** ln α(L) for one word — the word's marginal log-likelihood under
    * the piece distribution (the soft-EM ascent witness). Returns NaN
    * for an uncoverable word (never over trainer inventories). */
  def latticeLogZ(w: UTF8String,
                  probOf: java.util.HashMap[UTF8String, java.lang.Double],
                  maxLen: Int): Double = {
    val len = w.numChars()
    if (len == 0) return 0.0
    val alpha = new Array[Double](len + 1)
    alpha(0) = 1.0
    var p = 1
    while (p <= len) {
      var s = 0.0
      var l = 1
      val cap = math.min(maxLen, p)
      while (l <= cap) {
        val t = probOf.get(w.substringSQL(p - l + 1, l))
        if (t != null) s += alpha(p - l) * t.doubleValue()
        l += 1
      }
      alpha(p) = s
      p += 1
    }
    math.log(alpha(len))
  }
}

/** Exact unigram-Viterbi statistics of a tokenized document:
  * struct(viterbi_cost, n_pieces) summed over the words. The piece
  * inventory (bounded) rides as codegen reference objects — no join,
  * no shuffle, one map pass. */
case class UnigramViterbiStats(child: Expression,
                               pieces: Seq[String], costs: Seq[Long], k: Long)
  extends UnaryExpression {
  require(pieces.length == costs.length, "pieces/costs must align")
  // the integer objective needs K to dominate every piece cost: a cost
  // outside (0, K] means some weight reached K and minimum-cost would no
  // longer minimize the piece count first (see Unigram.CostScale)
  require(costs.forall(c => c >= 1 && c <= k),
    s"unigram piece costs must lie in [1, $k] (cost = K − weight with weight < K)")
  import org.apache.spark.unsafe.types.UTF8String

  @transient private lazy val costOf: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](pieces.length * 2)
    pieces.indices.foreach { i =>
      m.put(UTF8String.fromString(pieces(i)), java.lang.Long.valueOf(costs(i)))
    }
    m
  }
  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(p => p.codePointCount(0, p.length)).max.max(1)

  override def prettyName: String = "unigram_viterbi_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("viterbi_cost", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    UnigramKernel.viterbi(v.asInstanceOf[ArrayData], costOf, maxLen, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapCls = "java.util.HashMap"
    val mRef = ctx.addReferenceObj("ugCosts", costOf, mapCls)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.UnigramKernel.viterbi($v, " +
        s"($mapCls) $mRef, $maxLen, ${k}L);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** The deterministic optimal segmentation of ONE word (array<string> of
  * pieces): [[UnigramKernel.segment]] as a codegen expression — the EM
  * trainer's E-step explodes this over the (word, n) count frame, so
  * expected piece counts are one map-only kernel pass + one bounded
  * aggregation however large the corpus behind the counts. */
case class UnigramSegment(child: Expression,
                          pieces: Seq[String], costs: Seq[Long], k: Long)
  extends UnaryExpression {
  require(pieces.length == costs.length, "pieces/costs must align")
  require(costs.forall(c => c >= 1 && c <= k),
    s"unigram piece costs must lie in [1, $k] (cost = K − weight with weight < K)")
  import org.apache.spark.unsafe.types.UTF8String

  @transient private lazy val costOf: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](pieces.length * 2)
    pieces.indices.foreach { i =>
      m.put(UTF8String.fromString(pieces(i)), java.lang.Long.valueOf(costs(i)))
    }
    m
  }
  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(p => p.codePointCount(0, p.length)).max.max(1)

  override def prettyName: String = "unigram_segment"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    UnigramKernel.segment(v.asInstanceOf[UTF8String], costOf, maxLen, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapCls = "java.util.HashMap"
    val mRef = ctx.addReferenceObj("ugCosts", costOf, mapCls)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.UnigramKernel.segment($v, " +
        s"($mapCls) $mRef, $maxLen, ${k}L);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Soft-EM E-step kernel as an expression: per word, the expected
  * count of every inventory piece over ALL segmentations (forward–
  * backward, [[UnigramKernel.expectedCounts]]) —
  * array<struct<piece, c: double>> sorted by piece. The probability
  * table rides as a codegen reference object, the [[UnigramSegment]]
  * discipline. */
case class UnigramExpectedCounts(child: Expression,
                                 pieces: Seq[String], probs: Seq[Double])
  extends UnaryExpression {
  require(pieces.length == probs.length, "pieces/probs must align")
  require(probs.forall(p => p > 0.0 && p.isFinite),
    "soft-EM piece probabilities must be positive and finite " +
      "(a zero would silently delete every lattice path through the piece)")
  import org.apache.spark.unsafe.types.UTF8String

  @transient private lazy val probOf: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](pieces.length * 2)
    pieces.indices.foreach { i =>
      m.put(UTF8String.fromString(pieces(i)), java.lang.Double.valueOf(probs(i)))
    }
    m
  }
  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(p => p.codePointCount(0, p.length)).max.max(1)

  override def prettyName: String = "unigram_expected_counts"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("c", DoubleType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    UnigramKernel.expectedCounts(v.asInstanceOf[UTF8String], probOf, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapCls = "java.util.HashMap"
    val mRef = ctx.addReferenceObj("ugProbs", probOf, mapCls)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.UnigramKernel.expectedCounts($v, " +
        s"($mapCls) $mRef, $maxLen);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Per-word FIXED-POINT expected piece counts
  * ([[UnigramKernel.expectedCountsFixed]]) — the soft E-step under the
  * DuckDB hash gate (q212): array<struct<piece, c: long>> where c is
  * the word's summed ⌊posterior·scale + 0.5⌋ over the piece's lattice
  * occurrences. Integer from the first accumulation on, so corpus
  * sums are fp-order-free. */
case class UnigramExpectedCountsFixed(child: Expression,
                                      pieces: Seq[String],
                                      probs: Seq[Double], scale: Long)
  extends UnaryExpression {
  require(pieces.length == probs.length, "pieces/probs must align")
  require(probs.forall(p => p > 0.0 && p.isFinite),
    "soft-EM piece probabilities must be positive and finite " +
      "(a zero would silently delete every lattice path through the piece)")
  require(scale > 0L, "fixed-point scale must be positive")
  import org.apache.spark.unsafe.types.UTF8String

  @transient private lazy val probOf: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](pieces.length * 2)
    pieces.indices.foreach { i =>
      m.put(UTF8String.fromString(pieces(i)), java.lang.Double.valueOf(probs(i)))
    }
    m
  }
  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(p => p.codePointCount(0, p.length)).max.max(1)

  override def prettyName: String = "unigram_expected_counts_fixed"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    UnigramKernel.expectedCountsFixed(v.asInstanceOf[UTF8String], probOf,
      maxLen, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapCls = "java.util.HashMap"
    val mRef = ctx.addReferenceObj("ugProbs", probOf, mapCls)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.UnigramKernel.expectedCountsFixed($v, " +
        s"($mapCls) $mRef, $maxLen, ${scale}L);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Per-word marginal log-likelihood ln α(L) under the piece
  * distribution ([[UnigramKernel.latticeLogZ]]) — the soft-EM ascent
  * witness. */
case class UnigramLatticeLL(child: Expression,
                            pieces: Seq[String], probs: Seq[Double])
  extends UnaryExpression {
  require(pieces.length == probs.length, "pieces/probs must align")
  require(probs.forall(p => p > 0.0 && p.isFinite),
    "soft-EM piece probabilities must be positive and finite")
  import org.apache.spark.unsafe.types.UTF8String

  @transient private lazy val probOf: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](pieces.length * 2)
    pieces.indices.foreach { i =>
      m.put(UTF8String.fromString(pieces(i)), java.lang.Double.valueOf(probs(i)))
    }
    m
  }
  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(p => p.codePointCount(0, p.length)).max.max(1)

  override def prettyName: String = "unigram_lattice_ll"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    UnigramKernel.latticeLogZ(v.asInstanceOf[UTF8String], probOf, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapCls = "java.util.HashMap"
    val mRef = ctx.addReferenceObj("ugProbs", probOf, mapCls)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.UnigramKernel.latticeLogZ($v, " +
        s"($mapCls) $mRef, $maxLen);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UnigramFunctions {
  def unigram_viterbi_stats(toks: Column, pieces: Seq[String],
                            costs: Seq[Long], k: Long): Column =
    Bridge.column(UnigramViterbiStats(Bridge.expression(toks), pieces, costs, k))

  def unigram_segment(word: Column, pieces: Seq[String],
                      costs: Seq[Long], k: Long): Column =
    Bridge.column(UnigramSegment(Bridge.expression(word), pieces, costs, k))

  def unigram_expected_counts(word: Column, pieces: Seq[String],
                              probs: Seq[Double]): Column =
    Bridge.column(UnigramExpectedCounts(Bridge.expression(word), pieces, probs))

  def unigram_expected_counts_fixed(word: Column, pieces: Seq[String],
                                    probs: Seq[Double], scale: Long): Column =
    Bridge.column(UnigramExpectedCountsFixed(Bridge.expression(word),
      pieces, probs, scale))

  def unigram_lattice_ll(word: Column, pieces: Seq[String],
                         probs: Seq[Double]): Column =
    Bridge.column(UnigramLatticeLL(Bridge.expression(word), pieces, probs))
}

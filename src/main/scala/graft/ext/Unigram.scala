package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword segmentation (Kudo 2018; the SentencePiece
  * family): a bounded piece inventory with integer costs, and the exact
  * Viterbi (min-cost) segmentation statistics per document — the
  * FOURTH tokenizer family next to BPE train/encode, the regex
  * counter, and WordPiece's greedy max-match. Where WordPiece commits
  * to the longest prefix at each step, Viterbi finds the globally
  * optimal segmentation of each word under the piece costs.
  *
  * Costs are INTEGER-exact, no floating-point log-probs: cost(piece) =
  * K − weight(piece) with K dominating any feasible per-word weight
  * sum, so minimizing total cost minimizes the piece count first and
  * maximizes total occurrence weight second. The per-word optimal COST
  * (and the piece count derived from it) is unique even when the
  * argmin segmentation is not — exactly the statistics the engine and
  * the oracle can both pin bit-for-bit.
  *
  * Scale shape: the inventory is one substring-count aggregation
  * (explode of ≤ maxLen positions per word — O(tokens·maxLen) rows
  * pre-combine, shuffled on a key space bounded by the language's
  * substring vocabulary), collected (chars + topSub rows) and broadcast
  * into a map-only Viterbi projection; per-document work is
  * O(chars × maxLen) hash probes.
  */
object Unigram {

  /** K = 10¹²: dominates any feasible per-word weight sum (8 pieces ×
    * the weight of the commonest character) up to ~10¹¹-token corpora,
    * while 100-word documents stay far under Long.MaxValue. */
  val CostScale: Long = 1000000000000L

  /** Substring occurrence weights, lengths 1..`maxLen`, each occurrence
    * weighted by its word's frequency. ALL length-1 pieces are kept
    * (total character coverage: Viterbi never needs the fallback); the
    * `topSub` heaviest longer pieces join them (ties broken on the
    * piece string). Frame shape: (piece, cost) with cost = K − weight. */
  def pieceFrame(docs: DataFrame, textCol: String = "text",
                 topSub: Int = 24, maxLen: Int = 4): DataFrame =
    pieceFrameFromCounts(WordPiece.wordCounts(docs, textCol), topSub, maxLen)

  /** [[pieceFrame]] from an already-aggregated (word, n) frame — the
    * seam the maintained store ([[graft.streaming.VocabStream]]) reads
    * through: identical counts ⇒ identical inventory (ties break on
    * the piece string).
    *
    * The result is BOUNDED by construction (chars + topSub rows), so it
    * materializes to a driver-local relation here: the counts cache is
    * scoped to this call (unpersisted before returning — repeated
    * trainer/TVF/store derivations must not accumulate block-manager
    * state), and every downstream read (aux dump, TVF, collect) reads
    * the materialized rows instead of re-running the aggregation. */
  def pieceFrameFromCounts(counts: DataFrame,
                           topSub: Int = 24, maxLen: Int = 4): DataFrame = {
    // manage only the persistence this call created: a caller-persisted
    // `counts` keeps its cache (cache/unpersist act on the shared
    // Dataset — ADVICE r12)
    val callerCached =
      counts.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val wc = if (callerCached) counts else counts.cache()
    try {
      val subs = (1 to maxLen).map { l =>
        wc.filter(length(col("word")) >= l)
          .select(explode(transform(
              sequence(lit(1), length(col("word")) - l + 1),
              i => col("word").substr(i, lit(l)))).as("piece"),
            col("n"))
      }.reduce(_ unionByName _)
        .groupBy("piece").agg(sum("n").as("s"))
      val keep = subs.filter(length(col("piece")) === 1)
        .unionByName(subs.filter(length(col("piece")) >= 2)
          .orderBy(col("s").desc, col("piece")).limit(topSub))
      val frame = keep.select(col("piece"),
        (lit(CostScale) - col("s")).cast("long").as("cost"))
      val rows = frame.collect()
      // K-dominance guard: a weight ≥ K flips cost non-positive and the
      // Viterbi objective silently INVERTS (prefers more pieces) — the
      // engine and oracle share the inventory, so the gate could never
      // catch it. Fail loudly instead; past ~10¹¹ tokens raise CostScale.
      rows.foreach { r =>
        require(r.getLong(1) >= 1,
          s"unigram piece '${r.getString(0)}' weight ${CostScale - r.getLong(1)} " +
            s"reaches CostScale=$CostScale — the integer objective would invert; " +
            "raise CostScale for this corpus size")
      }
      counts.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), frame.schema)
    } finally { if (!callerCached) wc.unpersist(false); () }
  }

  /** The inventory as driver-side aligned seqs (bounded by
    * construction), sorted for a deterministic closure. */
  def trainPieces(docs: DataFrame, textCol: String = "text",
                  topSub: Int = 24, maxLen: Int = 4): Seq[(String, Long)] =
    collectPieces(pieceFrame(docs, textCol, topSub, maxLen))

  /** Collect a (piece, cost) frame into the broadcastable inventory —
    * bounded: chars + topSub rows. */
  def collectPieces(frame: DataFrame): Seq[(String, Long)] =
    frame.collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toIndexedSeq

  /** One EM training run: the seed inventory, the inventory after each
    * iteration (post-prune), and the final inventory (== iterations
    * .last, or the seed when `iters == 0`). Every inventory is sorted
    * by piece — the deterministic closure shape [[collectPieces]]
    * established. `iterSecs` carries each iteration's wall seconds
    * (E-step + M-step), the depth-bench signal. */
  final case class EmResult(seed: Seq[(String, Long)],
                            iterations: Seq[Seq[(String, Long)]],
                            iterSecs: Seq[Double] = Seq.empty) {
    def pieces: Seq[(String, Long)] = iterations.lastOption.getOrElse(seed)
  }

  /** Unigram-LM EM training (Kudo 2018's train loop, §3.2, as the
    * deterministic hard-EM/Viterbi-EM variant with integer weights):
    * seed a LARGE inventory (all characters + the `topSeed` heaviest
    * substrings — [[pieceFrameFromCounts]] with `topSub = topSeed`),
    * then iterate:
    *
    *  - E-step: segment every distinct word with the CURRENT costs via
    *    the exact-Viterbi kernel ([[graft.functions.UnigramSegment]],
    *    whose backtrace tie-break — longest piece achieving the optimal
    *    cost — makes the segmentation a pure function of (word,
    *    inventory)); a piece's expected count is its occurrence count
    *    in the segmentations, weighted by word frequency. Where Kudo's
    *    soft EM assigns fractional counts via forward-backward over
    *    float log-probs, the hard-EM point estimate keeps every count
    *    an exact integer — the property that lets a second engine
    *    replay the whole loop bit-for-bit.
    *  - M-step: cost(piece) = K − expected-count; PRUNE the inventory
    *    to all single characters (coverage, never dropped — Kudo §3.2's
    *    subword-coverage constraint) plus the highest-usage
    *    multi-character pieces (ties on the piece string; zero-usage
    *    multis always drop). With `shrinkPermille = 0` the prune cuts
    *    straight to `target`; with it set (e.g. 750 — Kudo §3.2 keeps
    *    ~75% per round) each iteration keeps
    *    max(target, ⌈multis · shrinkPermille / 1000⌉) multis, the
    *    GRADUAL schedule a production run uses so early iterations
    *    re-estimate before committing to deep cuts. This is the
    *    deterministic counterpart of the loss-ranked pruning schedule:
    *    usage IS each piece's first-order contribution to the corpus
    *    objective here, because removing a piece forces its occurrences
    *    to re-segment.
    *
    * Why EM beats the one-shot frequency heuristic ([[pieceFrame]]):
    * substring WEIGHT counts every occurrence, including those inside
    * contexts where the piece is never chosen (a competing piece covers
    * the span more cheaply); USAGE counts only real wins, so a
    * frequent-but-always-dominated substring is pruned in favor of a
    * piece that actually shortens segmentations (UnigramEmSpec pins a
    * corpus where the EM inventory strictly reduces total piece count).
    *
    * Scale shape: the corpus is touched ONCE (the word-count
    * aggregation feeding `counts`); every EM iteration is one map-only
    * kernel pass over the VOCABULARY-bounded counts frame + one
    * aggregation on a key space bounded by the inventory, collected
    * (≤ inventory rows) for the driver-side M-step. Iterations cost
    * O(vocab), independent of corpus size.
    *
    * Fidelity bound, hard vs soft EM (the documented trade, VERDICT
    * r13 #1): Kudo's published estimator is SOFT EM — forward-backward
    * EXPECTED piece counts over all segmentations; this trainer's
    * E-step counts the single Viterbi segmentation, the standard
    * Viterbi-EM lower bound on the same marginal-likelihood objective.
    * Per word, the two count vectors differ by at most the posterior
    * mass of the non-Viterbi segmentations; the M-step consumes counts
    * only through the usage RANKING and the prune cut, so training
    * diverges from soft EM only where that residual mass is large
    * enough to reorder pieces across the cut — and under the integer
    * objective the posterior is maximally peaked (any competing
    * segmentation costs ≥ 1 extra piece × K, or loses occurrence
    * weight at equal length). The trade is deliberate: hard EM keeps
    * every count an exact integer, which is what lets the q196 oracle
    * replay ALL iterations bit-for-bit — fractional expected counts
    * under a fixed-point scale would need >128-bit intermediate
    * products at realistic word lengths (forward sums of products of
    * per-piece weights), beyond what a SQL replay can carry. */
  def emTrainFromCounts(counts: DataFrame, topSeed: Int = 48,
                        target: Int = 24, maxLen: Int = 4,
                        iters: Int = 2, shrinkPermille: Int = 0): EmResult = {
    require(target >= 1 && topSeed >= target && iters >= 0,
      "need topSeed >= target >= 1 and iters >= 0")
    require(shrinkPermille >= 0 && shrinkPermille < 1000,
      "shrinkPermille must lie in [0, 1000)")
    val seed = collectPieces(pieceFrameFromCounts(counts, topSeed, maxLen))
    val inventories = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, Long)]]
    val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
    var inv = seed
    var i = 0
    while (i < iters) {
      val t0 = System.nanoTime()
      val usage = emUsage(counts, inv)
      // K-dominance guard, the pieceFrameFromCounts discipline: a usage
      // count at or past K flips a cost non-positive and the objective
      // silently inverts — fail loudly instead
      usage.foreach { case (p, u) =>
        require(u < CostScale,
          s"unigram piece '$p' usage $u reaches CostScale=$CostScale — " +
            "the integer objective would invert; raise CostScale")
      }
      val singles = inv.collect { case (p, _) if pieceLen(p) == 1 =>
        (p, CostScale - usage.getOrElse(p, 0L))
      }
      val curMultis = inv.count(p => pieceLen(p._1) >= 2)
      val keepM =
        if (shrinkPermille <= 0) target
        else math.max(target,
          ((curMultis.toLong * shrinkPermille + 999) / 1000).toInt)
      val multis = usage.toSeq
        .collect { case (p, u) if pieceLen(p) >= 2 && u > 0 => (p, u) }
        .sortBy { case (p, u) => (-u, p) }
        .take(keepM)
        .map { case (p, u) => (p, CostScale - u) }
      inv = (singles ++ multis).sortBy(_._1).toIndexedSeq
      inventories += inv
      walls += (System.nanoTime() - t0) / 1e9
      i += 1
    }
    EmResult(seed, inventories.toSeq, walls.toSeq)
  }

  /** [[emTrainFromCounts]] from raw documents. */
  def emTrain(docs: DataFrame, textCol: String = "text", topSeed: Int = 48,
              target: Int = 24, maxLen: Int = 4, iters: Int = 2,
              shrinkPermille: Int = 0): EmResult =
    emTrainFromCounts(WordPiece.wordCounts(docs, textCol),
      topSeed, target, maxLen, iters, shrinkPermille)

  /** One SOFT-EM training run: probability inventories (piece, θ) per
    * iteration, plus the corpus log-likelihood measured under each
    * iteration's INPUT inventory (`logLik(i)` = LL under the inventory
    * the i-th E-step consumed — consecutive no-prune entries witness
    * the EM ascent property). */
  final case class SoftEmResult(seed: Seq[(String, Double)],
                                iterations: Seq[Seq[(String, Double)]],
                                logLik: Seq[Double]) {
    def pieces: Seq[(String, Double)] = iterations.lastOption.getOrElse(seed)
  }

  /** SOFT EM — Kudo 2018 §3.2 as PUBLISHED: the E-step computes
    * EXPECTED piece counts by forward–backward over every word's full
    * segmentation lattice under the current piece probabilities
    * ([[graft.functions.UnigramExpectedCounts]]), where [[emTrainFromCounts]]'
    * hard E-step counts only the Viterbi path. The M-step re-estimates
    * θ(piece) ∝ expected count and prunes exactly like the hard path
    * (all single chars kept for coverage; multis ranked by expected
    * count, ties on the piece string; the same `shrinkPermille`
    * schedule). Seed θ ∝ substring occurrence weight.
    *
    * Division of labor with the hard path (deliberate, documented in
    * [[emTrainFromCounts]]'s fidelity bound): the SOFT estimator is
    * the published one, but its expected counts are fractional — the
    * corpus-level sum is fp-accumulation-order sensitive, so this
    * path is ENGINE-SIDE, pinned by property specs (hand-computable
    * lattice posteriors, the EM likelihood-ascent guarantee under a
    * fixed inventory, hard-EM agreement where the posterior is
    * peaked), while the integer hard path carries the bit-exact
    * DuckDB gate (q196). Per-word kernel output is deterministic
    * (fixed lattice iteration order); only the cross-word aggregation
    * order floats.
    *
    * Scale shape: identical to the hard path — the corpus is touched
    * once (the word-count aggregation feeding `counts`); each
    * iteration is one map-only kernel pass over the vocabulary-bounded
    * counts frame + one inventory-bounded aggregation + one scalar LL
    * aggregate. Iterations cost O(vocab), corpus-size-free. */
  def emTrainSoft(counts: DataFrame, topSeed: Int = 48,
                  target: Int = 24, maxLen: Int = 4,
                  iters: Int = 2, shrinkPermille: Int = 0): SoftEmResult = {
    require(target >= 1 && topSeed >= target && iters >= 0,
      "need topSeed >= target >= 1 and iters >= 0")
    require(shrinkPermille >= 0 && shrinkPermille < 1000,
      "shrinkPermille must lie in [0, 1000)")
    def normalize(w: Seq[(String, Double)]): Seq[(String, Double)] = {
      val tot = w.iterator.map(_._2).sum
      w.map { case (p, v) => (p, v / tot) }.sortBy(_._1).toIndexedSeq
    }
    val seed = normalize(
      collectPieces(pieceFrameFromCounts(counts, topSeed, maxLen))
        .map { case (p, cost) => (p, (CostScale - cost).toDouble) })
    val inventories = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, Double)]]
    val lls = scala.collection.mutable.ArrayBuffer.empty[Double]
    var inv = seed
    var i = 0
    while (i < iters) {
      val (expected, ll) = softEStep(counts, inv)
      lls += ll
      val singles = inv.collect { case (p, _) if pieceLen(p) == 1 =>
        (p, expected.getOrElse(p, 0.0))
      }
      val curMultis = inv.count(p => pieceLen(p._1) >= 2)
      val keepM =
        if (shrinkPermille <= 0) target
        else math.max(target,
          ((curMultis.toLong * shrinkPermille + 999) / 1000).toInt)
      val multis = expected.toSeq
        .collect { case (p, e) if pieceLen(p) >= 2 && e > 0.0 => (p, e) }
        .sortBy { case (p, e) => (-e, p) }
        .take(keepM)
      // a coverage char can carry expected count 0 under a dominating
      // longer piece ONLY at the fp underflow floor; keep θ positive
      // (the kernel requires it) with a mass far below one occurrence
      val floor = 1e-300
      inv = normalize((singles.map { case (p, e) =>
        (p, math.max(e, floor))
      } ++ multis))
      inventories += inv
      i += 1
    }
    SoftEmResult(seed, inventories.toSeq, lls.toSeq)
  }

  /** [[emTrainSoft]] from raw documents. */
  def emTrainSoftDocs(docs: DataFrame, textCol: String = "text",
                      topSeed: Int = 48, target: Int = 24, maxLen: Int = 4,
                      iters: Int = 2, shrinkPermille: Int = 0): SoftEmResult =
    emTrainSoft(WordPiece.wordCounts(docs, textCol),
      topSeed, target, maxLen, iters, shrinkPermille)

  /** Corpus log-likelihood of `counts` under a probability inventory —
    * Σ_w n_w · ln α_w(L). One map-only pass + a scalar aggregate. */
  def softLogLik(counts: DataFrame, inv: Seq[(String, Double)]): Double =
    counts.select((col("n").cast("double") *
        graft.functions.UnigramFunctions.unigram_lattice_ll(
          col("word"), inv.map(_._1), inv.map(_._2))).as("ll"))
      // coalesce: sum over an EMPTY counts frame is NULL — an empty
      // corpus degrades to LL 0.0 instead of an NPE (ADVICE r14)
      .agg(coalesce(sum(col("ll")), lit(0.0))).head().getDouble(0)

  /** The soft E-step under the DuckDB hash gate (q212; VERDICT r14
    * #7): corpus-level expected piece counts in FIXED POINT. `inv` is
    * (piece, integer weight); θ_p = weight_p / Σ weights (one double
    * division of integers — engine-replayable); each lattice
    * occurrence's posterior rounds to ⌊e·scale + 0.5⌋ BEFORE any
    * accumulation ([[graft.functions.UnigramKernel
    * .expectedCountsFixed]]), so the per-word, per-piece, and corpus
    * sums are all INTEGER — the one fp-order-sensitive step of the
    * published estimator (the cross-word sum, see [[emTrainSoft]]'s
    * engine-side rationale) becomes order-free, and an oracle that
    * replays the same +/×/÷ recursion reproduces the longs exactly.
    *
    * Output: (piece, e_fixed) — e_fixed = Σ_w n_w · Σ_occ
    * ⌊α(i)θβ(j)/α(L)·scale + 0.5⌋, a BIGINT. Dividing by `scale`
    * recovers the M-step numerators to 1/scale absolute precision
    * (the documented hard-vs-soft fidelity bound is far coarser).
    * One map-only kernel pass + one inventory-bounded aggregation —
    * [[softEStep]]'s plan shape exactly. */
  def softExpectedCountsFixed(counts: DataFrame, inv: Seq[(String, Long)],
                              scale: Long = 1000000000L): DataFrame = {
    require(inv.nonEmpty, "fixed-point E-step needs a non-empty inventory")
    val total = inv.map(_._2).sum
    val probs = inv.map(_._2.toDouble / total)
    counts
      .select(explode(graft.functions.UnigramFunctions
          .unigram_expected_counts_fixed(
            col("word"), inv.map(_._1), probs, scale)).as("pc"),
        col("n"))
      .groupBy(col("pc.piece").as("piece"))
      .agg(sum(col("pc.c") * col("n")).as("e_fixed"))
  }

  /** One FULL soft-EM iteration in fixed point (q214 — the q212
    * E-step plus the integer M-step): pass 1 produces BIGINT expected
    * counts; the M-step renormalizes them — θ'_p = e_p / Σe, one
    * double division of integers per piece, exactly as replayable as
    * the seed weights — and pass 2 runs the lattice under θ'. No
    * floating-point accumulation order exists anywhere in the loop
    * body: every sum is integer, every double is a deterministic
    * per-word expression. Pieces whose pass-1 count rounds to zero
    * everywhere drop from the iteration inventory (both sides —
    * engine omission and oracle HAVING — agree). Σe stays well under
    * 2⁵³ (≈ tokens·scale·pieces-per-word) through sf-scale corpora;
    * the doubles conversion is exact there.
    *
    * Output: pass-2 (piece, e_fixed). The pass-1 collect is
    * inventory-bounded (the established discipline). */
  def softEmIterationFixed(counts: DataFrame, inv: Seq[(String, Long)],
                           scale: Long = 1000000000L): DataFrame = {
    val e1 = softExpectedCountsFixed(counts, inv, scale)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).toIndexedSeq
    // empty corpus / all posteriors rounded to zero: pass 1 produced
    // no surviving pieces, so there is no θ' to renormalize — return
    // the empty pass-1 frame instead of letting pass 2 trip
    // softExpectedCountsFixed's non-empty-inventory require with an
    // opaque IllegalArgumentException (ADVICE r15; the sibling soft-EM
    // paths degrade gracefully on empty corpora the same way).
    if (e1.isEmpty) emptyEFixedFrame(counts)
    else softExpectedCountsFixed(counts, e1, scale)
  }

  /** The (piece STRING, e_fixed BIGINT) empty frame the fixed-point
    * paths degrade to on an empty corpus. */
  private def emptyEFixedFrame(counts: DataFrame): DataFrame =
    counts.sparkSession.createDataFrame(
      counts.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("piece",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("e_fixed",
          org.apache.spark.sql.types.LongType))))

  /** One PRUNED trainer round in fixed point (q220 — the full
    * published training loop body: E-step, integer M-step, the Kudo
    * §3.2 prune, then the next E-step under the pruned θ'): pass 1
    * produces BIGINT expected counts under the seed θ; the prune keeps
    * every single-codepoint piece (coverage is sacred — [[emTrain]]'s
    * discipline) plus the top ⌈`keepMultiFrac`·|multis|⌉ multi-piece
    * entries by (e_fixed DESC, piece ASC) — an INTEGER-ordered
    * selection, so the kept set is engine-replayable with no
    * fp-order anywhere; θ' renormalizes the survivors' integer counts
    * (one double division of integers per piece, the
    * [[softEmIterationFixed]] discipline — dropped mass reflows
    * implicitly through the smaller denominator); pass 2 runs the
    * lattice under θ'. Output: pass-2 (piece, e_fixed).
    *
    * Fidelity note: ties inside e_fixed break on the piece string —
    * total, deterministic, and identical to the oracle's
    * ROW_NUMBER() OVER (ORDER BY e DESC, piece). The pass-1 collect
    * is inventory-bounded (the established discipline). */
  def softEmPrunedIterationFixed(counts: DataFrame, inv: Seq[(String, Long)],
                                 keepMultiFrac: Double = 0.75,
                                 scale: Long = 1000000000L): DataFrame = {
    require(keepMultiFrac >= 0.0 && keepMultiFrac <= 1.0,
      s"keepMultiFrac must be a fraction, got $keepMultiFrac")
    val e1 = softExpectedCountsFixed(counts, inv, scale)
      .collect().map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
    if (e1.isEmpty) return emptyEFixedFrame(counts)
    val (singles, multis) = e1.partition { case (p, _) => pieceLen(p) == 1 }
    val kept = multis.sortBy { case (p, e) => (-e, p) }
      .take(math.ceil(keepMultiFrac * multis.size).toInt)
    val inv2 = (singles ++ kept).sortBy(_._1)
    if (inv2.isEmpty) emptyEFixedFrame(counts)
    else softExpectedCountsFixed(counts, inv2, scale)
  }

  /** The soft E-step: expected piece counts (weighted by word
    * frequency) and the corpus LL under the input inventory. One
    * kernel pass + one inventory-bounded aggregation. */
  private def softEStep(counts: DataFrame,
                        inv: Seq[(String, Double)]): (Map[String, Double], Double) = {
    val expected = counts
      .select(explode(graft.functions.UnigramFunctions.unigram_expected_counts(
          col("word"), inv.map(_._1), inv.map(_._2))).as("pc"),
        col("n"))
      .groupBy(col("pc.piece").as("piece"))
      .agg(sum(col("pc.c") * col("n")).as("e"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    (expected, softLogLik(counts, inv))
  }

  /** The E-step accounting: per piece, its occurrence count in the
    * deterministic Viterbi segmentations of the distinct words, weighted
    * by word frequency. One map-only kernel pass over the bounded
    * counts frame + one inventory-bounded aggregation. */
  private def emUsage(counts: DataFrame,
                      inv: Seq[(String, Long)]): Map[String, Long] =
    counts
      .select(explode(graft.functions.UnigramFunctions.unigram_segment(
          col("word"), inv.map(_._1), inv.map(_._2), CostScale)).as("piece"),
        col("n"))
      .groupBy("piece").agg(sum("n").as("u"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def pieceLen(p: String): Int = p.codePointCount(0, p.length)

  /** Per document: word count, total Viterbi cost, and the (unique)
    * optimal piece count. One map-only projection. */
  def viterbiStats(docs: DataFrame, pieces: Seq[(String, Long)],
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = split(col(textCol), " ")
    val st = graft.functions.UnigramFunctions.unigram_viterbi_stats(
      toks, pieces.map(_._1), pieces.map(_._2), CostScale)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        size(filter(toks, t => t =!= "")).cast("long").as("n_words"),
        st.as("__s"))
      .select(col(idCol), col("n_words"),
        col("__s").getField("viterbi_cost").as("viterbi_cost"),
        col("__s").getField("n_pieces").as("n_pieces"))
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based n-gram language-model scoring over a corpus — the two
  * standard uses in a training-data pipeline:
  *
  *  - '''perplexity filtering''' (CCNet, Wenzek et al. 2020,
  *    arXiv:1911.00359): score every document under an n-gram LM and
  *    drop the worst tail — the cheap proxy for "is this fluent text".
  *    The reference pipeline uses KenLM; the model here is a
  *    Laplace-smoothed bigram LM trained on the corpus itself, which
  *    keeps the whole thing exactly recomputable by an independent
  *    engine (the real-KenLM swap is a scoring-UDF seam, not a plan
  *    change).
  *  - '''importance resampling''' (DSIR, Xie et al. 2023,
  *    arXiv:2302.03169): weight every raw document by
  *    log p_target(d) − log p_raw(d) under two unigram feature LMs and
  *    keep the top of the reweighted distribution. The paper hashes
  *    n-gram features into 10k buckets; with a closed test vocabulary
  *    plain unigrams are the same estimator (the hash is a modular
  *    `hash(term) % B` swap on the group key).
  *
  * Scale shape: every model is a pre-aggregated count frame (vocab- or
  * bigram-vocab-sized, map-side combinable), documents reduce to
  * per-doc (gram, n) frames before any join, and count frames join
  * back by key — no per-row UDF, no driver-side model object, no
  * window over the corpus. Threshold selection (the filter quantile)
  * is one exact percentile over a doc-count-sized frame.
  */
object NgramLM {

  /** Per-document (w1, w2, n) adjacent-bigram counts from a
    * space-tokenized text column. Derived with one `transform` over the
    * token array — no self-join, no posexplode matching. */
  def docBigrams(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    // PROJECT the token array before indexing into it: inside the
    // transform lambda, an inline `split(...)` expression re-evaluates
    // for every element_at call — O(tokens²) splits per document
    // (measured 3 s for 270k bigrams at sf0.1). A bound column attribute
    // evaluates once per row, making the lambda O(tokens).
    val toks = col("__toks")
    // size < 2 would make sequence(0, size-2) DESCEND ([0, -1]) and
    // element_at(toks, 0) throw — single-token docs have no bigrams
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__toks"))
      .filter(size(toks) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(toks) - 2),
          i => struct(element_at(toks, i + 1).as("w1"),
                      element_at(toks, i + 2).as("w2")))).as("g"))
      .select(col("doc_id"), col("g.w1"), col("g.w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("n"))
  }

  /** Corpus-level (w1, w2, n) bigram counts with NO per-document axis —
    * the maintained-store partial ([[graft.streaming.BigramStream]]).
    * The count multiset is invariant to how documents are keyed, so
    * this skips the per-doc grouping entirely: one explode, ONE shuffle
    * on (w1, w2), and no dependence on any id column (ADVICE r13 — the
    * store must ingest a corpus however, or whether, it is keyed). */
  def corpusBigrams(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = col("__toks")
    docs.select(split(col(textCol), " ").as("__toks"))
      .filter(size(toks) >= 2)
      .select(explode(transform(sequence(lit(0), size(toks) - 2),
        i => struct(element_at(toks, i + 1).as("w1"),
                    element_at(toks, i + 2).as("w2")))).as("g"))
      .select(col("g.w1"), col("g.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
  }

  /** Average bigram log-likelihood per document under a
    * Laplace-smoothed bigram LM trained on `train` (usually the corpus
    * itself):
    *
    *   logP(w2|w1) = ln((c(w1,w2) + 1) / (c(w1·) + V))
    *
    * where c(w1·) is w1's count as a bigram CONTEXT (both counts derive
    * from the same bigram frame, so the model is self-consistent and
    * independently recomputable) and V is the distinct-unigram count of
    * the training corpus. Unseen bigrams whose context was seen still
    * score via smoothing; the left-join keeps c12 = 0 rows finite.
    *
    * Output: (doc_id, n_bigrams, avg_lp) with avg_lp rounded to
    * `scale` decimals — the per-doc sum is ≤ doc-length ln() terms, so
    * cross-engine libm 1-ulp drift is ~1e-13 relative, far inside a
    * 4-decimal round. */
  def bigramLogLik(docs: DataFrame, train: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text",
                   scale: Int = 4): DataFrame = {
    // The per-doc bigram frame is the expensive subtree (token explode +
    // shuffle); without intervention it appears 2-4× in the final DAG
    // (grams, c12←train, and once more per downstream reuse) and Spark
    // does not reliably fold the copies into one exchange. Persist it
    // once; when train IS docs (the self-trained filter), the model
    // counts derive from the SAME cached frame, so the corpus is
    // exploded exactly once. Spill-safe (MEMORY_AND_DISK): the frame is
    // (doc, w1, w2, n) — tokens-sized, never wider than the input text.
    val grams = docBigrams(docs, idCol, textCol).persist()
    val trainGrams =
      if (train eq docs) grams else docBigrams(train, idCol, textCol).persist()
    try {
    val c12 = trainGrams.groupBy("w1", "w2").agg(sum("n").as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = train
      .select(explode(split(col(textCol), " ")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    grams
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lp",
        col("n") * log((coalesce(col("c12"), lit(0L)) + lit(1.0)) /
          (coalesce(col("c1"), lit(0L)) + col("v"))))
      .groupBy("doc_id")
      .agg(sum("n").as("n_bigrams"),
        round(sum("lp") / sum("n"), scale).as("avg_lp"))
      // O(docs) rows, 3 columns: eager-materialize so callers that use
      // the scored frame twice (threshold + gate) never re-run the LM.
      .localCheckpoint(true)
    } finally {
      // unpersist even when the compute throws (a failing query must not
      // leak cached frames into executor storage for the session's life)
      grams.unpersist(false)
      if (!(train eq docs)) trainGrams.unpersist(false): Unit
    }
  }

  /** Average bigram log-likelihood per document under an INTERPOLATED
    * KNESER-NEY bigram LM (Kneser & Ney 1995; the Chen & Goodman 1999
    * interpolated form) trained on `train` — the smoothing KenLM (and
    * therefore the CCNet reference pipeline) actually uses, upgrading
    * [[bigramLogLik]]'s Laplace baseline:
    *
    *   P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
    *              + (D · N1+(w1,·)/c(w1·)) · P_cont(w2)
    *   P_cont(w2) = N1+(·,w2) / N1+(··)
    *   D = n1 / (n1 + 2·n2)        (count-of-counts estimate)
    *
    * Degenerate-discount guard (ADVICE r13): the count-of-counts
    * estimate gives D = 0 whenever n1 = 0 with n2 > 0 (no singleton
    * bigram types), and a zero discount leaves NO reserved mass — an
    * unseen bigram with a seen history would score P = 0 and silently
    * fall into the OOV tally, contradicting the documented rule that
    * only an unseen-continuation w2 is OOV. So D floors at 0.5 whenever
    * n1 = 0 (subsuming the empty count-of-counts case), in the engine
    * AND every oracle replay. Only reachable in cross-scoring on a
    * corpus with no singleton bigrams; self-scoring never produces an
    * unseen gram.
    *
    * where N1+(w1,·)/N1+(·,w2) are distinct right/left continuations,
    * N1+(··) the distinct-bigram total, and n1/n2 the number of bigram
    * types seen exactly once/twice. The continuation distribution is
    * the whole point: a word that appears often but only after ONE
    * history ("Francisco") gets a LOW back-off weight — Laplace cannot
    * express this. Every model quantity is an integer count or a ratio
    * of integers, so an independent engine replays the model exactly;
    * D computes in-plan from the broadcast count-of-counts row.
    *
    * Back-off/OOV rule (pinned by spec): a bigram whose history is
    * unseen backs off entirely to P_cont(w2); a bigram whose w2 was
    * never seen as a continuation is OOV — excluded from the average
    * and counted in `n_oov` (deterministic, engine-replayable; no
    * arbitrary unseen-mass constant). Self-scoring (train = docs, the
    * filter convention) never hits either arm.
    *
    * Scale shape: identical to [[bigramLogLik]] — the corpus explodes
    * once (persisted, shared when train eq docs), model frames are
    * bigram-vocab-sized with map-side partial aggregation, the
    * count-of-counts row broadcasts, scoring is count-frame equi-joins
    * back onto the per-doc gram frame. No UDF, no window, no driver
    * model object.
    *
    * Output: (doc_id, n_bigrams, n_oov, avg_lp) — avg_lp over the
    * SCORED bigrams, rounded to `scale` decimals (the q106 libm-drift
    * argument), 0.0 when everything was OOV. */
  def knLogLik(docs: DataFrame, train: DataFrame,
               idCol: String = "doc_id", textCol: String = "text",
               scale: Int = 4): DataFrame = {
    val grams = docBigrams(docs, idCol, textCol).persist()
    val trainGrams =
      if (train eq docs) grams else docBigrams(train, idCol, textCol).persist()
    try knScore(grams,
      trainGrams.groupBy("w1", "w2").agg(sum("n").as("c12")), scale)
    finally {
      grams.unpersist(false)
      if (!(train eq docs)) trainGrams.unpersist(false): Unit
    }
  }

  /** [[knLogLik]] from an ALREADY-AGGREGATED (w1, w2, n) bigram-count
    * frame — the seam a maintained store reads through (the
    * `vocabFrameFromCounts` discipline): the ENTIRE Kneser-Ney model —
    * raw counts, history totals, BOTH continuation-count tables, the
    * count-of-counts discount — is a pure function of the bigram-count
    * multiset, which is ADDITIVE, so identical maintained counts force
    * bit-identical scores and the maintained path answers the one-shot
    * oracle verbatim (q202 gates it against q201's). */
  def knLogLikFromCounts(docs: DataFrame, counts: DataFrame,
                         idCol: String = "doc_id", textCol: String = "text",
                         scale: Int = 4): DataFrame = {
    val grams = docBigrams(docs, idCol, textCol).persist()
    try knScore(grams,
      counts.groupBy("w1", "w2").agg(sum("n").as("c12")), scale)
    finally { grams.unpersist(false); () }
  }

  /** The three aggregate frames of the bigram-KN model, all derived
    * from the ONE persisted (w1, w2, c12) type table: per-history
    * totals (c1, distinct right continuations nf), per-word distinct
    * left continuations (nb), and the global count-of-counts row
    * (type total b, singleton/doubleton type counts n1/n2). */
  private def knModelFrames(c12: DataFrame): (DataFrame, DataFrame, DataFrame) = (
    c12.groupBy("w1").agg(sum("c12").as("c1"), count(lit(1)).as("nf")),
    c12.groupBy("w2").agg(count(lit(1)).as("nb")),
    c12.agg(count(lit(1)).as("b"),
      sum(when(col("c12") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("c12") === 2, 1L).otherwise(0L)).as("n2"),
      sum(col("c12")).as("ntok")))

  /** The count-of-counts discount with the n1 = 0 floor — see the
    * degenerate-discount guard in [[knLogLik]]'s scaladoc. */
  private def knD: Column =
    when(col("n1") === 0, lit(0.5))
      .otherwise(col("n1").cast("double") / (col("n1") + lit(2) * col("n2")))

  /** The shared KN scoring stage over a per-doc gram frame and the
    * aggregated model counts (both callers manage `grams` persistence). */
  private def knScore(grams: DataFrame, c12Raw: DataFrame,
                      scale: Int): DataFrame = {
    val c12 = c12Raw
        .persist() // three model frames derive from it; aggregate once
      try {
        val (hist, cont, tot) = knModelFrames(c12)
        val d = knD
        val pcont = col("nb").cast("double") / col("b")
        val pSeenHist =
          greatest(coalesce(col("c12"), lit(0L)).cast("double") - d, lit(0.0)) /
            col("c1") +
          (d * col("nf") / col("c1")) * pcont
        val p = when(col("nb").isNotNull && col("c1").isNotNull, pSeenHist)
          .when(col("nb").isNotNull && col("c1").isNull, pcont)
        grams
          .join(c12, Seq("w1", "w2"), "left")
          .join(hist, Seq("w1"), "left")
          .join(cont, Seq("w2"), "left")
          .crossJoin(broadcast(tot))
          .withColumn("lp", col("n") * log(p))
          .groupBy("doc_id")
          .agg(sum("n").as("n_bigrams"),
            coalesce(sum(when(col("lp").isNull, col("n"))), lit(0L))
              .as("n_oov"),
            coalesce(
              round(sum("lp") /
                sum(when(col("lp").isNotNull, col("n"))), scale),
              lit(0.0)).as("avg_lp"))
          .localCheckpoint(true)
      } finally { c12.unpersist(false); () }
  }

  /** The explicit-entry loss table of an entropy-pruned KN model
    * (Stolcke 1998's pruning criterion in its weighted-log-likelihood
    * form — the deployment step SRILM's `-prune` and KenLM's `filter`
    * perform before shipping a model): one row per bigram TYPE of the
    * [[knLogLik]] model over `train`, with
    *
    *   loss(w1,w2) = (c12 / N) · (ln pSeen − ln(bow(w1) · P_cont(w2)))
    *
    * — the PER-TOKEN log-likelihood the corpus loses when the explicit
    * entry is dropped and its occurrences score through the back-off
    * arm instead (N = total training bigram tokens; normalizing makes
    * `eps` a corpus-size-free threshold, the SRILM `-prune` convention
    * — the same eps keeps the same meaning as the corpus grows 100×).
    * Always ≥ 0: pSeen = discounted mass + bow·P_cont ≥ bow·P_cont.
    * `kept` = round(loss, 9) ≥ eps; the rounding pins the threshold
    * comparison against cross-engine libm 1-ulp drift (the q106
    * argument — loss is a single composed term with absolute drift
    * ~1e-16, nine decimals absorb it).
    *
    * Output: (w1, w2, c12, nb, loss, kept) — the model-size-vs-eps
    * surface the bench artifact reads. */
  def knPruneEntries(train: DataFrame, eps: Double,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val grams = docBigrams(train, idCol, textCol)
    knPruneEntriesFromCounts(
      grams.groupBy("w1", "w2").agg(sum("n").as("c12")), eps)
  }

  /** [[knPruneEntries]] from the aggregated (w1, w2, c12) type table. */
  private def knPruneEntriesFromCounts(c12Raw: DataFrame,
                                       eps: Double): DataFrame = {
    val c12 = c12Raw
    val (hist, cont, tot) = knModelFrames(c12)
    val d = knD
    val pcont = col("nb").cast("double") / col("b")
    val bow = d * col("nf") / col("c1")
    val pSeen = (col("c12").cast("double") - d) / col("c1") + bow * pcont
    c12.join(hist, Seq("w1")).join(cont, Seq("w2"))
      .crossJoin(broadcast(tot))
      .withColumn("loss", round((col("c12").cast("double") / col("ntok")) *
        (log(pSeen) - log(bow * pcont)), 9))
      .select(col("w1"), col("w2"), col("c12"), col("nb"), col("loss"),
        (col("loss") >= eps).as("kept"))
  }

  /** Per-document scoring under the ENTROPY-PRUNED interpolated-KN
    * bigram model — [[knLogLik]]'s deployment-shaped complement
    * (Stolcke 1998; the KenLM/SRILM model-filtering step): the full
    * model trains as usual, every explicit bigram entry whose removal
    * costs < `eps` weighted log-likelihood ([[knPruneEntries]]) is
    * DROPPED, and each history's back-off weight renormalizes over the
    * surviving entries so the pruned model still sums to exactly 1:
    *
    *   γ(w1) = (1 − Σ_kept pSeen(w1,·)) / (1 − Σ_kept P_cont(·))
    *
    * — the standard back-off renormalization. With nothing pruned
    * γ(w1) = bow(w1) and scores equal [[knLogLik]] verbatim; with
    * nothing kept γ(w1) = 1 and the history scores pure P_cont
    * (spec-pinned). Both γ sums reduce to INTEGER per-history
    * aggregates over the kept set — Σ pSeen = (Σc12 − k·D)/c1 +
    * bow·(Σnb)/b and Σ P_cont = (Σnb)/b with k, Σc12, Σnb integers —
    * so no floating-point accumulation order can drift between the
    * engine and an oracle replay; γ is one deterministic expression
    * per history.
    *
    * Scoring rule: kept entry → pSeen; pruned or unseen w2 under a
    * seen history → γ(w1)·P_cont(w2); unseen history → P_cont(w2);
    * w2 never a continuation → OOV (the [[knLogLik]] rule). Unlike
    * the unpruned model, SELF-scoring exercises the back-off arm —
    * every pruned entry's occurrences route through γ — which is what
    * puts the renormalization under the q205 hash gate.
    *
    * Scale shape: [[knLogLik]]'s exactly — one corpus explode, model
    * frames bigram-vocabulary-sized, the kept set is a filter on the
    * type table, γ one more vocabulary-sized aggregate, scoring stays
    * count-frame equi-joins. The pruned model frame itself (kept
    * entries + per-history γ rows) is the BOUNDED artifact a serving
    * system ships.
    *
    * Output: (doc_id, n_bigrams, n_oov, avg_lp), the [[knLogLik]]
    * shape. */
  def knPrunedLogLik(docs: DataFrame, train: DataFrame, eps: Double,
                     idCol: String = "doc_id", textCol: String = "text",
                     scale: Int = 4): DataFrame = {
    val grams = docBigrams(docs, idCol, textCol).persist()
    val trainGrams =
      if (train eq docs) grams else docBigrams(train, idCol, textCol).persist()
    try knPrunedScore(grams,
      trainGrams.groupBy("w1", "w2").agg(sum("n").as("c12")), eps, scale)
    finally {
      grams.unpersist(false)
      if (!(train eq docs)) trainGrams.unpersist(false): Unit
    }
  }

  /** [[knPrunedLogLik]] from an ALREADY-AGGREGATED (w1, w2, n)
    * bigram-count frame — the maintained-store seam: the pruned model
    * (loss table, kept set, renormalized γ) is a pure function of the
    * additive count multiset exactly like the full model, so the
    * store-derived pruned scores answer the one-shot pruned oracle
    * verbatim (q206 gates it against q205's). */
  def knPrunedLogLikFromCounts(docs: DataFrame, counts: DataFrame,
                               eps: Double, idCol: String = "doc_id",
                               textCol: String = "text",
                               scale: Int = 4): DataFrame = {
    val grams = docBigrams(docs, idCol, textCol).persist()
    try knPrunedScore(grams,
      counts.groupBy("w1", "w2").agg(sum("n").as("c12")), eps, scale)
    finally { grams.unpersist(false); () }
  }

  /** The shared pruned-KN scoring stage (callers manage `grams`). */
  private def knPrunedScore(grams: DataFrame, c12Raw: DataFrame,
                            eps: Double, scale: Int): DataFrame = {
      val c12 = c12Raw.persist()
      try {
        val (hist, cont, tot) = knModelFrames(c12)
        val d = knD
        val pcont = col("nb").cast("double") / col("b")
        // per-history integer aggregates over the kept set: k entries,
        // Σ c12, Σ nb — γ derives from these in one expression. The kept
        // frame is LAZY (r16): its only consumer is this model-sized
        // aggregate — the scoring join no longer reads it (the kept
        // decision re-evaluates INLINE per scored gram below), so the
        // old kept persist and the grams⋈kept join both drop out.
        val gam = knPruneEntriesFromCounts(c12, eps)
          .filter(col("kept"))
          .groupBy("w1").agg(count(lit(1)).as("k"),
            sum("c12").as("s12"), sum("nb").as("snb"))
        // γ rides on the history frame (same key), so the scoring chain
        // pays ONE (w1) join instead of two (r16; guide §2.4 — two
        // lookups keyed the same way share one join)
        val histg = hist.join(gam, Seq("w1"), "left")
        val bow = d * col("nf") / col("c1")
        val pSeen = (col("c12").cast("double") - d) / col("c1") + bow * pcont
        // the kept decision, inline: the SAME composed expression
        // [[knPruneEntriesFromCounts]] evaluates over the same integer
        // columns (joined here instead of there) ⇒ bit-identical loss,
        // identical decision. A gram unseen in training nulls c12, the
        // comparison, and the arm — exactly the old missed-join arm.
        val loss = round((col("c12").cast("double") / col("ntok")) *
          (log(pSeen) - log(bow * pcont)), 9)
        val num = lit(1.0) -
          (col("s12").cast("double") - col("k") * d) / col("c1") -
          (d * col("nf") / col("c1")) *
            (col("snb").cast("double") / col("b"))
        val den = lit(1.0) - col("snb").cast("double") / col("b")
        // den = 0 ⟺ the kept set covers the ENTIRE continuation
        // vocabulary for this history — then no in-vocab w2 can reach
        // the back-off arm, so γ is unreachable; pin 1.0 (num is 0 by
        // the same telescope) rather than emit NaN
        val gamma = when(col("k").isNull, lit(1.0))
          .when(den <= 0.0, lit(1.0))
          .otherwise(num / den)
        grams
          .join(c12, Seq("w1", "w2"), "left")
          .join(histg, Seq("w1"), "left")
          .join(cont, Seq("w2"), "left")
          .crossJoin(broadcast(tot))
          .withColumn("p",
            when(loss >= eps, pSeen)
              .when(col("c1").isNotNull && col("nb").isNotNull,
                gamma * pcont)
              .when(col("c1").isNull && col("nb").isNotNull, pcont))
          .withColumn("lp", col("n") * log(col("p")))
          .groupBy("doc_id")
          .agg(sum("n").as("n_bigrams"),
            coalesce(sum(when(col("lp").isNull, col("n"))), lit(0L))
              .as("n_oov"),
            coalesce(
              round(sum("lp") /
                sum(when(col("lp").isNotNull, col("n"))), scale),
              lit(0.0)).as("avg_lp"))
          .localCheckpoint(true)
      } finally { c12.unpersist(false); () }
  }

  /** Per-document scoring under the entropy-pruned TRIGRAM
    * interpolated-KN model — [[knPrunedLogLik]]'s criterion at
    * [[kn3LogLik]]'s order (Stolcke 1998 at the highest level of the
    * recursion): explicit TRIGRAM entries whose removal costs < `eps`
    * per-token log-likelihood,
    *
    *   loss = (c123/N) · (ln pHi − ln(bow3(w1,w2) · P̂(w3|w2))),
    *
    * drop, and each (w1, w2) history's back-off weight renormalizes
    * over the survivors:
    *
    *   γ3(w1,w2) = (1 − Σ_kept pHi) / (1 − Σ_kept P̂(·|w2))
    *
    * The telescope that made q205's γ integer-derivable survives one
    * order up BECAUSE the history fixes w2: every kept continuation's
    * mid-level probability shares the (chatdot, nfhat) denominators,
    * so Σ_kept P̂ = ((Σĉ − k·D2) + D2·nfhat·(Σnb/b))/ĉ(w2,·) — the
    * per-history sums are again integer aggregates (k, Σc123, Σĉ,
    * Σnb) and no floating-point accumulation order exists anywhere.
    * Scoring: kept entry → pHi; pruned or unseen w3 under a seen
    * (w1,w2) → γ3·P̂(w3|w2) (with P̂'s own fall-throughs intact);
    * unseen (w1,w2) → P̂(w3|w2) directly (the unpruned fall-through —
    * a history with no explicit entries carries no γ, the q205
    * convention); w3 never a continuation → OOV. Self-scoring
    * exercises the γ3 arm on every pruned trigram.
    *
    * Output: (doc_id, n_trigrams, n_oov, avg_lp). */
  def kn3PrunedLogLik(docs: DataFrame, train: DataFrame, eps: Double,
                      idCol: String = "doc_id", textCol: String = "text",
                      scale: Int = 4): DataFrame = {
    val grams = docTrigrams(docs, idCol, textCol).persist()
    val trainGrams =
      if (train eq docs) grams else docTrigrams(train, idCol, textCol).persist()
    try kn3PrunedScore(grams,
      trainGrams.groupBy("w1", "w2", "w3").agg(sum("n").as("c123")), eps, scale)
    finally {
      grams.unpersist(false)
      if (!(train eq docs)) trainGrams.unpersist(false): Unit
    }
  }

  /** [[kn3PrunedLogLik]] from an aggregated (w1, w2, w3, n) frame —
    * the maintained-store seam (q208 gates the store-derived pruned
    * trigram model against q207's one-shot oracle verbatim). */
  def kn3PrunedLogLikFromCounts(docs: DataFrame, counts: DataFrame,
                                eps: Double, idCol: String = "doc_id",
                                textCol: String = "text",
                                scale: Int = 4): DataFrame = {
    val grams = docTrigrams(docs, idCol, textCol).persist()
    try kn3PrunedScore(grams,
      counts.groupBy("w1", "w2", "w3").agg(sum("n").as("c123")), eps, scale)
    finally { grams.unpersist(false); () }
  }

  /** The entropy-pruned KN bigram model as three BOUNDED frames — the
    * serving artifact a deployment ships instead of re-deriving the
    * model per query ([[graft.ext.KnModel]] writes/loads them):
    *
    *  - entries (w1, w2, p): the kept explicit probabilities;
    *  - backoff (w1, gamma): the renormalized back-off weight of EVERY
    *    seen history (γ = 1 where nothing was kept — the [[knPrunedLogLik]]
    *    arms exactly);
    *  - cont (w2, pcont): the continuation distribution.
    *
    * Every stored double is computed by the SAME column expressions
    * the in-memory scorer evaluates over the same integer frames, so
    * scoring from the loaded artifact ([[knScoreFromModel]]) equals
    * [[knPrunedLogLik]] bit-for-bit — parquet round-trips IEEE doubles
    * exactly (q209 pins the whole loop under q205's oracle). All three
    * frames are at most bigram-vocabulary-sized. */
  def knPrunedModelFrames(counts: DataFrame,
                          eps: Double): (DataFrame, DataFrame, DataFrame) =
    withKnPrunedModelFrames(counts, eps)((e, b, c) =>
      // bounded frames: materialize before the caches underneath go
      (e.localCheckpoint(true), b.localCheckpoint(true),
        c.localCheckpoint(true)))

  /** Derive the three pruned-model frames LAZILY and hand them to `use`
    * while the internal caches are still alive — the export path writes
    * them straight to parquet (the write IS the materialization),
    * skipping the per-frame eager checkpoint the tuple-returning API
    * pays to outlive the unpersist (r16; same doubles either way — the
    * expressions are identical, only the materialization point moves). */
  private[graft] def withKnPrunedModelFrames[T](counts: DataFrame, eps: Double)(
      use: (DataFrame, DataFrame, DataFrame) => T): T = {
    val c12 = counts.groupBy("w1", "w2").agg(sum("n").as("c12")).persist()
    try {
      val (hist, cont, tot) = knModelFrames(c12)
      val d = knD
      val pcont = col("nb").cast("double") / col("b")
      val kept = knPruneEntriesFromCounts(c12, eps).filter(col("kept"))
        .select("w1", "w2", "c12", "nb").persist()
      try {
        val pSeen = (col("c12").cast("double") - d) / col("c1") +
          (d * col("nf") / col("c1")) * pcont
        val entries = kept.join(hist, Seq("w1"))
          .crossJoin(broadcast(tot))
          .select(col("w1"), col("w2"), pSeen.as("p"))
        val gam = kept.groupBy("w1").agg(count(lit(1)).as("k"),
          sum("c12").as("s12"), sum("nb").as("snb"))
        val num = lit(1.0) -
          (col("s12").cast("double") - col("k") * d) / col("c1") -
          (d * col("nf") / col("c1")) *
            (col("snb").cast("double") / col("b"))
        val den = lit(1.0) - col("snb").cast("double") / col("b")
        val gamma = when(col("k").isNull, lit(1.0))
          .when(den <= 0.0, lit(1.0))
          .otherwise(num / den)
        val backoff = hist.join(gam, Seq("w1"), "left")
          .crossJoin(broadcast(tot))
          .select(col("w1"), gamma.as("gamma"))
        val contP = cont.crossJoin(broadcast(tot))
          .select(col("w2"), pcont.as("pcont"))
        use(entries, backoff, contP)
      } finally { kept.unpersist(false); () }
    } finally { c12.unpersist(false); () }
  }

  /** Score documents against a LOADED pruned-model artifact — no raw
    * counts, no model derivation, three equi-joins against the bounded
    * frames (the serving path; bit-identical to [[knPrunedLogLik]]
    * because the stored doubles ARE the in-memory scorer's values):
    * kept entry → p; pruned-or-unseen w2 under a seen history →
    * γ(w1)·pcont; unseen history → pcont; w2 never a continuation →
    * OOV. */
  def knScoreFromModel(docs: DataFrame, entries: DataFrame,
                       backoff: DataFrame, contP: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text",
                       scale: Int = 4): DataFrame = {
    val grams = docBigrams(docs, idCol, textCol).persist()
    try {
      grams
        .join(entries.select(col("w1"), col("w2"), col("p").as("__pe")),
          Seq("w1", "w2"), "left")
        .join(backoff, Seq("w1"), "left")
        .join(contP, Seq("w2"), "left")
        .withColumn("__p",
          when(col("__pe").isNotNull, col("__pe"))
            .when(col("gamma").isNotNull && col("pcont").isNotNull,
              col("gamma") * col("pcont"))
            .when(col("gamma").isNull && col("pcont").isNotNull,
              col("pcont")))
        .withColumn("lp", col("n") * log(col("__p")))
        .groupBy("doc_id")
        .agg(sum("n").as("n_bigrams"),
          coalesce(sum(when(col("lp").isNull, col("n"))), lit(0L))
            .as("n_oov"),
          coalesce(
            round(sum("lp") /
              sum(when(col("lp").isNotNull, col("n"))), scale),
            lit(0.0)).as("avg_lp"))
        .localCheckpoint(true)
    } finally { grams.unpersist(false); () }
  }

  /** The entropy-pruned TRIGRAM KN model as five BOUNDED frames — the
    * serving artifact at q207's order ([[graft.ext.KnModel]] writes and
    * loads them; the columnar equivalent of a pruned 3-gram ARPA file's
    * sections):
    *
    *  - entries  (w1, w2, w3, p): kept explicit trigram probabilities;
    *  - backoff12 (w1, w2, gamma): the renormalized back-off weight γ3
    *    of EVERY seen trigram history (γ3 = 1 where nothing was kept —
    *    the [[kn3PrunedLogLik]] arms exactly);
    *  - mid      (w2, w3, p): the continuation-count middle model
    *    P̂(w3|w2) for every seen continuation bigram;
    *  - backoff2 (w2, bow): the middle model's back-off weight
    *    D2·N1+(w2,·)/ĉ(w2,·) per seen mid-level history;
    *  - cont     (w3, pcont): the continuation distribution.
    *
    * Fidelity contract (the q209 discipline one order up): every stored
    * double is computed by the SAME column expressions the in-memory
    * scorer evaluates over the same integer count frames, and the
    * middle model's unseen-(w2,w3) arm reduces bit-exactly to
    * bow·pcont (greatest(0−D2, 0) = +0.0 and +0.0 + x = x in IEEE), so
    * scoring from the loaded artifact ([[kn3ScoreFromModel]]) equals
    * [[kn3PrunedLogLik]] bit-for-bit — q210 drives export → load →
    * score against q207's DuckDB oracle. All five frames are at most
    * trigram-vocabulary-sized; at 100 TB they broadcast and scoring is
    * map-only per executor. */
  def kn3PrunedModelFrames(counts: DataFrame, eps: Double)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) =
    withKn3PrunedModelFrames(counts, eps)((e, b12, m, b2, c) =>
      // bounded frames: materialize before the caches underneath go
      (e.localCheckpoint(true), b12.localCheckpoint(true),
        m.localCheckpoint(true), b2.localCheckpoint(true),
        c.localCheckpoint(true)))

  /** [[withKnPrunedModelFrames]] at order 3: lazy frames handed to `use`
    * inside the cache scope — the export path's no-double-materialization
    * seam (r16). */
  private[graft] def withKn3PrunedModelFrames[T](counts: DataFrame, eps: Double)(
      use: (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) => T): T = {
    val c123 = counts.groupBy("w1", "w2", "w3").agg(sum("n").as("c123"))
      .persist()
    try {
      val hist12 = c123.groupBy("w1", "w2")
        .agg(sum("c123").as("c12dot"), count(lit(1)).as("nf12"))
      val chat = c123.groupBy("w2", "w3").agg(count(lit(1)).as("chat"))
        .persist()
      try {
        val histHat = chat.groupBy("w2")
          .agg(sum("chat").as("chatdot"), count(lit(1)).as("nfhat"))
        val cont = chat.groupBy("w3").agg(count(lit(1)).as("nb"))
        val tot3 = c123.agg(
          sum(when(col("c123") === 1, 1L).otherwise(0L)).as("t_n1"),
          sum(when(col("c123") === 2, 1L).otherwise(0L)).as("t_n2"),
          sum(col("c123")).as("n3tok"))
        val totHat = chat.agg(count(lit(1)).as("b"),
          sum(when(col("chat") === 1, 1L).otherwise(0L)).as("h_n1"),
          sum(when(col("chat") === 2, 1L).otherwise(0L)).as("h_n2"))
        val d3 = when(col("t_n1") === 0, lit(0.5))
          .otherwise(col("t_n1").cast("double") /
            (col("t_n1") + lit(2) * col("t_n2")))
        val d2 = when(col("h_n1") === 0, lit(0.5))
          .otherwise(col("h_n1").cast("double") /
            (col("h_n1") + lit(2) * col("h_n2")))
        val pcont = col("nb").cast("double") / col("b")
        // the kept set via the ONE shared kn3Loss definition; keeps the
        // full joined row (all model columns) for the frames below
        val kept = c123.join(hist12, Seq("w1", "w2"))
          .join(chat, Seq("w2", "w3"))
          .join(histHat, Seq("w2")).join(cont, Seq("w3"))
          .crossJoin(broadcast(tot3.crossJoin(totHat)))
          .withColumn("loss", kn3Loss(d3, d2))
          .filter(col("loss") >= eps)
          .persist()
        try {
          // pMid over kept rows — chat non-null there, but keep the
          // scorer's exact expression shape (greatest/coalesce included)
          val pMid =
            greatest(coalesce(col("chat"), lit(0L)).cast("double") - d2,
                lit(0.0)) / col("chatdot") +
              (d2 * col("nfhat") / col("chatdot")) * pcont
          val pHiKept =
            (col("c123").cast("double") - d3) / col("c12dot") +
              (d3 * col("nf12") / col("c12dot")) * pMid
          val entries = kept
            .select(col("w1"), col("w2"), col("w3"), pHiKept.as("p"))
          // per-history integer aggregates over the kept set (the
          // kn3PrunedScore γ3 telescope verbatim)
          val gam = kept.groupBy("w1", "w2").agg(count(lit(1)).as("k"),
            sum("c123").as("s123"), sum("chat").as("schat"),
            sum("nb").as("snb"))
          val sumPLowKept =
            (col("schat").cast("double") - col("k") * d2) / col("chatdot") +
              (d2 * col("nfhat") / col("chatdot")) *
                (col("snb").cast("double") / col("b"))
          val sumPHiKept =
            (col("s123").cast("double") - col("k") * d3) / col("c12dot") +
              (d3 * col("nf12") / col("c12dot")) * sumPLowKept
          val den3 = lit(1.0) - sumPLowKept
          val gamma3 = when(col("k").isNull, lit(1.0))
            .when(den3 <= 0.0, lit(1.0))
            .otherwise((lit(1.0) - sumPHiKept) / den3)
          // every seen (w1,w2) history appears in hist12; histHat always
          // has its w2 (a trigram (w1,w2,w3) puts (w2,w3) into chat)
          val backoff12 = hist12.join(gam, Seq("w1", "w2"), "left")
            .join(histHat, Seq("w2"))
            .crossJoin(broadcast(tot3.crossJoin(totHat)))
            .select(col("w1"), col("w2"), gamma3.as("gamma"))
          val mid = chat.join(histHat, Seq("w2")).join(cont, Seq("w3"))
            .crossJoin(broadcast(totHat))
            .select(col("w2"), col("w3"), pMid.as("p"))
          val backoff2 = histHat.crossJoin(broadcast(totHat))
            .select(col("w2"),
              (d2 * col("nfhat") / col("chatdot")).as("bow"))
          val contP = cont.crossJoin(broadcast(totHat))
            .select(col("w3"), pcont.as("pcont"))
          use(entries, backoff12, mid, backoff2, contP)
        } finally { kept.unpersist(false); () }
      } finally { chat.unpersist(false); () }
    } finally { c123.unpersist(false); () }
  }

  /** Score documents against a LOADED pruned TRIGRAM model artifact —
    * no raw counts, no model derivation, five equi-joins against the
    * bounded frames (bit-identical to [[kn3PrunedLogLik]]; see the
    * fidelity contract at [[kn3PrunedModelFrames]]). Arms: kept entry →
    * p; otherwise pLow = mid p if (w2,w3) stored, else bow·pcont if w2
    * stored, else pcont if w3 stored, else OOV; a seen (w1,w2) history
    * (γ stored) scores γ·pLow, an unseen one scores pLow directly. */
  def kn3ScoreFromModel(docs: DataFrame, entries: DataFrame,
                        backoff12: DataFrame, mid: DataFrame,
                        backoff2: DataFrame, contP: DataFrame,
                        idCol: String = "doc_id", textCol: String = "text",
                        scale: Int = 4): DataFrame = {
    val grams = docTrigrams(docs, idCol, textCol).persist()
    try {
      val plow = when(col("__pm").isNotNull, col("__pm"))
        .when(col("bow").isNotNull && col("pcont").isNotNull,
          col("bow") * col("pcont"))
        .when(col("bow").isNull && col("pcont").isNotNull, col("pcont"))
      grams
        .join(entries.select(col("w1"), col("w2"), col("w3"),
          col("p").as("__pe")), Seq("w1", "w2", "w3"), "left")
        .join(backoff12.select(col("w1"), col("w2"), col("gamma")),
          Seq("w1", "w2"), "left")
        .join(mid.select(col("w2"), col("w3"), col("p").as("__pm")),
          Seq("w2", "w3"), "left")
        .join(backoff2, Seq("w2"), "left")
        .join(contP, Seq("w3"), "left")
        .withColumn("__plow", plow)
        .withColumn("__p",
          when(col("__pe").isNotNull, col("__pe"))
            .when(col("gamma").isNotNull && col("__plow").isNotNull,
              col("gamma") * col("__plow"))
            .otherwise(col("__plow")))
        .withColumn("lp", col("n") * log(col("__p")))
        .groupBy("doc_id")
        .agg(sum("n").as("n_trigrams"),
          coalesce(sum(when(col("lp").isNull, col("n"))), lit(0L))
            .as("n_oov"),
          coalesce(
            round(sum("lp") /
              sum(when(col("lp").isNotNull, col("n"))), scale),
            lit(0.0)).as("avg_lp"))
        .localCheckpoint(true)
    } finally { grams.unpersist(false); () }
  }

  /** The per-token loss of one explicit trigram entry (evaluated over
    * a frame carrying c123/c12dot/nf12/chat/chatdot/nfhat/nb/b/n3tok)
    * — ONE definition shared by the scoring prune and the public
    * entries table so the two can never drift. */
  private def kn3Loss(d3: Column, d2: Column): Column = {
    val pcont = col("nb").cast("double") / col("b")
    val pLowSeen = (col("chat").cast("double") - d2) / col("chatdot") +
      (d2 * col("nfhat") / col("chatdot")) * pcont
    val bow3 = d3 * col("nf12") / col("c12dot")
    val pHiSeen = (col("c123").cast("double") - d3) / col("c12dot") +
      bow3 * pLowSeen
    round((col("c123").cast("double") / col("n3tok")) *
      (log(pHiSeen) - log(bow3 * pLowSeen)), 9)
  }

  /** The explicit-entry loss table of the pruned TRIGRAM model —
    * [[knPruneEntries]] one order up: (w1, w2, w3, c123, loss, kept)
    * per trigram type of the [[kn3LogLik]] model over `train`. */
  def kn3PruneEntries(train: DataFrame, eps: Double,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val c123 = docTrigrams(train, idCol, textCol)
      .groupBy("w1", "w2", "w3").agg(sum("n").as("c123")).persist()
    try {
      val hist12 = c123.groupBy("w1", "w2")
        .agg(sum("c123").as("c12dot"), count(lit(1)).as("nf12"))
      val chat = c123.groupBy("w2", "w3").agg(count(lit(1)).as("chat"))
      val histHat = chat.groupBy("w2")
        .agg(sum("chat").as("chatdot"), count(lit(1)).as("nfhat"))
      val cont = chat.groupBy("w3").agg(count(lit(1)).as("nb"))
      val tot3 = c123.agg(
        sum(when(col("c123") === 1, 1L).otherwise(0L)).as("t_n1"),
        sum(when(col("c123") === 2, 1L).otherwise(0L)).as("t_n2"),
        sum(col("c123")).as("n3tok"))
      val totHat = chat.agg(count(lit(1)).as("b"),
        sum(when(col("chat") === 1, 1L).otherwise(0L)).as("h_n1"),
        sum(when(col("chat") === 2, 1L).otherwise(0L)).as("h_n2"))
      val d3 = when(col("t_n1") === 0, lit(0.5))
        .otherwise(col("t_n1").cast("double") /
          (col("t_n1") + lit(2) * col("t_n2")))
      val d2 = when(col("h_n1") === 0, lit(0.5))
        .otherwise(col("h_n1").cast("double") /
          (col("h_n1") + lit(2) * col("h_n2")))
      c123.join(hist12, Seq("w1", "w2")).join(chat, Seq("w2", "w3"))
        .join(histHat, Seq("w2")).join(cont, Seq("w3"))
        .crossJoin(broadcast(tot3.crossJoin(totHat)))
        .withColumn("loss", kn3Loss(d3, d2))
        .select(col("w1"), col("w2"), col("w3"), col("c123"), col("loss"),
          (col("loss") >= eps).as("kept"))
        .localCheckpoint(true)
    } finally { c123.unpersist(false); () }
  }

  /** The shared pruned trigram-KN scoring stage. */
  private def kn3PrunedScore(grams: DataFrame, c123Raw: DataFrame,
                             eps: Double, scale: Int): DataFrame = {
    val c123 = c123Raw.persist()
    try {
      val hist12 = c123.groupBy("w1", "w2")
        .agg(sum("c123").as("c12dot"), count(lit(1)).as("nf12"))
      val chat = c123.groupBy("w2", "w3").agg(count(lit(1)).as("chat"))
        .persist()
      try {
        val histHat = chat.groupBy("w2")
          .agg(sum("chat").as("chatdot"), count(lit(1)).as("nfhat"))
        val cont = chat.groupBy("w3").agg(count(lit(1)).as("nb"))
        val tot3 = c123.agg(
          sum(when(col("c123") === 1, 1L).otherwise(0L)).as("t_n1"),
          sum(when(col("c123") === 2, 1L).otherwise(0L)).as("t_n2"),
          sum(col("c123")).as("n3tok"))
        val totHat = chat.agg(count(lit(1)).as("b"),
          sum(when(col("chat") === 1, 1L).otherwise(0L)).as("h_n1"),
          sum(when(col("chat") === 2, 1L).otherwise(0L)).as("h_n2"))
        val d3 = when(col("t_n1") === 0, lit(0.5))
          .otherwise(col("t_n1").cast("double") /
            (col("t_n1") + lit(2) * col("t_n2")))
        val d2 = when(col("h_n1") === 0, lit(0.5))
          .otherwise(col("h_n1").cast("double") /
            (col("h_n1") + lit(2) * col("h_n2")))
        val pcont = col("nb").cast("double") / col("b")
        // the loss table over explicit entries (every joined quantity
        // non-null there): the ONE shared kn3Loss definition. LAZY since
        // r16 — its only consumer is the model-sized γ3 aggregate below;
        // the scoring join re-evaluates the kept decision INLINE, so the
        // old kept persist and the grams⋈kept join both drop out.
        val kept = c123.join(hist12, Seq("w1", "w2"))
          .join(chat, Seq("w2", "w3"))
          .join(histHat, Seq("w2")).join(cont, Seq("w3"))
          .crossJoin(broadcast(tot3.crossJoin(totHat)))
          .withColumn("loss", kn3Loss(d3, d2))
          .filter(col("loss") >= eps)
        val gam = kept.groupBy("w1", "w2").agg(count(lit(1)).as("k"),
          sum("c123").as("s123"), sum("chat").as("schat"),
          sum("nb").as("snb"))
        // γ3 rides on the trigram-history frame (same key): one (w1,w2)
        // join in the scoring chain instead of two (guide §2.4)
        val hist12g = hist12.join(gam, Seq("w1", "w2"), "left")
        // scoring arms — the kn3Score expressions plus γ3
        val pMid =
          greatest(coalesce(col("chat"), lit(0L)).cast("double") - d2,
              lit(0.0)) / col("chatdot") +
            (d2 * col("nfhat") / col("chatdot")) * pcont
        val pLow = when(col("nb").isNotNull && col("chatdot").isNotNull, pMid)
          .when(col("nb").isNotNull && col("chatdot").isNull, pcont)
        val sumPLowKept =
          (col("schat").cast("double") - col("k") * d2) / col("chatdot") +
            (d2 * col("nfhat") / col("chatdot")) *
              (col("snb").cast("double") / col("b"))
        val sumPHiKept =
          (col("s123").cast("double") - col("k") * d3) / col("c12dot") +
            (d3 * col("nf12") / col("c12dot")) * sumPLowKept
        val den3 = lit(1.0) - sumPLowKept
        val gamma3 = when(col("k").isNull, lit(1.0))
          .when(den3 <= 0.0, lit(1.0))
          .otherwise((lit(1.0) - sumPHiKept) / den3)
        val pHiKept =
          (col("c123").cast("double") - d3) / col("c12dot") +
            (d3 * col("nf12") / col("c12dot")) * pLow
        // the kept decision, inline: the SAME kn3Loss expression over
        // the same joined integer columns ⇒ bit-identical loss, same
        // decision; a gram with no explicit c123 entry nulls the
        // comparison and skips the arm — the old missed-join behavior
        val keptInline = kn3Loss(d3, d2) >= eps
        grams
          .join(c123, Seq("w1", "w2", "w3"), "left")
          .join(hist12g, Seq("w1", "w2"), "left")
          .join(chat, Seq("w2", "w3"), "left")
          .join(histHat, Seq("w2"), "left")
          .join(cont, Seq("w3"), "left")
          .crossJoin(broadcast(tot3.crossJoin(totHat)))
          .withColumn("p",
            when(keptInline, pHiKept)
              .when(col("c12dot").isNotNull && pLow.isNotNull,
                gamma3 * pLow)
              .otherwise(pLow))
          .withColumn("lp", col("n") * log(col("p")))
          .groupBy("doc_id")
          .agg(sum("n").as("n_trigrams"),
            coalesce(sum(when(col("lp").isNull, col("n"))), lit(0L))
              .as("n_oov"),
            coalesce(
              round(sum("lp") /
                sum(when(col("lp").isNotNull, col("n"))), scale),
              lit(0.0)).as("avg_lp"))
          .localCheckpoint(true)
      } finally { chat.unpersist(false); () }
    } finally { c123.unpersist(false); () }
  }

  /** Per-document (w1, w2, w3, n) adjacent-trigram counts — the
    * three-token sibling of [[docBigrams]] (same bound-column
    * discipline; <3-token docs contribute nothing). */
  def docTrigrams(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val toks = col("__toks")
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__toks"))
      .filter(size(toks) >= 3)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(toks) - 3),
          i => struct(element_at(toks, i + 1).as("w1"),
                      element_at(toks, i + 2).as("w2"),
                      element_at(toks, i + 3).as("w3")))).as("g"))
      .select(col("doc_id"), col("g.w1"), col("g.w2"), col("g.w3"))
      .groupBy("doc_id", "w1", "w2", "w3").agg(count(lit(1)).as("n"))
  }

  /** Corpus-level (w1, w2, w3, n) trigram counts with no document axis
    * — the [[corpusBigrams]] shape one token wider, the partial
    * [[graft.streaming.TrigramStream]] folds. */
  def corpusTrigrams(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = col("__toks")
    docs.select(split(col(textCol), " ").as("__toks"))
      .filter(size(toks) >= 3)
      .select(explode(transform(sequence(lit(0), size(toks) - 3),
        i => struct(element_at(toks, i + 1).as("w1"),
                    element_at(toks, i + 2).as("w2"),
                    element_at(toks, i + 3).as("w3")))).as("g"))
      .select(col("g.w1"), col("g.w2"), col("g.w3"))
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("n"))
  }

  /** Average trigram log-likelihood under a TRIGRAM interpolated
    * Kneser-Ney LM — the recursion [[knLogLik]] is the base case of,
    * with the detail naive implementations get wrong: the MIDDLE order
    * is estimated from CONTINUATION counts, not raw bigram counts
    * (Chen & Goodman 1999 §3; ĉ(w2,w3) = N1+(·,w2,w3) = the number of
    * distinct histories that precede the bigram — "how novel is this
    * bigram as a continuation", not "how often did it occur"):
    *
    *   P(w3|w1w2)  = max(c(w1w2w3) − D3, 0)/c(w1w2·)
    *                 + (D3 · N1+(w1w2,·)/c(w1w2·)) · P̂(w3|w2)
    *   P̂(w3|w2)   = max(ĉ(w2,w3) − D2, 0)/ĉ(w2,·)
    *                 + (D2 · N1+(w2,·)/ĉ(w2,·)) · P_cont(w3)
    *   P_cont(w3)  = N1+(·,w3) / N1+(··)
    *
    * with every N1+ and ĉ read off the distinct-trigram type table
    * (one source for the whole model — the oracle re-derives every
    * frame from it), D3/D2 from the trigram / continuation-bigram
    * count-of-counts. Every level telescopes to Σ P = 1 over the
    * continuation vocabulary (spec-pinned at both orders).
    *
    * Back-off/OOV rule (the [[knLogLik]] discipline, one level
    * deeper): unseen (w1,w2) history falls through to P̂(w3|w2);
    * unseen w2 mid-history falls through to P_cont(w3); a w3 never
    * seen as a continuation is OOV — excluded and counted.
    * Self-scoring never hits any fall-through arm.
    *
    * Scale shape: model frames are trigram-type-table aggregations
    * (map-side combinable, at most trigram-vocabulary-sized), scoring
    * is count-frame equi-joins onto the per-doc trigram frame, the
    * two count-of-counts rows broadcast. */
  def kn3LogLik(docs: DataFrame, train: DataFrame,
                idCol: String = "doc_id", textCol: String = "text",
                scale: Int = 4): DataFrame = {
    val grams = docTrigrams(docs, idCol, textCol).persist()
    val trainGrams =
      if (train eq docs) grams else docTrigrams(train, idCol, textCol).persist()
    try kn3Score(grams,
      trainGrams.groupBy("w1", "w2", "w3").agg(sum("n").as("c123")), scale)
    finally {
      grams.unpersist(false)
      if (!(train eq docs)) trainGrams.unpersist(false): Unit
    }
  }

  /** [[kn3LogLik]] from an ALREADY-AGGREGATED (w1, w2, w3, n)
    * trigram-count frame — [[knLogLikFromCounts]] one order higher, the
    * seam the maintained store ([[graft.streaming.TrigramStream]])
    * reads through: every frame of the two-level model — the trigram
    * type table, both history totals, the continuation-bigram table,
    * both count-of-counts discounts — is a pure function of the
    * trigram-count multiset, which is ADDITIVE, so identical maintained
    * counts force bit-identical scores and the maintained path answers
    * the one-shot oracle verbatim (q204 gates it against q203's). */
  def kn3LogLikFromCounts(docs: DataFrame, counts: DataFrame,
                          idCol: String = "doc_id", textCol: String = "text",
                          scale: Int = 4): DataFrame = {
    val grams = docTrigrams(docs, idCol, textCol).persist()
    try kn3Score(grams,
      counts.groupBy("w1", "w2", "w3").agg(sum("n").as("c123")), scale)
    finally { grams.unpersist(false); () }
  }

  /** The shared trigram-KN scoring stage over a per-doc trigram frame
    * and the aggregated model counts (callers manage `grams`). */
  private def kn3Score(grams: DataFrame, c123Raw: DataFrame,
                       scale: Int): DataFrame = {
    val c123 = c123Raw.persist()
    try {
        val hist12 = c123.groupBy("w1", "w2")
          .agg(sum("c123").as("c12dot"), count(lit(1)).as("nf12"))
        // the continuation-bigram table: ĉ(w2,w3) = distinct w1 count —
        // one row per distinct (w1,w2,w3), so COUNT(*) per (w2,w3)
        val chat = c123.groupBy("w2", "w3").agg(count(lit(1)).as("chat"))
          .persist()
        try {
          val histHat = chat.groupBy("w2")
            .agg(sum("chat").as("chatdot"), count(lit(1)).as("nfhat"))
          val cont = chat.groupBy("w3").agg(count(lit(1)).as("nb"))
          val tot3 = c123.agg(
            sum(when(col("c123") === 1, 1L).otherwise(0L)).as("t_n1"),
            sum(when(col("c123") === 2, 1L).otherwise(0L)).as("t_n2"))
          val totHat = chat.agg(count(lit(1)).as("b"),
            sum(when(col("chat") === 1, 1L).otherwise(0L)).as("h_n1"),
            sum(when(col("chat") === 2, 1L).otherwise(0L)).as("h_n2"))
          // n1 = 0 ⇒ D floors at 0.5 at BOTH levels (the [[knLogLik]]
          // degenerate-discount guard)
          val d3 = when(col("t_n1") === 0, lit(0.5))
            .otherwise(col("t_n1").cast("double") /
              (col("t_n1") + lit(2) * col("t_n2")))
          val d2 = when(col("h_n1") === 0, lit(0.5))
            .otherwise(col("h_n1").cast("double") /
              (col("h_n1") + lit(2) * col("h_n2")))
          val pcont = col("nb").cast("double") / col("b")
          val pMid =
            greatest(coalesce(col("chat"), lit(0L)).cast("double") - d2,
                lit(0.0)) / col("chatdot") +
              (d2 * col("nfhat") / col("chatdot")) * pcont
          val pLow = when(col("nb").isNotNull && col("chatdot").isNotNull, pMid)
            .when(col("nb").isNotNull && col("chatdot").isNull, pcont)
          val pHi =
            greatest(coalesce(col("c123"), lit(0L)).cast("double") - d3,
                lit(0.0)) / col("c12dot") +
              (d3 * col("nf12") / col("c12dot")) * pLow
          val p = when(col("c12dot").isNotNull && pLow.isNotNull, pHi)
            .otherwise(pLow) // unseen (w1,w2): full fall-through; OOV stays null
          grams
            .join(c123, Seq("w1", "w2", "w3"), "left")
            .join(hist12, Seq("w1", "w2"), "left")
            .join(chat, Seq("w2", "w3"), "left")
            .join(histHat, Seq("w2"), "left")
            .join(cont, Seq("w3"), "left")
            .crossJoin(broadcast(tot3.crossJoin(totHat)))
            .withColumn("lp", col("n") * log(p))
            .groupBy("doc_id")
            .agg(sum("n").as("n_trigrams"),
              coalesce(sum(when(col("lp").isNull, col("n"))), lit(0L))
                .as("n_oov"),
              coalesce(
                round(sum("lp") /
                  sum(when(col("lp").isNotNull, col("n"))), scale),
                lit(0.0)).as("avg_lp"))
            .localCheckpoint(true)
        } finally { chat.unpersist(false); () }
    } finally { c123.unpersist(false); () }
  }

  /** Per-document (w1..w4, n) adjacent-4-gram counts — [[docTrigrams]]
    * one token wider (<4-token docs contribute nothing). */
  def docQuadgrams(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val toks = col("__toks")
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__toks"))
      .filter(size(toks) >= 4)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(toks) - 4),
          i => struct(element_at(toks, i + 1).as("w1"),
                      element_at(toks, i + 2).as("w2"),
                      element_at(toks, i + 3).as("w3"),
                      element_at(toks, i + 4).as("w4")))).as("g"))
      .select(col("doc_id"), col("g.w1"), col("g.w2"), col("g.w3"), col("g.w4"))
      .groupBy("doc_id", "w1", "w2", "w3", "w4").agg(count(lit(1)).as("n"))
  }

  /** Corpus-level (w1..w4, n) 4-gram counts with no document axis —
    * the additive sufficient statistic of the three-level model (the
    * [[corpusTrigrams]] shape one token wider; a maintained store at
    * this order would fold it exactly as [[graft.streaming
    * .TrigramStream]] folds trigrams — the pattern carries verbatim). */
  def corpusQuadgrams(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = col("__toks")
    docs.select(split(col(textCol), " ").as("__toks"))
      .filter(size(toks) >= 4)
      .select(explode(transform(sequence(lit(0), size(toks) - 4),
        i => struct(element_at(toks, i + 1).as("w1"),
                    element_at(toks, i + 2).as("w2"),
                    element_at(toks, i + 3).as("w3"),
                    element_at(toks, i + 4).as("w4")))).as("g"))
      .select(col("g.w1"), col("g.w2"), col("g.w3"), col("g.w4"))
      .groupBy("w1", "w2", "w3", "w4").agg(count(lit(1)).as("n"))
  }

  /** Average 4-gram log-likelihood under a 4-GRAM interpolated
    * Kneser-Ney LM — the [[kn3LogLik]] recursion instantiated one
    * order higher (Chen & Goodman 1999 §3; production KenLM defaults
    * to order 5, and this is the step that proves the engine's
    * recursion generalizes — each added order contributes one more
    * continuation-count table and one more discount, nothing else):
    *
    *   P(w4|w1w2w3) = max(c(w1..w4) − D4, 0)/c(w1w2w3·)
    *                  + (D4 · N1+(w1w2w3,·)/c(w1w2w3·)) · P̂3(w4|w2w3)
    *   P̂3(w4|w2w3) = max(ĉ3(w2w3w4) − D3, 0)/ĉ3(w2w3·)
    *                  + (D3 · N1+(w2w3,·)/ĉ3(w2w3·)) · P̂2(w4|w3)
    *   P̂2(w4|w3)   = max(ĉ2(w3w4) − D2, 0)/ĉ2(w3·)
    *                  + (D2 · N1+(w3,·)/ĉ2(w3·)) · P_cont(w4)
    *   P_cont(w4)   = N1+(·,w4) / N1+(··)
    *
    * with ĉ3(w2w3w4) = N1+(·,w2w3w4) read off the distinct-4-gram type
    * table, ĉ2(w3w4) = N1+(·,·w3w4) read off the ĉ3 TYPE table (the
    * continuation-of-continuations count — marginalizing the ĉ3 table,
    * not the raw counts, is what keeps each level a type count), and
    * D4/D3/D2 from the three tables' count-of-counts (each flooring at
    * 0.5 when its n1 = 0, the [[knLogLik]] guard). Every level
    * telescopes to Σ P = 1 over the continuation vocabulary
    * (spec-pinned).
    *
    * Back-off/OOV rule (the [[kn3LogLik]] discipline, one level
    * deeper): unseen (w1,w2,w3) falls through to P̂3; unseen (w2,w3)
    * mid-history falls through to P̂2; unseen w3 falls through to
    * P_cont; a w4 never seen as a continuation is OOV — excluded and
    * counted. Self-scoring never hits any fall-through arm.
    *
    * Scale shape: [[kn3LogLik]]'s — every model frame is an
    * aggregation of the 4-gram type table (map-side combinable, at
    * most 4-gram-vocabulary-sized), scoring is count-frame equi-joins
    * onto the per-doc 4-gram frame, the three count-of-counts rows
    * broadcast. Output: (doc_id, n_quadgrams, n_oov, avg_lp). */
  def kn4LogLik(docs: DataFrame, train: DataFrame,
                idCol: String = "doc_id", textCol: String = "text",
                scale: Int = 4): DataFrame = {
    val grams = docQuadgrams(docs, idCol, textCol).persist()
    val trainGrams =
      if (train eq docs) grams else docQuadgrams(train, idCol, textCol).persist()
    try kn4Score(grams, trainGrams.groupBy("w1", "w2", "w3", "w4")
      .agg(sum("n").as("c1234")), scale)
    finally {
      grams.unpersist(false)
      if (!(train eq docs)) trainGrams.unpersist(false): Unit
    }
  }

  /** [[kn4LogLik]] from an ALREADY-AGGREGATED (w1..w4, n) count frame —
    * the from-counts seam at order 4 (VERDICT r14 #6): the whole
    * three-level model is a pure function of the 4-gram count multiset
    * (every ĉ, every N1+, every count-of-counts derives from the type
    * table), which is ADDITIVE, so a maintained store at this order
    * reads through here exactly as [[kn3LogLikFromCounts]]'s does. */
  def kn4LogLikFromCounts(docs: DataFrame, counts: DataFrame,
                          idCol: String = "doc_id", textCol: String = "text",
                          scale: Int = 4): DataFrame = {
    val grams = docQuadgrams(docs, idCol, textCol).persist()
    try kn4Score(grams, counts.groupBy("w1", "w2", "w3", "w4")
      .agg(sum("n").as("c1234")), scale)
    finally { grams.unpersist(false); () }
  }

  /** The per-token loss of one explicit 4-gram entry (evaluated over a
    * frame carrying c1234/c123dot/nf123/c3/c3dot/nf23/c2/c2dot/nf3/nb/
    * b/n4tok) — ONE definition shared by the scoring prune and the
    * public entries table, the [[kn3Loss]] discipline one order up. */
  private def kn4Loss(d4: Column, d3: Column, d2: Column): Column = {
    val pcont = col("nb").cast("double") / col("b")
    val pL2Seen = (col("c2").cast("double") - d2) / col("c2dot") +
      (d2 * col("nf3") / col("c2dot")) * pcont
    val pL3Seen = (col("c3").cast("double") - d3) / col("c3dot") +
      (d3 * col("nf23") / col("c3dot")) * pL2Seen
    val bow4 = d4 * col("nf123") / col("c123dot")
    val pHiSeen = (col("c1234").cast("double") - d4) / col("c123dot") +
      bow4 * pL3Seen
    round((col("c1234").cast("double") / col("n4tok")) *
      (log(pHiSeen) - log(bow4 * pL3Seen)), 9)
  }

  /** The explicit-entry loss table of the pruned 4-GRAM model —
    * [[kn3PruneEntries]] one order up: (w1..w4, c1234, loss, kept) per
    * 4-gram type of the [[kn4LogLik]] model over `train`. */
  def kn4PruneEntries(train: DataFrame, eps: Double,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val c1234 = docQuadgrams(train, idCol, textCol)
      .groupBy("w1", "w2", "w3", "w4").agg(sum("n").as("c1234")).persist()
    try {
      val h123 = c1234.groupBy("w1", "w2", "w3")
        .agg(sum("c1234").as("c123dot"), count(lit(1)).as("nf123"))
      val c3 = c1234.groupBy("w2", "w3", "w4").agg(count(lit(1)).as("c3"))
      val h23 = c3.groupBy("w2", "w3")
        .agg(sum("c3").as("c3dot"), count(lit(1)).as("nf23"))
      val c2 = c3.groupBy("w3", "w4").agg(count(lit(1)).as("c2"))
      val h3 = c2.groupBy("w3")
        .agg(sum("c2").as("c2dot"), count(lit(1)).as("nf3"))
      val cont = c2.groupBy("w4").agg(count(lit(1)).as("nb"))
      val tot4 = c1234.agg(
        sum(when(col("c1234") === 1, 1L).otherwise(0L)).as("q_n1"),
        sum(when(col("c1234") === 2, 1L).otherwise(0L)).as("q_n2"),
        sum(col("c1234")).as("n4tok"))
      val totC3 = c3.agg(
        sum(when(col("c3") === 1, 1L).otherwise(0L)).as("r_n1"),
        sum(when(col("c3") === 2, 1L).otherwise(0L)).as("r_n2"))
      val totC2 = c2.agg(count(lit(1)).as("b"),
        sum(when(col("c2") === 1, 1L).otherwise(0L)).as("s_n1"),
        sum(when(col("c2") === 2, 1L).otherwise(0L)).as("s_n2"))
      val d4 = when(col("q_n1") === 0, lit(0.5))
        .otherwise(col("q_n1").cast("double") /
          (col("q_n1") + lit(2) * col("q_n2")))
      val d3 = when(col("r_n1") === 0, lit(0.5))
        .otherwise(col("r_n1").cast("double") /
          (col("r_n1") + lit(2) * col("r_n2")))
      val d2 = when(col("s_n1") === 0, lit(0.5))
        .otherwise(col("s_n1").cast("double") /
          (col("s_n1") + lit(2) * col("s_n2")))
      c1234.join(h123, Seq("w1", "w2", "w3")).join(c3, Seq("w2", "w3", "w4"))
        .join(h23, Seq("w2", "w3")).join(c2, Seq("w3", "w4"))
        .join(h3, Seq("w3")).join(cont, Seq("w4"))
        .crossJoin(broadcast(tot4.crossJoin(totC3).crossJoin(totC2)))
        .withColumn("loss", kn4Loss(d4, d3, d2))
        .select(col("w1"), col("w2"), col("w3"), col("w4"), col("c1234"),
          col("loss"), (col("loss") >= eps).as("kept"))
        .localCheckpoint(true)
    } finally { c1234.unpersist(false); () }
  }

  /** Per-document scoring under the entropy-pruned 4-GRAM
    * interpolated-KN model — [[kn3PrunedLogLik]]'s criterion one order
    * up (Stolcke 1998 at the top of the three-level recursion). The γ
    * telescope stays integer-derivable because the (w1,w2,w3) history
    * fixes BOTH lower histories (w2,w3) and w3: every kept
    * continuation's P̂3 shares the (ĉ3(w2w3·), N1+(w2w3,·))
    * denominators and its P̂2 the (ĉ2(w3·), N1+(w3,·)) ones, so
    *
    *   Σ_kept P̂2 = (Σĉ2 − k·D2)/ĉ2(w3·) + (D2·N1+(w3,·)/ĉ2(w3·))·(Σnb/b)
    *   Σ_kept P̂3 = (Σĉ3 − k·D3)/ĉ3(w2w3·)
    *                + (D3·N1+(w2w3,·)/ĉ3(w2w3·))·Σ_kept P̂2
    *
    * — per-history integer aggregates (k, Σc1234, Σĉ3, Σĉ2, Σnb) all
    * the way down; no floating-point accumulation order exists
    * anywhere. Scoring: kept entry → pHi; pruned or unseen w4 under a
    * seen (w1,w2,w3) → γ4·P̂3 (with P̂3's own fall-throughs intact);
    * unseen (w1,w2,w3) → P̂3 directly; deeper fall-throughs and OOV as
    * [[kn4LogLik]]. Self-scoring exercises the γ4 arm on every pruned
    * entry. Output: (doc_id, n_quadgrams, n_oov, avg_lp). */
  def kn4PrunedLogLik(docs: DataFrame, train: DataFrame, eps: Double,
                      idCol: String = "doc_id", textCol: String = "text",
                      scale: Int = 4): DataFrame = {
    val grams = docQuadgrams(docs, idCol, textCol).persist()
    val trainGrams =
      if (train eq docs) grams else docQuadgrams(train, idCol, textCol).persist()
    try kn4PrunedScore(grams, trainGrams.groupBy("w1", "w2", "w3", "w4")
      .agg(sum("n").as("c1234")), eps, scale)
    finally {
      grams.unpersist(false)
      if (!(train eq docs)) trainGrams.unpersist(false): Unit
    }
  }

  /** [[kn4PrunedLogLik]] from an aggregated (w1..w4, n) frame — the
    * maintained-store seam (q217 gates the store-derived pruned 4-gram
    * model against q216's one-shot oracle verbatim). */
  def kn4PrunedLogLikFromCounts(docs: DataFrame, counts: DataFrame,
                                eps: Double, idCol: String = "doc_id",
                                textCol: String = "text",
                                scale: Int = 4): DataFrame = {
    val grams = docQuadgrams(docs, idCol, textCol).persist()
    try kn4PrunedScore(grams, counts.groupBy("w1", "w2", "w3", "w4")
      .agg(sum("n").as("c1234")), eps, scale)
    finally { grams.unpersist(false); () }
  }

  /** The shared pruned 4-gram-KN scoring stage. */
  private def kn4PrunedScore(grams: DataFrame, c1234Raw: DataFrame,
                             eps: Double, scale: Int): DataFrame = {
    val c1234 = c1234Raw.persist()
    try {
      val h123 = c1234.groupBy("w1", "w2", "w3")
        .agg(sum("c1234").as("c123dot"), count(lit(1)).as("nf123"))
      val c3 = c1234.groupBy("w2", "w3", "w4").agg(count(lit(1)).as("c3"))
        .persist()
      try {
        val h23 = c3.groupBy("w2", "w3")
          .agg(sum("c3").as("c3dot"), count(lit(1)).as("nf23"))
        val c2 = c3.groupBy("w3", "w4").agg(count(lit(1)).as("c2"))
          .persist()
        try {
          val h3 = c2.groupBy("w3")
            .agg(sum("c2").as("c2dot"), count(lit(1)).as("nf3"))
          val cont = c2.groupBy("w4").agg(count(lit(1)).as("nb"))
          val tot4 = c1234.agg(
            sum(when(col("c1234") === 1, 1L).otherwise(0L)).as("q_n1"),
            sum(when(col("c1234") === 2, 1L).otherwise(0L)).as("q_n2"),
            sum(col("c1234")).as("n4tok"))
          val totC3 = c3.agg(
            sum(when(col("c3") === 1, 1L).otherwise(0L)).as("r_n1"),
            sum(when(col("c3") === 2, 1L).otherwise(0L)).as("r_n2"))
          val totC2 = c2.agg(count(lit(1)).as("b"),
            sum(when(col("c2") === 1, 1L).otherwise(0L)).as("s_n1"),
            sum(when(col("c2") === 2, 1L).otherwise(0L)).as("s_n2"))
          val d4 = when(col("q_n1") === 0, lit(0.5))
            .otherwise(col("q_n1").cast("double") /
              (col("q_n1") + lit(2) * col("q_n2")))
          val d3 = when(col("r_n1") === 0, lit(0.5))
            .otherwise(col("r_n1").cast("double") /
              (col("r_n1") + lit(2) * col("r_n2")))
          val d2 = when(col("s_n1") === 0, lit(0.5))
            .otherwise(col("s_n1").cast("double") /
              (col("s_n1") + lit(2) * col("s_n2")))
          val pcont = col("nb").cast("double") / col("b")
          // the kept set via the ONE shared kn4Loss definition. LAZY
          // since r16 — its only consumer is the model-sized γ4
          // aggregate below; the scoring join re-evaluates the kept
          // decision INLINE, so the old kept persist and the grams⋈kept
          // join both drop out.
          val kept = c1234.join(h123, Seq("w1", "w2", "w3"))
            .join(c3, Seq("w2", "w3", "w4"))
            .join(h23, Seq("w2", "w3")).join(c2, Seq("w3", "w4"))
            .join(h3, Seq("w3")).join(cont, Seq("w4"))
            .crossJoin(broadcast(tot4.crossJoin(totC3).crossJoin(totC2)))
            .withColumn("loss", kn4Loss(d4, d3, d2))
            .filter(col("loss") >= eps)
          val gam = kept.groupBy("w1", "w2", "w3")
            .agg(count(lit(1)).as("k"), sum("c1234").as("s1234"),
              sum("c3").as("s3"), sum("c2").as("s2"),
              sum("nb").as("snb"))
          // γ4 rides on the (w1,w2,w3) history frame (same key): one
          // history join in the scoring chain instead of two (guide §2.4)
          val h123g = h123.join(gam, Seq("w1", "w2", "w3"), "left")
          // scoring arms — the kn4Score expressions plus γ4
          val pL2 =
            greatest(coalesce(col("c2"), lit(0L)).cast("double") - d2,
                lit(0.0)) / col("c2dot") +
              (d2 * col("nf3") / col("c2dot")) * pcont
          val pLow2 = when(col("nb").isNotNull && col("c2dot").isNotNull, pL2)
            .when(col("nb").isNotNull && col("c2dot").isNull, pcont)
          val pL3 =
            greatest(coalesce(col("c3"), lit(0L)).cast("double") - d3,
                lit(0.0)) / col("c3dot") +
              (d3 * col("nf23") / col("c3dot")) * pLow2
          val pLow3 = when(col("c3dot").isNotNull && pLow2.isNotNull, pL3)
            .otherwise(pLow2)
          val sumPL2Kept =
            (col("s2").cast("double") - col("k") * d2) / col("c2dot") +
              (d2 * col("nf3") / col("c2dot")) *
                (col("snb").cast("double") / col("b"))
          val sumPL3Kept =
            (col("s3").cast("double") - col("k") * d3) / col("c3dot") +
              (d3 * col("nf23") / col("c3dot")) * sumPL2Kept
          val sumPHiKept =
            (col("s1234").cast("double") - col("k") * d4) / col("c123dot") +
              (d4 * col("nf123") / col("c123dot")) * sumPL3Kept
          val den4 = lit(1.0) - sumPL3Kept
          val gamma4 = when(col("k").isNull, lit(1.0))
            .when(den4 <= 0.0, lit(1.0))
            .otherwise((lit(1.0) - sumPHiKept) / den4)
          val pHiKept =
            (col("c1234").cast("double") - d4) / col("c123dot") +
              (d4 * col("nf123") / col("c123dot")) * pLow3
          // the kept decision, inline: the SAME kn4Loss expression over
          // the same joined integer columns ⇒ bit-identical loss, same
          // decision; a gram with no explicit c1234 entry nulls the
          // comparison and skips the arm — the old missed-join behavior
          val keptInline = kn4Loss(d4, d3, d2) >= eps
          grams
            .join(c1234, Seq("w1", "w2", "w3", "w4"), "left")
            .join(h123g, Seq("w1", "w2", "w3"), "left")
            .join(c3, Seq("w2", "w3", "w4"), "left")
            .join(h23, Seq("w2", "w3"), "left")
            .join(c2, Seq("w3", "w4"), "left")
            .join(h3, Seq("w3"), "left")
            .join(cont, Seq("w4"), "left")
            .crossJoin(broadcast(tot4.crossJoin(totC3).crossJoin(totC2)))
            .withColumn("p",
              when(keptInline, pHiKept)
                .when(col("c123dot").isNotNull && pLow3.isNotNull,
                  gamma4 * pLow3)
                .otherwise(pLow3))
            .withColumn("lp", col("n") * log(col("p")))
            .groupBy("doc_id")
            .agg(sum("n").as("n_quadgrams"),
              coalesce(sum(when(col("lp").isNull, col("n"))), lit(0L))
                .as("n_oov"),
              coalesce(
                round(sum("lp") /
                  sum(when(col("lp").isNotNull, col("n"))), scale),
                lit(0.0)).as("avg_lp"))
            .localCheckpoint(true)
        } finally { c2.unpersist(false); () }
      } finally { c3.unpersist(false); () }
    } finally { c1234.unpersist(false); () }
  }

  /** The entropy-pruned 4-GRAM KN model as seven BOUNDED frames — the
    * serving artifact at q216's order ([[graft.ext.KnModel]] writes and
    * loads them; the columnar equivalent of a pruned 4-gram ARPA
    * file's sections):
    *
    *  - entries    (w1..w4, p): kept explicit probabilities;
    *  - backoff123 (w1,w2,w3, gamma): renormalized γ4 per seen trigram
    *    history (1.0 where nothing was kept);
    *  - mid3       (w2,w3,w4, p): the level-3 continuation model
    *    P̂3(w4|w2w3) per seen ĉ3 row;
    *  - backoff23  (w2,w3, bow): its back-off weight D3·N1+(w2w3,·)/ĉ3(w2w3·);
    *  - mid2       (w3,w4, p): the level-2 model P̂2(w4|w3) per seen ĉ2 row;
    *  - backoff2   (w3, bow): its back-off weight D2·N1+(w3,·)/ĉ2(w3·);
    *  - cont       (w4, pcont): the continuation distribution.
    *
    * The q210 fidelity contract carries: every stored double is the
    * in-memory scorer's value, every unseen arm reduces bit-exactly to
    * bow·lower (+0.0 + x = x), so [[kn4ScoreFromModel]] equals
    * [[kn4PrunedLogLik]] EXACTLY — q218 drives export → load → score
    * against q216's raw-text oracle. All frames are at most
    * 4-gram-vocabulary-sized. */
  def kn4PrunedModelFrames(counts: DataFrame, eps: Double)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame,
         DataFrame, DataFrame) =
    withKn4PrunedModelFrames(counts, eps)((e, b123, m3, b23, m2, b2, c) =>
      (e.localCheckpoint(true), b123.localCheckpoint(true),
        m3.localCheckpoint(true), b23.localCheckpoint(true),
        m2.localCheckpoint(true), b2.localCheckpoint(true),
        c.localCheckpoint(true)))

  /** [[withKnPrunedModelFrames]] at order 4: lazy frames handed to `use`
    * inside the cache scope — the export path's no-double-materialization
    * seam (r16). */
  private[graft] def withKn4PrunedModelFrames[T](counts: DataFrame, eps: Double)(
      use: (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame,
            DataFrame, DataFrame) => T): T = {
    val c1234 = counts.groupBy("w1", "w2", "w3", "w4")
      .agg(sum("n").as("c1234")).persist()
    try {
      val h123 = c1234.groupBy("w1", "w2", "w3")
        .agg(sum("c1234").as("c123dot"), count(lit(1)).as("nf123"))
      val c3 = c1234.groupBy("w2", "w3", "w4").agg(count(lit(1)).as("c3"))
        .persist()
      try {
        val h23 = c3.groupBy("w2", "w3")
          .agg(sum("c3").as("c3dot"), count(lit(1)).as("nf23"))
        val c2 = c3.groupBy("w3", "w4").agg(count(lit(1)).as("c2"))
          .persist()
        try {
          val h3 = c2.groupBy("w3")
            .agg(sum("c2").as("c2dot"), count(lit(1)).as("nf3"))
          val cont = c2.groupBy("w4").agg(count(lit(1)).as("nb"))
          val tot4 = c1234.agg(
            sum(when(col("c1234") === 1, 1L).otherwise(0L)).as("q_n1"),
            sum(when(col("c1234") === 2, 1L).otherwise(0L)).as("q_n2"),
            sum(col("c1234")).as("n4tok"))
          val totC3 = c3.agg(
            sum(when(col("c3") === 1, 1L).otherwise(0L)).as("r_n1"),
            sum(when(col("c3") === 2, 1L).otherwise(0L)).as("r_n2"))
          val totC2 = c2.agg(count(lit(1)).as("b"),
            sum(when(col("c2") === 1, 1L).otherwise(0L)).as("s_n1"),
            sum(when(col("c2") === 2, 1L).otherwise(0L)).as("s_n2"))
          val d4 = when(col("q_n1") === 0, lit(0.5))
            .otherwise(col("q_n1").cast("double") /
              (col("q_n1") + lit(2) * col("q_n2")))
          val d3 = when(col("r_n1") === 0, lit(0.5))
            .otherwise(col("r_n1").cast("double") /
              (col("r_n1") + lit(2) * col("r_n2")))
          val d2 = when(col("s_n1") === 0, lit(0.5))
            .otherwise(col("s_n1").cast("double") /
              (col("s_n1") + lit(2) * col("s_n2")))
          val pcont = col("nb").cast("double") / col("b")
          // the scorer's exact expression shapes (greatest/coalesce
          // kept even where the joined rows make them identities)
          val pL2 =
            greatest(coalesce(col("c2"), lit(0L)).cast("double") - d2,
                lit(0.0)) / col("c2dot") +
              (d2 * col("nf3") / col("c2dot")) * pcont
          val pL3 =
            greatest(coalesce(col("c3"), lit(0L)).cast("double") - d3,
                lit(0.0)) / col("c3dot") +
              (d3 * col("nf23") / col("c3dot")) * pL2
          val kept = c1234.join(h123, Seq("w1", "w2", "w3"))
            .join(c3, Seq("w2", "w3", "w4"))
            .join(h23, Seq("w2", "w3")).join(c2, Seq("w3", "w4"))
            .join(h3, Seq("w3")).join(cont, Seq("w4"))
            .crossJoin(broadcast(tot4.crossJoin(totC3).crossJoin(totC2)))
            .withColumn("loss", kn4Loss(d4, d3, d2))
            .filter(col("loss") >= eps)
            .persist()
          try {
            val pHiKept =
              (col("c1234").cast("double") - d4) / col("c123dot") +
                (d4 * col("nf123") / col("c123dot")) * pL3
            val entries = kept.select(col("w1"), col("w2"), col("w3"),
              col("w4"), pHiKept.as("p"))
            val gam = kept.groupBy("w1", "w2", "w3")
              .agg(count(lit(1)).as("k"), sum("c1234").as("s1234"),
                sum("c3").as("s3"), sum("c2").as("s2"),
                sum("nb").as("snb"))
            val sumPL2Kept =
              (col("s2").cast("double") - col("k") * d2) / col("c2dot") +
                (d2 * col("nf3") / col("c2dot")) *
                  (col("snb").cast("double") / col("b"))
            val sumPL3Kept =
              (col("s3").cast("double") - col("k") * d3) / col("c3dot") +
                (d3 * col("nf23") / col("c3dot")) * sumPL2Kept
            val sumPHiKept =
              (col("s1234").cast("double") - col("k") * d4) / col("c123dot") +
                (d4 * col("nf123") / col("c123dot")) * sumPL3Kept
            val den4 = lit(1.0) - sumPL3Kept
            val gamma4 = when(col("k").isNull, lit(1.0))
              .when(den4 <= 0.0, lit(1.0))
              .otherwise((lit(1.0) - sumPHiKept) / den4)
            // γ's sums reference the lower histories' denominators —
            // every (w1,w2,w3) history reaches h23/h3 (its own (w2,w3)
            // and w3 are seen by construction)
            val backoff123 = h123
              .join(gam, Seq("w1", "w2", "w3"), "left")
              .join(h23, Seq("w2", "w3")).join(h3, Seq("w3"))
              .crossJoin(broadcast(tot4.crossJoin(totC3).crossJoin(totC2)))
              .select(col("w1"), col("w2"), col("w3"), gamma4.as("gamma"))
            val mid3 = c3.join(h23, Seq("w2", "w3")).join(c2, Seq("w3", "w4"))
              .join(h3, Seq("w3")).join(cont, Seq("w4"))
              .crossJoin(broadcast(totC3)).crossJoin(broadcast(totC2))
              .select(col("w2"), col("w3"), col("w4"), pL3.as("p"))
            val backoff23 = h23.crossJoin(broadcast(totC3))
              .select(col("w2"), col("w3"),
                (d3 * col("nf23") / col("c3dot")).as("bow"))
            val mid2 = c2.join(h3, Seq("w3")).join(cont, Seq("w4"))
              .crossJoin(broadcast(totC2))
              .select(col("w3"), col("w4"), pL2.as("p"))
            val backoff2 = h3.crossJoin(broadcast(totC2))
              .select(col("w3"),
                (d2 * col("nf3") / col("c2dot")).as("bow"))
            val contP = cont.crossJoin(broadcast(totC2))
              .select(col("w4"), pcont.as("pcont"))
            use(entries, backoff123, mid3, backoff23, mid2, backoff2, contP)
          } finally { kept.unpersist(false); () }
        } finally { c2.unpersist(false); () }
      } finally { c3.unpersist(false); () }
    } finally { c1234.unpersist(false); () }
  }

  /** Score documents against a LOADED pruned 4-GRAM model artifact —
    * seven equi-joins against the bounded frames, bit-identical to
    * [[kn4PrunedLogLik]] (the [[kn4PrunedModelFrames]] fidelity
    * contract). Arms: kept entry → p; γ stored for the (w1,w2,w3)
    * history → γ·pLow3, else pLow3; pLow3 = stored mid3 p if (w2,w3,w4)
    * stored, else bow23·pLow2 if (w2,w3) stored, else pLow2; pLow2 =
    * stored mid2 p if (w3,w4) stored, else bow2·pcont if w3 stored,
    * else pcont if w4 stored, else OOV. */
  def kn4ScoreFromModel(docs: DataFrame, entries: DataFrame,
                        backoff123: DataFrame, mid3: DataFrame,
                        backoff23: DataFrame, mid2: DataFrame,
                        backoff2: DataFrame, contP: DataFrame,
                        idCol: String = "doc_id", textCol: String = "text",
                        scale: Int = 4): DataFrame = {
    val grams = docQuadgrams(docs, idCol, textCol).persist()
    try {
      val plow2 = when(col("__m2").isNotNull, col("__m2"))
        .when(col("__b2").isNotNull && col("pcont").isNotNull,
          col("__b2") * col("pcont"))
        .when(col("__b2").isNull && col("pcont").isNotNull, col("pcont"))
      val plow3 = when(col("__m3").isNotNull, col("__m3"))
        .when(col("__b23").isNotNull && plow2.isNotNull,
          col("__b23") * plow2)
        .otherwise(plow2)
      grams
        .join(entries.select(col("w1"), col("w2"), col("w3"), col("w4"),
          col("p").as("__pe")), Seq("w1", "w2", "w3", "w4"), "left")
        .join(backoff123.select(col("w1"), col("w2"), col("w3"),
          col("gamma")), Seq("w1", "w2", "w3"), "left")
        .join(mid3.select(col("w2"), col("w3"), col("w4"),
          col("p").as("__m3")), Seq("w2", "w3", "w4"), "left")
        .join(backoff23.select(col("w2"), col("w3"),
          col("bow").as("__b23")), Seq("w2", "w3"), "left")
        .join(mid2.select(col("w3"), col("w4"), col("p").as("__m2")),
          Seq("w3", "w4"), "left")
        .join(backoff2.select(col("w3"), col("bow").as("__b2")),
          Seq("w3"), "left")
        .join(contP, Seq("w4"), "left")
        .withColumn("__plow3", plow3)
        .withColumn("__p",
          when(col("__pe").isNotNull, col("__pe"))
            .when(col("gamma").isNotNull && col("__plow3").isNotNull,
              col("gamma") * col("__plow3"))
            .otherwise(col("__plow3")))
        .withColumn("lp", col("n") * log(col("__p")))
        .groupBy("doc_id")
        .agg(sum("n").as("n_quadgrams"),
          coalesce(sum(when(col("lp").isNull, col("n"))), lit(0L))
            .as("n_oov"),
          coalesce(
            round(sum("lp") /
              sum(when(col("lp").isNotNull, col("n"))), scale),
            lit(0.0)).as("avg_lp"))
        .localCheckpoint(true)
    } finally { grams.unpersist(false); () }
  }

  /** The shared 4-gram-KN scoring stage (callers manage `grams`). */
  private def kn4Score(grams: DataFrame, c1234Raw: DataFrame,
                       scale: Int): DataFrame = {
    val c1234 = c1234Raw.persist()
    try {
      val h123 = c1234.groupBy("w1", "w2", "w3")
        .agg(sum("c1234").as("c123dot"), count(lit(1)).as("nf123"))
      // level-3 continuation table: ĉ3(w2,w3,w4) = distinct-w1 count =
      // COUNT(*) per (w2,w3,w4) over the 4-gram TYPE table
      val c3 = c1234.groupBy("w2", "w3", "w4").agg(count(lit(1)).as("c3"))
        .persist()
      try {
        val h23 = c3.groupBy("w2", "w3")
          .agg(sum("c3").as("c3dot"), count(lit(1)).as("nf23"))
        // level-2: ĉ2(w3,w4) = distinct-w2 count over the ĉ3 TYPE table
        val c2 = c3.groupBy("w3", "w4").agg(count(lit(1)).as("c2"))
          .persist()
        try {
          val h3 = c2.groupBy("w3")
            .agg(sum("c2").as("c2dot"), count(lit(1)).as("nf3"))
          val cont = c2.groupBy("w4").agg(count(lit(1)).as("nb"))
          val tot4 = c1234.agg(
            sum(when(col("c1234") === 1, 1L).otherwise(0L)).as("q_n1"),
            sum(when(col("c1234") === 2, 1L).otherwise(0L)).as("q_n2"))
          val totC3 = c3.agg(
            sum(when(col("c3") === 1, 1L).otherwise(0L)).as("r_n1"),
            sum(when(col("c3") === 2, 1L).otherwise(0L)).as("r_n2"))
          val totC2 = c2.agg(count(lit(1)).as("b"),
            sum(when(col("c2") === 1, 1L).otherwise(0L)).as("s_n1"),
            sum(when(col("c2") === 2, 1L).otherwise(0L)).as("s_n2"))
          // n1 = 0 ⇒ D floors at 0.5 at ALL THREE levels (the
          // [[knLogLik]] degenerate-discount guard)
          val d4 = when(col("q_n1") === 0, lit(0.5))
            .otherwise(col("q_n1").cast("double") /
              (col("q_n1") + lit(2) * col("q_n2")))
          val d3 = when(col("r_n1") === 0, lit(0.5))
            .otherwise(col("r_n1").cast("double") /
              (col("r_n1") + lit(2) * col("r_n2")))
          val d2 = when(col("s_n1") === 0, lit(0.5))
            .otherwise(col("s_n1").cast("double") /
              (col("s_n1") + lit(2) * col("s_n2")))
          val pcont = col("nb").cast("double") / col("b")
          val pL2 =
            greatest(coalesce(col("c2"), lit(0L)).cast("double") - d2,
                lit(0.0)) / col("c2dot") +
              (d2 * col("nf3") / col("c2dot")) * pcont
          val pLow2 = when(col("nb").isNotNull && col("c2dot").isNotNull, pL2)
            .when(col("nb").isNotNull && col("c2dot").isNull, pcont)
          val pL3 =
            greatest(coalesce(col("c3"), lit(0L)).cast("double") - d3,
                lit(0.0)) / col("c3dot") +
              (d3 * col("nf23") / col("c3dot")) * pLow2
          val pLow3 = when(col("c3dot").isNotNull && pLow2.isNotNull, pL3)
            .otherwise(pLow2)
          val pHi =
            greatest(coalesce(col("c1234"), lit(0L)).cast("double") - d4,
                lit(0.0)) / col("c123dot") +
              (d4 * col("nf123") / col("c123dot")) * pLow3
          val p = when(col("c123dot").isNotNull && pLow3.isNotNull, pHi)
            .otherwise(pLow3) // unseen (w1,w2,w3): full fall-through; OOV stays null
          grams
            .join(c1234, Seq("w1", "w2", "w3", "w4"), "left")
            .join(h123, Seq("w1", "w2", "w3"), "left")
            .join(c3, Seq("w2", "w3", "w4"), "left")
            .join(h23, Seq("w2", "w3"), "left")
            .join(c2, Seq("w3", "w4"), "left")
            .join(h3, Seq("w3"), "left")
            .join(cont, Seq("w4"), "left")
            .crossJoin(broadcast(tot4.crossJoin(totC3).crossJoin(totC2)))
            .withColumn("lp", col("n") * log(p))
            .groupBy("doc_id")
            .agg(sum("n").as("n_quadgrams"),
              coalesce(sum(when(col("lp").isNull, col("n"))), lit(0L))
                .as("n_oov"),
              coalesce(
                round(sum("lp") /
                  sum(when(col("lp").isNotNull, col("n"))), scale),
                lit(0.0)).as("avg_lp"))
            .localCheckpoint(true)
        } finally { c2.unpersist(false); () }
      } finally { c3.unpersist(false); () }
    } finally { c1234.unpersist(false); () }
  }

  /** CCNet-style perplexity filter: score every document with
    * [[bigramLogLik]] against the corpus-trained LM and flag the ones
    * at or above the `keepQuantile` exact percentile of avg_lp (higher
    * log-likelihood = more fluent under the model). The threshold is
    * one exact interpolated percentile over the O(docs) scored frame,
    * broadcast back — identical to q61's quantile-gate contract. */
  def perplexityFilter(docs: DataFrame, keepQuantile: Double,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val scored = bigramLogLik(docs, docs, idCol, textCol)
    val thr = scored.agg(
      expr(s"percentile(avg_lp, ${keepQuantile})").as("thr"))
    scored.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("n_bigrams"), col("avg_lp"),
        (col("avg_lp") >= col("thr")).as("kept"))
  }

  /** DSIR importance weight per raw document:
    *
    *   w(d) = Σ_tok n_tok(d) · ln(p_target(tok) / p_raw(tok))
    *
    * with both unigram LMs Laplace-smoothed over the UNION vocabulary,
    * p(tok) = (c(tok) + 1) / (total + V). `target` is the
    * distribution to steer toward (e.g. one language or source slice);
    * weights are comparable across documents of similar length (the
    * paper resamples proportionally to exp(w); the deterministic
    * engine surface exposes the ranked weights and leaves the
    * categorical draw to the caller's sampler, [[Sharding]]-style).
    *
    * Output: (doc_id, n_tokens, log_w) rounded to `scale`. */
  def dsirWeights(raw: DataFrame, target: DataFrame,
                  idCol: String = "doc_id", textCol: String = "text",
                  scale: Int = 4): DataFrame = {
    def unigrams(d: DataFrame) =
      d.select(col(idCol).as("doc_id"),
          explode(split(col(textCol), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("n"))
    // rawU (token explode + shuffle) feeds both the raw model counts and
    // the scoring join; model feeds both totals and the join. Persist
    // each so every explode/shuffle runs once (same reasoning as
    // [[bigramLogLik]]).
    val rawU = unigrams(raw).persist()
    var model: DataFrame = null
    try {
    val cRaw = rawU.groupBy("w").agg(sum("n").as("c_raw"))
    val cTgt = unigrams(target).groupBy("w").agg(sum("n").as("c_tgt"))
    // union vocabulary + totals: one tiny frame each, broadcast
    model = cRaw.join(cTgt, Seq("w"), "full_outer")
      .select(col("w"), coalesce(col("c_raw"), lit(0L)).as("c_raw"),
        coalesce(col("c_tgt"), lit(0L)).as("c_tgt"))
      .persist()
    val totals = model.agg(sum("c_raw").as("t_raw"), sum("c_tgt").as("t_tgt"),
      count(lit(1)).as("v"))
    rawU
      .join(model, Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("lr",
        log((coalesce(col("c_tgt"), lit(0L)) + lit(1.0)) / (col("t_tgt") + col("v"))) -
        log((coalesce(col("c_raw"), lit(0L)) + lit(1.0)) / (col("t_raw") + col("v"))))
      .groupBy("doc_id")
      .agg(sum("n").as("n_tokens"), round(sum(col("n") * col("lr")), scale).as("log_w"))
      .localCheckpoint(true)
    } finally {
      // unpersist even when the compute throws (see [[bigramLogLik]])
      rawU.unpersist(false)
      if (model != null) model.unpersist(false): Unit
    }
  }
}

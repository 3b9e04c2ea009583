package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-corpus analysis for training-data pipelines: token accounting,
  * quality scoring, language identification, document fingerprinting.
  * Everything is built-in-function composition (whole-stage codegen'd);
  * the only custom kernel is simhash (see Dedup).
  */
object TextAnalysis {

  // ---------------------------------------------------------------- tokens

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, "\\s+")).cast("long")

  /** BPE-ish subword-ish count: letter runs, digit runs, and single
    * punctuation marks each count as one token (a cheap, deterministic
    * stand-in for a real BPE vocab). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("""\p{L}+|\p{N}+|[^\p{L}\p{N}\s]"""), lit(0))).cast("long")

  // ---------------------------------------------------------------- quality

  /** Component quality signals + a composite score in [0, 1].
    * Fixed expression tree per row ⇒ bit-deterministic. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = split(text, " ")
    val nToks = size(toks).cast("long")
    val nChars = length(text).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    val punct = length(text) - length(regexp_replace(text, lit("""[.!?,;:]"""), lit("")))
    val avgTokLen = (nChars - (nToks - 1)).cast("double") / nToks
    val distinctRatio = nDistinct.cast("double") / nToks
    val punctRatio = punct.cast("double") / nChars
    // occurrence count (not set-intersect: repeated stopwords all count)
    val enStops = array(stopwords("en").map(lit): _*)
    val stopwordRatio =
      size(filter(split(lower(text), " "), t => array_contains(enStops, t)))
        .cast("double") / nToks
    val lengthScore = least(nToks.cast("double") / 64.0, lit(1.0))
    Seq(
      "n_tokens" -> nToks,
      "n_chars" -> nChars,
      "n_distinct_tokens" -> nDistinct,
      "avg_token_len" -> avgTokLen,
      "distinct_ratio" -> distinctRatio,
      "punct_ratio" -> punctRatio,
      "stopword_ratio" -> stopwordRatio,
      "quality_score" ->
        (lit(0.5) * lengthScore + lit(0.4) * distinctRatio +
          lit(0.1) * (lit(1.0) - least(punctRatio * 4.0, lit(1.0)))))
  }

  /** [[qualityColumns]] over a staged token column: the split/lower
    * subtrees materialize ONCE per row instead of once per derived
    * column (CollapseProject keeps non-cheap multi-referenced aliases in
    * their own projection, so the staging survives optimization — the
    * naive per-column fold re-tokenized the text ~10× per row and
    * dominated the corpus-curation pipeline's cost). Values are
    * bit-identical to the expression-level forms. */
  def withQuality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val enStops = array(stopwords("en").map(lit): _*)
    val staged = docs
      .withColumn("__toks", split(col(textCol), " "))
      .withColumn("__nstop",
        size(filter(split(lower(col(textCol)), " "), t => array_contains(enStops, t))))
    val toks = col("__toks")
    val nToks = size(toks).cast("long")
    val nChars = length(col(textCol)).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    val punct = length(col(textCol)) -
      length(regexp_replace(col(textCol), lit("""[.!?,;:]"""), lit("")))
    val out = staged
      .withColumn("n_tokens", nToks)
      .withColumn("n_chars", nChars)
      .withColumn("n_distinct_tokens", nDistinct)
      .withColumn("avg_token_len", (nChars - (nToks - 1)).cast("double") / nToks)
      .withColumn("distinct_ratio", nDistinct.cast("double") / nToks)
      .withColumn("punct_ratio", punct.cast("double") / nChars)
      .withColumn("stopword_ratio", col("__nstop").cast("double") / nToks)
    out
      .withColumn("quality_score",
        lit(0.5) * least(col("n_tokens").cast("double") / 64.0, lit(1.0)) +
          lit(0.4) * col("distinct_ratio") +
          lit(0.1) * (lit(1.0) - least(col("punct_ratio") * 4.0, lit(1.0))))
      .drop("__toks", "__nstop")
  }

  // ---------------------------------------------------------------- lang id

  /** Tiny per-language stopword lists (public common words). Real
    * deployments would swap in a trained n-gram profile; the *shape* —
    * score per language via array_intersect, argmax via greatest+CASE —
    * is the scalable part. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "pour"),
    "es" -> Seq("el", "los", "las", "es", "una", "para", "como", "pero"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "这"))

  /** Predicted language + per-language hit counts. Deterministic argmax
    * (ties broken by language code order). */
  def langIdColumns(text: Column): Seq[(String, Column)] = {
    val toks = split(lower(text), "\\s+")
    val langs = stopwords.keys.toSeq.sorted
    val scores = langs.map(l =>
      s"hits_$l" -> size(array_intersect(toks, array(stopwords(l).map(lit): _*))).cast("long"))
    val best = langs.foldLeft((lit("und"), lit(0L))) { case ((bl, bs), l) =>
      val s = scores.toMap.apply(s"hits_$l")
      (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    scores :+ ("lang_pred" -> when(best._2 > 0, best._1).otherwise(lit("und")))
  }

  /** [[langIdColumns]] with the token array and hit counts staged as real
    * columns: one lower+split per row, each hits_<l> intersect computed
    * once, and lang_pred reduced to a cheap CASE over the hit columns
    * (the expression-level fold embedded every intersect ~twice). */
  def withLangId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val langs = stopwords.keys.toSeq.sorted
    val staged = docs.withColumn("__lid_toks", split(lower(col(textCol)), "\\s+"))
    val withHits = langs.foldLeft(staged) { (df, l) =>
      df.withColumn(s"hits_$l",
        size(array_intersect(col("__lid_toks"), array(stopwords(l).map(lit): _*))).cast("long"))
    }
    val best = langs.foldLeft((lit("und"), lit(0L))) { case ((bl, bs), l) =>
      val s = col(s"hits_$l")
      (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    withHits
      .withColumn("lang_pred", when(best._2 > 0, best._1).otherwise(lit("und")))
      .drop("__lid_toks")
  }

  // ---------------------------------------------------------------- fingerprint

  /** Order-sensitive rolling document fingerprint: FNV-1a-style fold over
    * token hashes in a native kernel expression (wrapping 64-bit
    * arithmetic — Spark's ANSI mode would throw on the intended overflow
    * if written with built-in `aggregate`). */
  def fingerprint(text: Column): Column =
    graft.functions.VectorFunctions.token_fingerprint64(split(text, " "))

  def withFingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("fingerprint", fingerprint(col(textCol)))

  // ---------------------------------------------------------------- PII

  /** Conservative PII patterns, written to the regex subset where Java's
    * leftmost-first and RE2's leftmost-longest semantics agree (greedy
    * character classes, no alternation) — so SQL engines on either regex
    * family redact identically. */
  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PhoneRe = """\b\d{3}-\d{4}\b"""

  /** Redact emails and phone-shaped numbers; adds match counts (the
    * audit signal a scrubbing pass must emit) and the scrubbed text.
    * Pure expression tree — codegen'd, no UDF. */
  def scrubPii(docs: DataFrame, textCol: String = "text",
               replacement: String = "[REDACTED]"): DataFrame =
    docs
      .withColumn("n_emails", regexp_count(col(textCol), lit(EmailRe)).cast("long"))
      .withColumn("n_phones", regexp_count(col(textCol), lit(PhoneRe)).cast("long"))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(col(textCol), EmailRe, replacement),
          PhoneRe, replacement))

  // ---------------------------------------------------------------- chunking

  /** Token-window chunking: each document becomes fixed-size windows of
    * `chunkSize` tokens advancing by `stride` (overlap = chunkSize −
    * stride) — the long-document → model-sized-sequence step of a
    * training pipeline, with deterministic chunk ids and offsets.
    *
    * Chunk count is plain integer arithmetic (1 for docs ≤ chunkSize
    * tokens, else 1 + ⌈(n − chunkSize)/stride⌉), so any engine
    * reproduces the same chunk axis bit-for-bit. Chunking is a MAP
    * operation: one projection + explode per row, no shuffle, fully
    * inside whole-stage codegen — at 100 TB it scales with input bytes
    * and the row multiplier n/stride, nothing else. */
  def chunkByTokens(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", chunkSize: Int = 64,
                    stride: Int = 48): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val n = size(col("__toks"))
    // ⌈(n − chunkSize)/stride⌉ + 1 via floor((n − chunkSize + stride − 1)/stride):
    // values are tiny ints, exact in the double division floor() implies
    val nChunks = when(n <= chunkSize, lit(1L))
      .otherwise(floor((n - chunkSize + stride - 1) / lit(stride)).cast("long") + 1L)
    val start = col("chunk_id") * stride // 0-based token offset
    docs
      .withColumn("__toks", split(col(textCol), " "))
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1L)))
      .withColumn("start_tok", start)
      .withColumn("chunk_tokens", slice(col("__toks"), start + 1, lit(chunkSize)))
      .withColumn("chunk_len", size(col("chunk_tokens")).cast("long"))
      .withColumn("chunk_text", array_join(col("chunk_tokens"), " "))
      .drop("__toks", "chunk_tokens")
  }

  // ---------------------------------------------------------------- indexing

  /** Inverted-index posting lists: per token, its document frequency and
    * the `postingCap` smallest doc ids, for tokens in a selectivity band
    * (df ≥ minDf and df ≤ maxDfPermille‰ of the corpus — the hot-token
    * cutoff is RELATIVE, so the same query means the same thing at any
    * corpus size).
    *
    * ONE aggregation pass computes both df and the postings: the heap is
    * the bounded top-k Aggregator (score = −id ⇒ keeps smallest ids), so
    * partial buffers stay ≤ ~2·cap per token even for a stopword with a
    * billion postings — the shuffle carries O(tokens × cap) trimmed
    * heaps, never a posting list proportional to df. An unbounded
    * collect_list would OOM exactly on the hot tokens the band then
    * throws away. */
  def invertedIndex(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", minDf: Long = 2,
                    maxDfPermille: Long = 800, postingCap: Int = 20): DataFrame = {
    val dt = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .distinct()
    val byTok = dt.groupBy("token").agg(
      count(lit(1)).as("df"),
      // long-ordered heap: "postingCap smallest ids" stays exact for
      // full-range 64-bit (e.g. hash-derived) doc ids — a double score
      // of -id would lose integer ordering above 2^53
      graft.functions.TopK.min_k_ids(postingCap)(col(idCol)).as("__top"))
    val nd = broadcast(docs.select(col(idCol)).agg(count(lit(1)).as("__n_docs")))
    byTok.crossJoin(nd)
      .filter(col("df") >= minDf && col("df") * 1000 <= col("__n_docs") * maxDfPermille)
      .select(col("token"), col("df"),
        array_join(transform(col("__top"), x => x.cast("string")), ",")
          .as("postings"))
  }

  /** Within-document co-occurrence counts over a bounded vocabulary: the
    * top `vocabSize` tokens by document frequency (ties broken by token),
    * paired when they appear in the same document.
    *
    * The vocabulary is the scale contract: it BROADCASTS, the corpus is
    * filtered to vocab tokens before any pairing, and the per-document
    * pair fan-out is ≤ vocabSize²/2 regardless of document or corpus
    * size. The self-join is an equi-join on the document id (one
    * shuffle, identical subplans share the exchange); output integers
    * (pair count + each side's df) feed PMI-style ranking downstream
    * without any cross-engine float drift. */
  def cooccurrence(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", vocabSize: Int = 50,
                   minPairDocs: Long = 5): DataFrame = {
    val dt = docs
      .select(col(idCol).as("doc"), explode(split(col(textCol), " ")).as("token"))
      .distinct()
    val vocab = dt.groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token")).limit(vocabSize)
    val inVocab = dt.join(broadcast(vocab), Seq("token"))
    val pairs = inVocab.as("a")
      .join(inVocab.as("b"),
        col("a.doc") === col("b.doc") && col("a.token") < col("b.token"))
      .groupBy(col("a.token").as("t1"), col("b.token").as("t2"))
      .agg(count(lit(1)).as("pair_docs"))
      .filter(col("pair_docs") >= minPairDocs)
    pairs
      .join(broadcast(vocab.select(col("token").as("t1"), col("df").as("df1"))), Seq("t1"))
      .join(broadcast(vocab.select(col("token").as("t2"), col("df").as("df2"))), Seq("t2"))
      .select("t1", "t2", "pair_docs", "df1", "df2")
  }

  /** Adjacent-token-pair merge scores — the counting pass of one
    * BPE/WordPiece tokenizer-training iteration: for every pair of
    * ADJACENT tokens in the corpus, how often it occurs; the top pair is
    * the next merge a trainer would apply. (q82's `cooccurrence` counts
    * document-level co-presence; this is strict adjacency, the signal
    * BPE merges on.)
    *
    * Shape: the pair axis is built by zipping each token array with
    * itself shifted by one — a pure projection, no self-join — then one
    * explode + one hash aggregation with map-side partial counts, and a
    * `TakeOrderedAndProject` top-k cut (count desc, pair asc: total
    * order, deterministic at the boundary). At 100 TB this is one scan,
    * one count-shuffle keyed by pair, and a k-row result; the trainer
    * loop re-runs it per merge round on the re-tokenized corpus. */
  def adjacentPairCounts(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text", topK: Int = 200): DataFrame = {
    require(topK > 0)
    val toks = split(col(textCol), " ")
    val pairs = arrays_zip(
      slice(toks, lit(1), size(toks) - 1).as("t1"),
      slice(toks, lit(2), size(toks) - 1).as("t2"))
    docs
      .filter(size(split(col(textCol), " ")) >= 2)
      .select(explode(pairs).as("p"))
      .select(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("pair_count"))
      .orderBy(col("pair_count").desc, col("t1"), col("t2"))
      .limit(topK)
  }

  /** Token frequency-of-frequencies — the Good-Turing spectrum: N_r =
    * number of distinct types occurring exactly r times. The diagnostic
    * companion to the Zipf fit ([[zipfFit]]) and vocab growth
    * ([[vocabGrowth]]): a healthy crawl is hapax-heavy (fat N_1);
    * duplication shifts mass to high r. Two map-side-combinable hash
    * counts; the second aggregates the (type, freq) frame — bounded by
    * VOCABULARY, never corpus rows. All-integer output (freq, n_types),
    * bit-reproducible by any engine. */
  def tokenSpectrum(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("freq"))
      .groupBy("freq").agg(count(lit(1)).as("n_types"))
      .orderBy("freq")

  /** Top-k per-user event-type trigram paths in (ts, event_id) order —
    * behavioral sequence mining (the read that designs funnels, where a
    * funnel query only MEASURES a path you already chose). The lead
    * window partitions by user: per-partition work is bounded by a
    * user's own event count and user cardinality is the scale axis, so
    * no hot task; the trigram count combines map-side and the final cut
    * is the TakeOrdered heap under a total (count desc, path asc)
    * order — engine-stable top-k. */
  def eventPaths(events: DataFrame, k: Int = 20,
                 userCol: String = "user_id", typeCol: String = "event_type",
                 tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(k > 0)
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol), col(typeCol).as("e1"),
        lead(col(typeCol), 1).over(w).as("e2"),
        lead(col(typeCol), 2).over(w).as("e3"))
      .filter(col("e3").isNotNull)
      .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("e1"), col("e2"), col("e3"))
      .limit(k)
  }

  /** Iterative BPE merge training ([[adjacentPairCounts]] is ONE counting
    * pass; this runs the actual trainer loop): for `rounds` iterations,
    * count adjacent token pairs over the CURRENT corpus, adopt the most
    * frequent pair (ties → lexicographic (left, right) — engine-stable),
    * and rewrite every document merging its non-overlapping left-to-right
    * occurrences into a single token (Sennrich et al., ACL'16, at the
    * word-merge grain). Round r+1 counts the rewritten corpus, so later
    * merges can extend earlier ones ("a b" + "c" → "a b c") — the
    * property a single counting pass cannot express, and the reason the
    * rounds are SEQUENTIAL by definition (each argmax depends on the
    * previous rewrite; this is the BPE training recurrence, not an
    * artifact).
    *
    * The left-to-right non-overlap rule ("a a a" merges once, the third
    * `a` survives) is a per-document left fold (`aggregate` higher-order
    * function — codegen'd, O(tokens) per doc): carry a pending token;
    * emit the merged pair and clear it on a match, else flush it.
    *
    * Scale shape: per round ONE map-only corpus rewrite + ONE map-side-
    * combinable pair count + a 1-row TakeOrdered — the only driver
    * traffic is the single winning pair per round. The token frame is
    * re-checkpointed each round so the iterative plan never compounds
    * (the [[Dedup.distributedClusterPairs]] discipline).
    *
    * Output: (round, lhs, rhs, pair_count) — the merge table a tokenizer
    * build ships; stops early if a round has no pair left. */
  def bpeMerges(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", rounds: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, toks) = bpeTrain(docs, idCol, textCol, rounds)
    toks.unpersist(false)
    merges.toDF("round", "lhs", "rhs", "pair_count").orderBy("round")
  }

  /** Apply the trained merges — the ENCODE step a tokenizer build ships
    * next to its merge table: per document, the token count before and
    * after the `rounds` learned merges rewrite it (the compression the
    * merges actually buy on this corpus). Same recurrence as
    * [[bpeMerges]]; the final rewritten corpus is the byproduct.
    * Output: (doc_id, n_raw, n_encoded). */
  def bpeEncode(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", rounds: Int = 3): DataFrame = {
    val (_, toks) = bpeTrain(docs, idCol, textCol, rounds)
    try docs
      .select(col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("n_raw"))
      .join(toks.select(col("id").as("doc_id"),
        size(col("toks")).cast("long").as("n_encoded")), Seq("doc_id"))
      .localCheckpoint(true)
    finally toks.unpersist(false)
  }

  /** ENCODE with an ALREADY-TRAINED merge table — the production encode
    * path, completing the deep-BPE story: [[bpeMergesBatched]] makes
    * training a vocabulary-scale table reachable, and this applies one
    * at a per-document cost INDEPENDENT of its depth via the
    * rank-routing indexed kernel ([[graft.functions
    * .BpeApplyMergesIndexed]] — O(tokens·log tokens + applications) vs
    * the sequential kernel's O(merges × tokens), a 30–100× gap at
    * production 32k–100k-merge tables). Bit-identical to applying the
    * merges sequentially in training order (BpeIndexedSpec pins it at
    * several depths).
    *
    * Scale shape: ONE map-only pass — the merge table broadcasts as a
    * codegen reference object, no joins, no shuffle; output is
    * (doc_id, n_raw, n_encoded) plus the encoded token array for
    * downstream packing. */
  def bpeEncodeWithTable(docs: DataFrame, merges: Seq[(String, String)],
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val lhs = merges.map(_._1)
    val rhs = merges.map(_._2)
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__t"))
      .select(col("doc_id"), size(col("__t")).cast("long").as("n_raw"),
        graft.functions.VectorFunctions.bpe_apply_merges_indexed(
          col("__t"), lhs, rhs).as("toks_encoded"))
      .select(col("doc_id"), col("n_raw"),
        size(col("toks_encoded")).cast("long").as("n_encoded"),
        col("toks_encoded"))
  }

  /** The shared trainer loop: (merge table, FINAL rewritten token frame
    * — persisted; the caller must unpersist). */
  private def bpeTrain(docs: DataFrame, idCol: String, textCol: String,
                       rounds: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(rounds >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    var toks = docs
      .select(col(idCol).as("id"), split(col(textCol), " ").as("toks"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    try while (r <= rounds && !exhausted) {
      val pairs = arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("t1"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("t2"))
      val best = toks.filter(size(col("toks")) >= 2)
        .select(explode(pairs).as("p"))
        .groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("t1"), col("t2"))
        .limit(1)
        .as[(String, String, Long)].collect()
      best.headOption match {
        case None => exhausted = true
        case Some((a, b, c)) =>
          merges += ((r, a, b, c))
          val next = toks.withColumn("toks", mergeFold(col("toks"), a, b))
            .localCheckpoint(true)
          toks.unpersist(false)
          toks = next
          r += 1
      }
    } catch {
      case t: Throwable => toks.unpersist(false); throw t
    }
    (merges.toSeq, toks)
  }

  /** Batched-trainer provenance: the merge table plus, per recount
    * window, the spectrum slice the driver-local adoption scanned —
    * dumped by Verify so the DuckDB oracle can independently REPLAY the
    * adoption logic over the same spectra. */
  final case class BpeBatchResult(
      merges: Seq[(Int, String, String, Long)],
      windows: Seq[(Int, Seq[(String, String, Long)])],
      /** Merges adopted per recount window (same order as `windows`) —
        * the depth-efficiency signal: adoption ÷ batchCap per pass is
        * how much of each Spark job the greedy non-conflict rule kept. */
      adoptedPerWindow: Seq[Int] = Seq.empty)

  /** Depth-capable BPE trainer: the [[bpeMerges]] recurrence batched so
    * vocabulary-scale merge counts (10³–10⁵) cost O(rounds / batchCap)
    * Spark jobs instead of O(rounds) — the sequential loop's ~1.5 s of
    * fixed job overhead PER MERGE is what makes deep vocabularies
    * unreachable, not the counting or rewrite work.
    *
    * Per recount window: ONE distributed pair count collects only the
    * top `8 × batchCap` spectrum slice (a bounded driver frame, the
    * [[Dedup]] bounded-collect discipline); a DRIVER-LOCAL greedy then
    * adopts up to `batchCap` merges from that slice in (count desc,
    * lhs, rhs) order, skipping any candidate that shares a token with a
    * merge already adopted this window — those counts are stale after
    * the earlier merge rewrites (pairs ending in its lhs / starting at
    * its rhs shrink), while token-disjoint candidates keep their exact
    * counts, adjacency-by-adjacency. ONE distributed rewrite then
    * applies the whole batch in adoption order ([[graft.functions
    * .BpeApplyMerges]], a single codegen'd O(batch × tokens) kernel),
    * and the next window recounts the rewritten corpus.
    *
    * Exactness contract: `batchCap = 1` degenerates to adopt-top-pair /
    * rewrite / recount — BIT-IDENTICAL to [[bpeMerges]] (BpeBatchedSpec
    * pins it). Larger caps trade the guarantee that a pair CREATED by
    * an earlier merge in the window could have outranked a later
    * adoption (its count is bounded by the neighbor counts the earlier
    * merge consumed) for a batchCap× reduction in job rounds; the
    * schedule is fully deterministic either way, and each adopted row
    * records its window-start count.
    *
    * `pair_count` per row = the pair's count in the window-start corpus
    * (the number the adoption ranked it by). */
  def bpeMergesBatched(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", rounds: Int = 160,
                       batchCap: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (res, toks) = bpeTrainBatched(docs, idCol, textCol, rounds, batchCap)
    toks.unpersist(false)
    res.merges.toDF("round", "lhs", "rhs", "pair_count").orderBy("round")
  }

  /** The batched trainer loop — (provenance, FINAL rewritten token
    * frame, persisted; caller must unpersist). */
  def bpeTrainBatched(docs: DataFrame, idCol: String, textCol: String,
                      rounds: Int, batchCap: Int)
      : (BpeBatchResult, DataFrame) = {
    require(rounds >= 1 && batchCap >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val scanCap = 8 * batchCap
    var toks = docs
      .select(col(idCol).as("id"), split(col(textCol), " ").as("toks"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    val windows = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[(String, String, Long)])]
    val adoptedPerWindow = scala.collection.mutable.ArrayBuffer.empty[Int]
    var w = 0
    var exhausted = false
    try while (merges.size < rounds && !exhausted) {
      val pairs = arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("t1"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("t2"))
      val sliceRows = toks.filter(size(col("toks")) >= 2)
        .select(explode(pairs).as("p"))
        .groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("t1"), col("t2"))
        .limit(scanCap)
        .as[(String, String, Long)].collect().toSeq
      if (sliceRows.isEmpty) exhausted = true
      else {
        w += 1
        windows += ((w, sliceRows))
        val cap = math.min(batchCap, rounds - merges.size)
        val base = merges.size
        val adopted = greedyAdopt(sliceRows, cap)
        // the top candidate always adopts (empty dirty set) → progress
        merges ++= adopted.zipWithIndex.map { case ((a, b, c), i) =>
          (base + i + 1, a, b, c)
        }
        adoptedPerWindow += adopted.size
        val next = toks.withColumn("toks",
            graft.functions.VectorFunctions.bpe_apply_merges(col("toks"),
              adopted.map(_._1).toSeq, adopted.map(_._2).toSeq))
          .localCheckpoint(true)
        toks.unpersist(false)
        toks = next
      }
    } catch {
      case t: Throwable => toks.unpersist(false); throw t
    }
    (BpeBatchResult(merges.toSeq, windows.toSeq, adoptedPerWindow.toSeq), toks)
  }

  /** The driver-local adoption greedy shared by every batched trainer
    * window: walk the spectrum slice in its (count desc, lhs, rhs)
    * order, adopt up to `cap` candidates, skip any that shares a token
    * with a merge already adopted this window (its count is stale after
    * that merge's rewrite). The q166/q197 oracles re-derive exactly
    * this logic in SQL, so it must stay byte-for-byte deterministic. */
  private def greedyAdopt(sliceRows: Seq[(String, String, Long)],
                          cap: Int): Seq[(String, String, Long)] = {
    val dirty = scala.collection.mutable.Set.empty[String]
    val adopted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    sliceRows.foreach { case (t1, t2, c) =>
      if (adopted.size < cap && !dirty(t1) && !dirty(t2)) {
        adopted += ((t1, t2, c)); dirty += t1; dirty += t2
      }
    }
    adopted.toSeq
  }

  /** Character-grain BPE training from an aggregated (word, n) count
    * frame — the Sennrich et al. (ACL'16) / SentencePiece formulation:
    * each DISTINCT word is a character sequence weighted by its corpus
    * count, merges happen within words, and a pair's count is the SUM
    * OF WORD COUNTS over its adjacent occurrences. This is the
    * formulation a MAINTAINED tokenizer pipeline needs, because the
    * word-count multiset is an ADDITIVE sufficient statistic: the
    * streaming [[graft.streaming.VocabStream]] store folds it exactly,
    * so identical counts force the identical merge table and the
    * store-derived path answers the one-shot oracle verbatim (the
    * q194/q195 discipline; q197 gates it). The corpus-grain trainer
    * ([[bpeTrainBatched]]) CANNOT be maintained this way — cross-word
    * pair adjacency is not additive under rewrites — which is exactly
    * why the production-scale path trains from counts.
    *
    * Scale shape: the working frame is VOCABULARY-sized, not
    * corpus-sized — at 100 TB the corpus is scanned once (by the
    * store's additive folds); every trainer round is a pair count +
    * rewrite over the distinct-word frame (millions of rows, not
    * billions), re-checkpointed per window so the iterative plan never
    * compounds. Adoption batching, the scan cap, the dirty-token skip
    * and every tie-break are IDENTICAL to [[bpeTrainBatched]] (shared
    * greedy), so the window spectra replay under the same oracle CTE.
    *
    * Returns (provenance, final rewritten (n, toks) frame — persisted;
    * the caller must unpersist). Merged tokens are space-joined char
    * groups ("a b"), the repo-wide BPE token convention. */
  def bpeTrainFromCounts(counts: DataFrame, rounds: Int = 48,
                         batchCap: Int = 16)
      : (BpeBatchResult, DataFrame) = {
    require(rounds >= 1 && batchCap >= 1)
    val spark = counts.sparkSession
    import spark.implicits._
    val scanCap = 8 * batchCap
    var frame = counts
      .select(col("n").cast("long").as("n"),
        filter(split(col("word"), ""), t => t =!= "").as("toks"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    val windows = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[(String, String, Long)])]
    val adoptedPerWindow = scala.collection.mutable.ArrayBuffer.empty[Int]
    var w = 0
    var exhausted = false
    try while (merges.size < rounds && !exhausted) {
      val pairs = arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("t1"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("t2"))
      val sliceRows = frame.filter(size(col("toks")) >= 2)
        .select(explode(pairs).as("p"), col("n"))
        .groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
        .agg(sum("n").as("c"))
        .orderBy(col("c").desc, col("t1"), col("t2"))
        .limit(scanCap)
        .as[(String, String, Long)].collect().toSeq
      if (sliceRows.isEmpty) exhausted = true
      else {
        w += 1
        windows += ((w, sliceRows))
        val cap = math.min(batchCap, rounds - merges.size)
        val base = merges.size
        val adopted = greedyAdopt(sliceRows, cap)
        merges ++= adopted.zipWithIndex.map { case ((a, b, c), i) =>
          (base + i + 1, a, b, c)
        }
        adoptedPerWindow += adopted.size
        val next = frame.withColumn("toks",
            graft.functions.VectorFunctions.bpe_apply_merges(col("toks"),
              adopted.map(_._1), adopted.map(_._2)))
          .localCheckpoint(true)
        frame.unpersist(false)
        frame = next
      }
    } catch {
      case t: Throwable => frame.unpersist(false); throw t
    }
    (BpeBatchResult(merges.toSeq, windows.toSeq, adoptedPerWindow.toSeq), frame)
  }

  /** [[bpeTrainFromCounts]]'s merge table alone — (round, lhs, rhs,
    * pair_count), `pair_count` the frequency-weighted count the
    * adoption ranked the pair by in its window-start vocabulary. */
  def bpeMergesFromCounts(counts: DataFrame, rounds: Int = 48,
                          batchCap: Int = 16): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val (res, frame) = bpeTrainFromCounts(counts, rounds, batchCap)
    frame.unpersist(false)
    res.merges.toDF("round", "lhs", "rhs", "pair_count").orderBy("round")
  }

  /** Character-grain ENCODE of every whitespace word through an
    * already-trained [[bpeTrainFromCounts]] merge table — the
    * production inference step next to the maintained trainer. ONE
    * map-only pass, NO shuffle at all: per document the word array
    * folds through the depth-independent rank-routing kernel
    * ([[graft.functions.BpeApplyMergesIndexed]]) word by word inside a
    * single codegen'd projection; the merge table broadcasts as a
    * literal reference object. Output (doc_id, n_words, n_chars,
    * n_pieces) — all integers, so the DuckDB sequential-fold replay
    * (q198, the q181 discipline at char grain) hash-gates the kernel
    * routing bit-for-bit. */
  def bpeEncodeWords(docs: DataFrame, merges: Seq[(String, String)],
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val lhs = merges.map(_._1)
    val rhs = merges.map(_._2)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        filter(split(col(textCol), " "), x => x =!= "").as("__w"))
      .select(col("doc_id"),
        size(col("__w")).cast("long").as("n_words"),
        aggregate(col("__w"), lit(0L),
          (a, x) => a + length(x).cast("long")).as("n_chars"),
        aggregate(col("__w"), lit(0L), (a, x) =>
          a + size(graft.functions.VectorFunctions.bpe_apply_merges_indexed(
            filter(split(x, ""), t => t =!= ""), lhs, rhs)).cast("long"))
          .as("n_pieces"))
  }

  /** The BPE rewrite fold: merge non-overlapping left-to-right (a, b)
    * occurrences in a token array into single `"a b"` tokens. */
  private def mergeFold(toks: Column, a: String, b: String): Column = {
    def st(out: Column, pending: Column) =
      struct(out.as("out"), pending.as("pending"))
    val nullStr = lit(null).cast("string")
    aggregate(toks,
      st(expr("cast(array() as array<string>)"), nullStr),
      (acc, t) => {
        val out = acc.getField("out")
        val pend = acc.getField("pending")
        when(pend.isNull, st(out, t))
          .when(pend === lit(a) && t === lit(b),
            st(concat(out, array(lit(a + " " + b))), nullStr))
          .otherwise(st(concat(out, array(pend)), t))
      },
      acc => when(acc.getField("pending").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("pending")))))
  }

  /** Per-document n-gram novelty: of a document's distinct token
    * n-grams, how many appear in NO other document. The inverse of the
    * repetition signal — a high-novelty document contributes content the
    * corpus doesn't already have, a low-novelty one is boilerplate even
    * if no single near-duplicate exists. Documents shorter than n tokens
    * have no n-grams and drop out.
    *
    * Shape: gram explode is a map op; one distinct + one gram-count
    * aggregate + one equi-join back — all hash-partitioned by gram, the
    * same discipline as the shingle machinery. Integer outputs only. */
  def ngramNovelty(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", n: Int = 3): DataFrame = {
    require(n >= 1)
    val grams = transform(sequence(lit(0), size(col("__toks")) - n),
      i => concat_ws(" ", (1 to n).map(k => element_at(col("__toks"), i + k)): _*))
    val dg = docs
      .withColumn("__toks", split(col(textCol), " "))
      .filter(size(col("__toks")) >= n)
      .select(col(idCol), explode(grams).as("gram"))
      .distinct()
    val gcount = dg.groupBy("gram").agg(count(lit(1)).as("gdocs"))
    dg.join(gcount, "gram")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("gdocs") === 1, 1L).otherwise(0L)).as("n_unique"))
  }

  /** Heaps-law vocabulary-growth curve: at each id-axis checkpoint
    * (multiples of `every`), the cumulative document/token counts and
    * the cumulative DISTINCT vocabulary of the corpus prefix
    * doc_id ≤ checkpoint. Flattening growth signals saturation or
    * heavy duplication; the curve is the standard corpus-scaling
    * diagnostic (Heaps' law V ≈ K·Nᵝ).
    *
    * Scale shape: one token explode feeds a map-side-combinable
    * min-aggregation (each type's FIRST doc — the only shuffle that
    * sees token-grain rows); pure integer arithmetic buckets types and
    * tokens to checkpoints; the cumulative sums run in one window over
    * the ≤ idRange/every-row checkpoint frame (a partitionless window,
    * acceptable ONLY because that frame is checkpoint-sized, never
    * corpus-sized). Output: (checkpoint, cum_docs, cum_tokens, vocab),
    * all integers — any engine reproduces the curve bit-for-bit. */
  def vocabGrowth(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", every: Long = 50L): DataFrame = {
    require(every >= 1)
    val cpOfDoc = expr(s"(($idCol - 1) div $every + 1) * $every")
    val firstDoc = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .groupBy("w").agg(min(col(idCol)).as(idCol))
    val newTypes = firstDoc.select(cpOfDoc.as("checkpoint"))
      .groupBy("checkpoint").agg(count(lit(1)).as("__new_types"))
    val perCp = docs
      .select(cpOfDoc.as("checkpoint"),
        size(split(col(textCol), " ")).cast("long").as("__n_tokens"))
      .groupBy("checkpoint")
      .agg(count(lit(1)).as("__n_docs"), sum(col("__n_tokens")).as("__n_toks"))
    val w = Window.orderBy("checkpoint")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perCp.join(newTypes, Seq("checkpoint"), "full_outer")
      .select(col("checkpoint"),
        coalesce(col("__n_docs"), lit(0L)).as("__d"),
        coalesce(col("__n_toks"), lit(0L)).as("__t"),
        coalesce(col("__new_types"), lit(0L)).as("__v"))
      .select(col("checkpoint"),
        sum(col("__d")).over(w).as("cum_docs"),
        sum(col("__t")).over(w).as("cum_tokens"),
        sum(col("__v")).over(w).as("vocab"))
  }

  /** Within-document repetition signals (the Gopher/MassiveText quality
    * rules of Rae et al. 2021 §A.1, re-expressed over whitespace tokens):
    * for each document,
    *  - `top_unigram_frac` / `top_bigram_frac`: tokens covered by the
    *    single most frequent 1-/2-gram as a fraction of the document
    *    (count × n / n_tokens — an overlap-unaware upper bound, which is
    *    the deterministic definition both engines implement);
    *  - `dup_3gram_frac` / `dup_5gram_frac`: the fraction of n-gram
    *    occurrences that belong to an n-gram repeated within the SAME
    *    document (Σ c_g for c_g ≥ 2, over n_tokens − n + 1 slots);
    *  - `repetitive`: any signal above its threshold — the row a
    *    pipeline drops before training.
    * All fractions round to 4 decimals BEFORE the threshold compare, so
    * the flag is reproducible by any engine.
    *
    * Scale shape: the four gram sizes ride ONE tagged union — a single
    * (doc, n, gram) count shuffle and a single (doc, n) reduce, both
    * map-side combinable, instead of four separate explode+agg rounds;
    * per-doc work is O(n_tokens × |sizes|) and nothing global exists
    * anywhere (no corpus-wide vocabulary, no window). Documents shorter
    * than n tokens contribute no n-grams and read as 0. */
  def repetitionProfile(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text",
                        maxTopUnigramFrac: Double = 0.20,
                        maxTopBigramFrac: Double = 0.15,
                        maxDupTrigramFrac: Double = 0.01,
                        maxDupFivegramFrac: Double = 0.0): DataFrame = {
    val base = docs
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), col("__toks"),
        size(col("__toks")).cast("long").as("n_tokens"))
    def gramsOf(n: Int): Column =
      transform(sequence(lit(0), size(col("__toks")) - n),
        i => concat_ws(" ", (1 to n).map(k => element_at(col("__toks"), i + k)): _*))
    val tagged = Seq(1, 2, 3, 5).map { n =>
      base.filter(size(col("__toks")) >= n)
        .select(col(idCol), lit(n).as("__n"), explode(gramsOf(n)).as("__g"))
    }.reduce(_.unionByName(_))
    val perN = tagged
      .groupBy(col(idCol), col("__n"), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol), col("__n"))
      .agg(max(col("__c")).as("__top"),
        sum(when(col("__c") >= 2, col("__c")).otherwise(0L)).as("__dup"))
    val wide = perN.groupBy(idCol)
      .agg(max(when(col("__n") === 1, col("__top"))).as("__top1"),
        max(when(col("__n") === 2, col("__top"))).as("__top2"),
        max(when(col("__n") === 3, col("__dup"))).as("__dup3"),
        max(when(col("__n") === 5, col("__dup"))).as("__dup5"))
    base.select(col(idCol), col("n_tokens"))
      .join(wide, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        round(coalesce(col("__top1"), lit(0L)) * 1.0 / col("n_tokens"), 4)
          .as("top_unigram_frac"),
        round(coalesce(col("__top2"), lit(0L)) * 2.0 / col("n_tokens"), 4)
          .as("top_bigram_frac"),
        round(coalesce(col("__dup3"), lit(0L)).cast("double") /
          greatest(col("n_tokens") - 2, lit(1L)), 4).as("dup_3gram_frac"),
        round(coalesce(col("__dup5"), lit(0L)).cast("double") /
          greatest(col("n_tokens") - 4, lit(1L)), 4).as("dup_5gram_frac"))
      .withColumn("repetitive",
        col("top_unigram_frac") > maxTopUnigramFrac ||
        col("top_bigram_frac") > maxTopBigramFrac ||
        col("dup_3gram_frac") > maxDupTrigramFrac ||
        col("dup_5gram_frac") > maxDupFivegramFrac)
  }

  /** Gopher-style document-quality rule card (Rae et al. 2021 §A1.1's
    * filter family, adapted to the whitespace-token corpus): per
    * document the integer signals and one boolean per rule —
    * word-count bounds, mean-word-length bounds, alphabetic-word
    * ratio, minimum stopword occurrences, single-word dominance, and
    * duplicate-bigram mass — plus the conjunctive `keep`. Real
    * pipelines tune per-rule thresholds and audit which rule killed a
    * document; emitting the full card (not just `keep`) is the point.
    *
    * Every threshold compares INTEGERS (`3·n ≤ Σchars`, never
    * `Σchars/n ≥ 3.0`), so borderline documents cannot flip between
    * engines — the q71 exact-arithmetic discipline. One map-only pass:
    * the token array stages once, every signal folds over it in the
    * same whole-stage-codegen span (the dominance fold is
    * O(n log n) per document via sort + run-length scan, not a
    * per-distinct-word rescan); no join, no window, no shuffle before
    * the caller's ORDER BY. */
  def gopherRules(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text",
                  minWords: Long = 30, maxWords: Long = 50000,
                  stops: Seq[String] = stopwords("en"),
                  carryCols: Seq[String] = Nil): DataFrame = {
    val staged = docs.filter(col(textCol).isNotNull)
      .select(col(idCol) +: carryCols.map(col) :+
        filter(split(col(textCol), " "), t => t =!= "").as("__toks"): _*)
    val toks = col("__toks")
    val n = size(toks).cast("long")
    val sumChars = aggregate(toks, lit(0L), (acc, x) => acc + length(x))
    val stopArr = array(stops.map(lit): _*)
    val nAlpha = size(filter(toks, x => x.rlike("^[A-Za-z]+$"))).cast("long")
    val nStop = size(filter(toks, x => array_contains(stopArr, x))).cast("long")
    // longest run in the SORTED array == the most frequent word's count
    val maxWordN = aggregate(
      array_sort(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val bigrams = when(n >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    val n2 = size(bigrams).cast("long")
    val nd2 = size(array_distinct(bigrams)).cast("long")
    staged.select(col(idCol) +: carryCols.map(col) ++: Seq(
        n.as("n_words"), sumChars.as("sum_word_chars"),
        nAlpha.as("n_alpha_words"), nStop.as("n_stopwords"),
        maxWordN.as("max_word_count"),
        n2.as("n_bigrams"), nd2.as("n_distinct_bigrams")): _*)
      .withColumn("r_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("r_mean_word_len", // 3 ≤ mean ≤ 10, integer-exact
        lit(3) * col("n_words") <= col("sum_word_chars") &&
          col("sum_word_chars") <= lit(10) * col("n_words"))
      .withColumn("r_alpha_ratio", // ≥ 80% alphabetic words
        lit(5) * col("n_alpha_words") >= lit(4) * col("n_words"))
      .withColumn("r_stopwords", col("n_stopwords") >= 2)
      .withColumn("r_dominance", // most frequent word ≤ 20%
        lit(5) * col("max_word_count") <= col("n_words"))
      .withColumn("r_repetition", // duplicated bigram mass ≤ 50%
        lit(2) * (col("n_bigrams") - col("n_distinct_bigrams")) <= col("n_bigrams"))
      .withColumn("keep",
        col("r_word_count") && col("r_mean_word_len") && col("r_alpha_ratio") &&
          col("r_stopwords") && col("r_dominance") && col("r_repetition"))
  }

  /** Zipf-law fit over the corpus's top-`topV` term frequencies: OLS of
    * log(freq) on log(rank) — slope ≈ −1 is the natural-language
    * signature; a flat slope flags template/boilerplate corpora, a
    * cliff flags truncated vocabularies (the corpus-health diagnostic
    * next to [[vocabGrowth]]'s Heaps curve). Output: one row of
    * (n_terms, slope, intercept, r2).
    *
    * Determinism: the top-V cut is a bounded-heap TakeOrdered under the
    * total order (cnt DESC, term); log points quantize to integer
    * 1e4-units BEFORE summing (round of identical doubles — the q124
    * rounded-ln discipline), so every regression sum is exact integer
    * arithmetic and the final slope/intercept/r2 are single double
    * expressions over those integers — engine-identical. The only
    * corpus-sized work is the term count (map-side combinable); the
    * window runs over the topV-row frame. */
  def zipfFit(docs: DataFrame, textCol: String = "text",
              topV: Int = 200): DataFrame = {
    require(topV >= 2)
    val counts = docs.select(explode(split(col(textCol), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(topV)
    val ranked = counts.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("w"))).cast("long"))
    ranked
      .select(
        round(log(col("rank").cast("double")) * 10000).cast("long").as("x4"),
        round(log(col("cnt").cast("double")) * 10000).cast("long").as("y4"))
      .agg(count(lit(1)).as("n"), sum(col("x4")).as("sx"), sum(col("y4")).as("sy"),
        sum(col("x4") * col("x4")).as("sxx"),
        sum(col("x4") * col("y4")).as("sxy"),
        sum(col("y4") * col("y4")).as("syy"))
      .select(col("n").as("n_terms"),
        expr("round(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE), 4)")
          .as("slope"),
        expr("""round((CAST(sy AS DOUBLE)
                - (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE))
                  * CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE) * 10000.0), 4)""")
          .as("intercept"),
        expr("""round((CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE))
                / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)), 4)""")
          .as("r2"))
  }

  /** Population-stability-index (PSI) drift monitor between two corpus
    * slices (yesterday's crawl vs today's, source A vs source B): the
    * quality-score distribution of each side buckets into `buckets`
    * fixed-width bins and each bin contributes
    * `(p_a − p_b)·ln(p_a/p_b)` — the standard drift score (PSI > 0.2 =
    * investigate). Shares are Laplace-smoothed (`(n+1)/(N+buckets)`) so
    * empty bins stay finite and Σp = 1 exactly.
    *
    * Scale shape: each side is one map-side-combinable bucket count
    * (the score is a per-row expression — no shuffle before the
    * O(buckets) aggregate); totals ride a broadcast 1-row cross join;
    * the PSI contribution quantizes to integer 1e-8 units
    * (`round(x·1e8)` of identical doubles), so the per-bin rows — and
    * any total a consumer sums from them — are engine-exact. */
  def qualityDrift(a: DataFrame, b: DataFrame, textCol: String = "text",
                   buckets: Int = 10): DataFrame =
    psiBins(qualityBucketCounts(a, textCol, buckets),
      qualityBucketCounts(b, textCol, buckets), buckets)

  /** Sparse per-bin quality-score counts — the per-slice half of
    * [[qualityDrift]], exposed so a STREAMING monitor can accumulate a
    * reference incrementally ([[graft.streaming.DriftStream]]) instead
    * of rescanning history every trigger. */
  def qualityBucketCounts(df: DataFrame, textCol: String = "text",
                          buckets: Int = 10): DataFrame =
    // null text carries no quality signal: EXCLUDED, explicitly — a null
    // score would otherwise fall through Spark's null-skipping `least`
    // into the top bucket, a coincidence of builtin null rules rather
    // than monitor semantics (and one DuckDB's `least` need not share)
    withQuality(df.filter(col(textCol).isNotNull), textCol)
      .select(least(floor(col("quality_score") * buckets), lit(buckets - 1))
        .cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  /** PSI bins from two sparse count frames (`(bucket, n)` each): the
    * grid-completion + Laplace smoothing + contribution arithmetic of
    * [[qualityDrift]], shared with the streaming monitor. */
  def psiBins(countsA: DataFrame, countsB: DataFrame, buckets: Int): DataFrame = {
    require(buckets >= 2)
    val spark = countsA.sparkSession
    import spark.implicits._
    val grid = (0L until buckets.toLong).toDF("bucket")
    val joined = grid
      .join(countsA.select(col("bucket"), col("n").as("__na")),
        Seq("bucket"), "left")
      .join(countsB.select(col("bucket"), col("n").as("__nb")),
        Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("__na"), lit(0L)).as("n_a"),
        coalesce(col("__nb"), lit(0L)).as("n_b"))
    val tot = joined.agg(sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"))
    joined.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_a"), col("n_b"),
        ((col("n_a") + 1).cast("double") / (col("__ta") + buckets)).as("__pa"),
        ((col("n_b") + 1).cast("double") / (col("__tb") + buckets)).as("__pb"))
      .select(col("bucket"), col("n_a"), col("n_b"),
        round((col("__pa") - col("__pb")) * log(col("__pa") / col("__pb")) * 1e8)
          .cast("long").as("psi_micro8"))
  }

  /** PMI collocation mining: adjacent token pairs scored by pointwise
    * mutual information — `ln(p(x,y) / (p(x)·p(y)))` with pair
    * probability over bigram slots and unigram probabilities over
    * tokens. High-PMI pairs are the corpus's multi-word expressions
    * (the classic collocation discovery of Church & Hanks 1990); a
    * pipeline uses them for tokenizer merge seeding and boilerplate
    * phrase detection. Pairs below `minCount` are cut first (PMI is
    * unstable at tiny counts), the report is the top-`topK` by
    * (rounded pmi DESC, t1, t2) — rounding BEFORE the sort keeps the
    * cut engine-stable.
    *
    * Scale shape: one unigram count + one bigram count, both map-side
    * combinable; totals are 1-row aggregates broadcast by cross join;
    * the two unigram joins hash-partition by token; the final cut is a
    * bounded-heap TakeOrdered. The PMI expression is a single
    * double-arithmetic chain evaluated identically by any engine
    * (left-associated products of exact integer counts). */
  def pmiCollocations(docs: DataFrame, textCol: String = "text",
                      minCount: Long = 5L, topK: Int = 50): DataFrame = {
    require(minCount >= 1 && topK >= 1)
    val toks = split(col(textCol), " ")
    val uni = docs.select(explode(toks).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val bi = docs.select(toks.as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("__toks")) - 2),
        i => struct(element_at(col("__toks"), i + 1).as("t1"),
          element_at(col("__toks"), i + 2).as("t2")))).as("p"))
      .select(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    val totals = uni.agg(sum(col("c")).as("__nu")).crossJoin(
      docs.agg(sum(greatest(size(toks) - 1, lit(0))).cast("long").as("__nb")))
    bi.join(uni.select(col("t").as("t1"), col("c").as("c_x")), "t1")
      .join(uni.select(col("t").as("t2"), col("c").as("c_y")), "t2")
      .crossJoin(broadcast(totals))
      .select(col("t1"), col("t2"), col("c_xy"), col("c_x"), col("c_y"),
        round(log((col("c_xy").cast("double") * col("__nu") * col("__nu")) /
          (col("__nb").cast("double") * col("c_x") * col("c_y"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("t1"), col("t2"))
      .limit(topK)
  }

  // ---------------------------------------------------------------- curation

  /** End-to-end corpus curation — the pipeline a training-data job
    * actually runs, composed from the verified pieces: quality scoring
    * (keep ≥ minQuality), language filtering (keep predicted ∈ langs),
    * then near-duplicate removal over the SURVIVORS (LSH + exact-Jaccard
    * + connected components, keep each cluster's min-id doc).
    * Filter-then-dedup order matters: clusters form among documents that
    * passed the gates, so a high-quality doc is never dropped as the
    * near-dup of an already-rejected low-quality one. */
  def curateCorpus(docs: DataFrame, minQuality: Double, langs: Seq[String],
                   dedupThreshold: Double = 0.5, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val scored = withLangId(withQuality(docs, textCol), textCol)
    // materialize the gated corpus ONCE: the dedup stage scans it several
    // times (signatures, verification, final anti-join), and re-deriving
    // the scoring projection per scan re-pays both the evaluation and the
    // (large) codegen of the pushed-down score/lang predicates. A real
    // pipeline persists this curated intermediate to storage at scale —
    // localCheckpoint is the in-session equivalent.
    val kept = scored
      .filter(col("quality_score") >= minQuality &&
              col("lang_pred").isin(langs: _*))
      .localCheckpoint(true)
    graft.ext.Dedup.dedupCorpus(kept, idCol, textCol, threshold = dedupThreshold)
  }
}

package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval (BM25) over a document corpus — the
  * dual-encoder-free half of a RAG / dedup-by-retrieval stack, and the
  * classic "find the training doc that answers this eval question"
  * decontamination probe.
  *
  * Scale shape: the corpus side is reduced to a (doc_id, term, tf)
  * posting frame (one hash agg, map-side combinable); the query side is
  * tiny and BROADCAST onto the postings, so per-query work is
  * proportional to the posting lists of its terms — never a corpus
  * scan per query. Document-frequency and average-doc-length frames are
  * O(vocab) / O(1) and broadcast. Top-k per query runs through the
  * bounded-heap aggregator ([[graft.functions.TopK.top_k]]): partial
  * heaps combine map-side, the shuffle moves O(queries × k) rows, and
  * no global or per-query sort of the full scored frame ever happens.
  */
object Retrieval {

  /** BM25 top-k retrieval: for each query (a bag of terms), the k
    * highest-scoring documents.
    *
    * score(q, d) = Σ_{t ∈ q, tf(t,d) > 0}
    *   ln(1 + (N − df + 0.5) / (df + 0.5))          ← Lucene/Robertson idf
    *   · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * Scores round to 4 decimals BEFORE ranking (q72's contract: a 1-ulp
    * ln()/division divergence between engines cannot flip a rank); ties
    * break on doc_id asc. `queries` must be (query_id: Long, term:
    * String) — duplicate (query_id, term) rows are collapsed (a query
    * is a term SET here, the standard bag-of-words probe).
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
               idCol: String = "doc_id", textCol: String = "text",
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (tf, dl) = buildIndex(docs, idCol, textCol)
    bm25TopKFromIndex(tf, dl, queries, k, k1, b)
  }

  /** The (postings, doc-length) pair [[bm25TopK]] scores over — exposed
    * so a maintained index ([[graft.streaming.IndexStream]]) can be
    * built incrementally and queried with IDENTICAL semantics: postings
    * = (doc_id, term, tf) via one map-side-combinable hash agg; dl =
    * (doc_id, dl). Everything else BM25 needs (df, N, avgdl) derives
    * from these two frames, so they ARE the index. */
  def buildIndex(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): (DataFrame, DataFrame) = {
    val toks = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val tf = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    (tf, dl)
  }

  /** [[bm25TopK]] over a prebuilt (postings, doc-length) index — same
    * scoring, same rounding, same tie-breaks; `tf` must be (doc_id,
    * term, tf), `dl` (doc_id, dl). */
  def bm25TopKFromIndex(tf: DataFrame, dl: DataFrame, queries: DataFrame,
                        k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // two scalars (N, avgdl) — a 1-row broadcast crossJoin
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    val q = queries.select(col("query_id"), col("term")).distinct()

    val contrib = broadcast(q)
      .join(tf, "term") // per-query work = posting lists of its terms
      .join(dfreq, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("tfn",
        col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .select(col("query_id"), col("doc_id"), (col("idf") * col("tfn")).as("c"))

    contrib
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("c")), 4).as("score"))
      .filter(col("query_id") =!= col("doc_id")) // self-retrieval is noise here
      // bounded heap; the aggregator's tie order (score desc, id asc)
      // is exactly the oracle's window ordering
      .groupBy("query_id")
      .agg(graft.functions.TopK.top_k(k)(col("doc_id"), col("score")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("doc_id"),
        col("t.score").as("score"), (col("pos") + 1).cast("long").as("rank"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09) of
    * several per-query ranked lists into one hybrid ranking — the
    * standard way a retrieval stack combines its sparse (BM25) and
    * dense (embedding ANN) channels without score calibration: only
    * RANKS enter the fused score, so the channels' incomparable score
    * scales never meet.
    *
    * fused(q, d) = Σ_{lists containing d}  ⌊10¹² / (c + rank)⌋
    *
    * The per-rank contribution is an exact integer (floor division of
    * int64s — no floating point anywhere), so the fused score is
    * engine-identical regardless of summation order; ties break on
    * doc_id asc.
    *
    * Scale shape: the inputs are ALREADY bounded — O(queries × k') rows
    * per channel — so fusion costs one union + one hash agg + the
    * bounded top-k heap over frames that are tiny relative to the
    * corpus no matter the corpus size. The expensive work (scoring 100
    * TB of documents) stays inside the channels, which each use their
    * own scale path (posting-list broadcast for BM25, ANN index for
    * dense); fusion adds no corpus-sized shuffle.
    *
    * Each input must carry (query_id: Long, doc_id: Long, rank: Long
    * starting at 1). `k` is the fused list depth.
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val contrib = lists
      .map(_.select(col("query_id"), col("doc_id"),
        expr(s"CAST(1000000000000 AS BIGINT) div (CAST($c AS BIGINT) + rank)")
          .as("contrib")))
      .reduce(_.unionByName(_))
    contrib
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("rrf_units"))
      // bounded heap (score desc, id asc) — rrf_units < 2·10¹² per
      // channel, far inside double's 2^53 exact-integer range
      .groupBy("query_id")
      .agg(graft.functions.TopK.top_k(k)(col("doc_id"),
        col("rrf_units").cast("double")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("doc_id"),
        col("t.score").cast("long").as("rrf_units"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Exact PHRASE search through the positional posting frame: for each
    * phrase (an ORDERED token sequence, unlike [[bm25TopK]]'s term
    * sets), every document containing the phrase verbatim, with its
    * occurrence count and first position.
    *
    * The classic positional-inverted-index algorithm, join-shaped: the
    * corpus melts once to (doc, term, position) postings; each phrase
    * melts to (phrase, term, offset); one equi-join on the TERM aligns
    * candidate anchors (start = position − offset), and a start is a
    * real occurrence iff all `plen` offsets matched — a hash-aggregate
    * count, never a per-document scan per phrase and never a substring
    * pass over the corpus. The phrase frame is tiny and broadcast, so
    * per-phrase work is proportional to its terms' posting lists (the
    * [[bm25TopK]] discipline), and the anchor aggregate combines
    * map-side.
    *
    * Output: (phrase_id, doc_id, n_matches, first_pos) — one row per
    * (phrase, document) with ≥1 verbatim occurrence. */
  def phraseSearch(docs: DataFrame, phrases: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text",
                   phraseIdCol: String = "phrase_id",
                   phraseCol: String = "phrase"): DataFrame =
    phraseSearchFromPostings(
      docs.filter(col(textCol).isNotNull)
        .select(col(idCol).as("doc_id"),
          posexplode(split(col(textCol), " ")).as(Seq("tpos", "term"))),
      phrases, phraseIdCol, phraseCol)

  /** [[phraseSearch]] against a PRE-BUILT positional posting frame
    * (`doc_id`, `tpos`, `term`) — the surgery half, factored so the
    * one-shot pass and the maintained positional index
    * ([[graft.streaming.PosIndexStream]]) share one kernel. The
    * postings of a document are per-document facts, so the frame may
    * come from any union of per-batch appends. */
  private[graft] def phraseSearchFromPostings(
      pos: DataFrame, phrases: DataFrame,
      phraseIdCol: String = "phrase_id",
      phraseCol: String = "phrase"): DataFrame = {
    val pt = phrases
      .select(col(phraseIdCol).as("phrase_id"),
        split(col(phraseCol), " ").as("__pt"))
      .select(col("phrase_id"), size(col("__pt")).as("plen"),
        posexplode(col("__pt")).as(Seq("off", "term")))
    // (doc, tpos) rows are unique and (phrase, off) rows are unique, so
    // each matched offset contributes exactly one row per anchor — the
    // anchor is a full occurrence iff its row count reaches plen
    val anchors = pos.join(pt, Seq("term"))
      .select(col("doc_id"), col("phrase_id"), col("plen"),
        (col("tpos") - col("off")).as("start"))
      .filter(col("start") >= 0)
      .groupBy("doc_id", "phrase_id", "plen", "start")
      .agg(count(lit(1)).as("matched"))
      .filter(col("matched") === col("plen"))
    anchors.groupBy("phrase_id", "doc_id")
      .agg(count(lit(1)).as("n_matches"),
        min(col("start")).cast("long").as("first_pos"))
  }

  /** The derived query set [[graft.queries.Extended]]'s q105 retrieves
    * with: every `every`-th document contributes its distinct
    * first-`width` tokens as one term-set query (query_id = doc_id).
    * Derivable identically in SQL, so the oracle needs no dump. */
  def probeQueries(docs: DataFrame, every: Int, width: Int,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.filter(col(idCol) % every === 0)
      .select(col(idCol).as("query_id"),
        explode(array_distinct(slice(split(col(textCol), " "), 1, width))).as("term"))
}

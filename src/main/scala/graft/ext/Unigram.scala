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
    val wc = counts.cache()
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
    } finally { wc.unpersist(false); () }
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

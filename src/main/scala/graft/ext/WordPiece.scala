package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece subword tokenization (Wu et al. 2016; the BERT tokenizer
  * family): a bounded vocabulary of word-initial and `##`-continuation
  * pieces, and the greedy longest-match encode against it — the THIRD
  * tokenizer family in the engine next to BPE train/encode
  * (TextAnalysis.bpeMerges*) and the regex BPE-ish counter, because
  * real training-data pipelines mix corpora tokenized under different
  * schemes and token-budget accounting must follow each corpus's own
  * tokenizer.
  *
  * Vocabulary derivation here is the frequency heuristic (top whole
  * words + top prefix/suffix affixes + full character coverage in both
  * roles), NOT the likelihood-driven WordPiece trainer — deterministic,
  * one aggregation pass, and sufficient to exercise the encode exactly;
  * the encode kernel ([[graft.functions.WordPieceEncode]]) is the
  * production piece. Scale shape: the vocabulary is aggregated from
  * word counts (one shuffle on `word`, a ~|vocab|-sized result), then
  * collected (bounded: chars + topWords + 2×topAffixes rows) and
  * broadcast into a map-only encode projection — at 100 TB the encode
  * is pure per-split work; only the count aggregation shuffles, on a
  * key space the size of the language's vocabulary.
  */
object WordPiece {

  /** A trained vocabulary: word-initial pieces and continuation pieces
    * (stored WITHOUT the `##` marker; rendering adds it). */
  case class Vocab(init: Seq[String], cont: Seq[String])

  /** Per-word exact counts: one aggregation, the vocabulary's only
    * shuffle. Public shape (word string, n long) — the same frame
    * [[graft.streaming.VocabStream]] maintains incrementally, so the
    * one-shot and maintained derivations share [[vocabFrameFromCounts]]
    * verbatim. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** The vocabulary as a frame (`piece` string, `cont` boolean) — the
    * oracle-dump shape. Deterministic: every ORDER BY ends in the piece
    * itself, so count ties cannot reorder across engines.
    *  - every character of every word, in BOTH roles (total coverage:
    *    the greedy encode can never fail);
    *  - the `topWords` most frequent whole words, word-initial;
    *  - the `topAffixes` most frequent strict prefixes over
    *    `affixLens`, word-initial;
    *  - the `topAffixes` most frequent strict suffixes over
    *    `affixLens`, continuation. */
  def vocabFrame(docs: DataFrame, textCol: String = "text",
                 topWords: Int = 16, topAffixes: Int = 8,
                 affixLens: Seq[Int] = Seq(2, 3, 4)): DataFrame =
    vocabFrameFromCounts(wordCounts(docs, textCol),
      topWords, topAffixes, affixLens)

  /** [[vocabFrame]] from an already-aggregated (word, n) frame — the
    * seam the maintained store reads through: identical counts ⇒
    * identical vocabulary (every ORDER BY ends in the piece).
    *
    * The result is BOUNDED by construction (chars + topWords +
    * 2×topAffixes×|affixLens| rows), so it materializes to a
    * driver-local relation here: the counts cache is scoped to this
    * call (unpersisted before returning — repeated trainer/TVF/store
    * derivations must not accumulate block-manager state), and every
    * downstream read (aux dump, TVF, collect) reads the materialized
    * rows instead of re-running the aggregation. */
  def vocabFrameFromCounts(counts: DataFrame,
                           topWords: Int = 16, topAffixes: Int = 8,
                           affixLens: Seq[Int] = Seq(2, 3, 4)): DataFrame = {
    // a caller that persisted `counts` for its own reuse keeps its cache:
    // cache/unpersist act on the shared Dataset, so this call only
    // manages the persistence it created itself (ADVICE r12)
    val callerCached =
      counts.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val wc = if (callerCached) counts else counts.cache()
    try {
      val chars = wc.select(explode(split(col("word"), "")).as("piece"))
        .filter(col("piece") =!= "").distinct()
      val topw = wc.orderBy(col("n").desc, col("word")).limit(topWords)
        .select(col("word").as("piece"))
      def affix(start: Boolean): DataFrame =
        affixLens.map { l =>
          val p = if (start) substring(col("word"), 1, l)
                  else substring(col("word"), -l, l)
          wc.filter(length(col("word")) > l).select(p.as("piece"), col("n"))
        }.reduce(_ unionByName _)
          .groupBy("piece").agg(sum("n").as("s"))
          .orderBy(col("s").desc, col("piece")).limit(topAffixes)
          .select("piece")
      val init = chars.unionByName(topw).unionByName(affix(start = true))
        .distinct().withColumn("cont", lit(false))
      val contd = chars.unionByName(affix(start = false))
        .distinct().withColumn("cont", lit(true))
      val frame = init.unionByName(contd)
      counts.sparkSession.createDataFrame(
        java.util.Arrays.asList(frame.collect(): _*), frame.schema)
    } finally { if (!callerCached) wc.unpersist(false); () }
  }

  /** Collect the (bounded) vocabulary frame into the broadcastable
    * [[Vocab]]. Sorted for a deterministic closure. */
  def trainVocab(docs: DataFrame, textCol: String = "text",
                 topWords: Int = 16, topAffixes: Int = 8,
                 affixLens: Seq[Int] = Seq(2, 3, 4)): Vocab =
    collectVocab(vocabFrame(docs, textCol, topWords, topAffixes, affixLens))

  /** Collect a (piece, cont) frame into the broadcastable [[Vocab]] —
    * bounded: chars + topWords + 2×topAffixes×|affixLens| rows. */
  def collectVocab(frame: DataFrame): Vocab = {
    val rows = frame.collect()
    val (c, i) = rows.partition(_.getBoolean(1))
    Vocab(i.map(_.getString(0)).sorted.toIndexedSeq,
      c.map(_.getString(0)).sorted.toIndexedSeq)
  }

  /** Greedy longest-match encode: per document, `n_words`, `n_pieces`,
    * and the rendered piece string (continuations `##`-marked). One
    * map-only projection — the kernel call and every derived column
    * share a whole-stage-codegen span. */
  def encode(docs: DataFrame, vocab: Vocab,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = split(col(textCol), " ")
    val pieces = graft.functions.WordPieceFunctions
      .word_piece_encode(toks, vocab.init, vocab.cont)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        size(filter(toks, t => t =!= "")).cast("long").as("n_words"),
        size(pieces).cast("long").as("n_pieces"),
        array_join(pieces, " ").as("encoded"))
  }
}

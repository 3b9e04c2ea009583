package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The tokenizer bake-off: per-document token counts under ALL FOUR of
  * the engine's tokenizer families at once — whitespace, a trained BPE
  * merge table (rank-routing indexed kernel), a WordPiece vocabulary
  * (greedy longest-match kernel), and a unigram piece inventory (exact
  * Viterbi kernel). Mixed training corpora are tokenized under
  * different schemes, and budget accounting / mixture math must compare
  * them on one axis; this is the frame that comparison reads from.
  *
  * The operator is also the composition proof for the kernel family:
  * all three trained tokenizers run as codegen reference-object
  * expressions inside ONE map-only projection — no join, no shuffle,
  * one pass over the corpus however deep the tables. */
object Tokenizers {

  def profile(docs: DataFrame, merges: Seq[(String, String)],
              wp: WordPiece.Vocab, ug: Seq[(String, Long)],
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = split(col(textCol), " ")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        // the ONE whitespace-count convention across the tokenizer
        // surface: empty tokens (leading/trailing/consecutive spaces)
        // don't count — same axis as q188's n_words / q191's n_words
        size(filter(toks, t => t =!= "")).cast("long").as("n_ws"),
        size(graft.functions.VectorFunctions.bpe_apply_merges_indexed(
          toks, merges.map(_._1), merges.map(_._2))).cast("long").as("n_bpe"),
        size(graft.functions.WordPieceFunctions.word_piece_encode(
          toks, wp.init, wp.cont)).cast("long").as("n_wp"),
        graft.functions.UnigramFunctions.unigram_viterbi_stats(
            toks, ug.map(_._1), ug.map(_._2), Unigram.CostScale)
          .getField("n_pieces").as("n_ug"))
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The bake-off frame ([[Tokenizers.profile]]) must agree column-for-
  * column with each family's standalone operator — the composition of
  * three reference-object kernels in one projection cannot change any
  * count. */
class TokenizersSpec extends SparkTestBase {
  import spark.implicits._

  test("profile ≡ the standalone operators, column by column") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull).limit(80).cache()
    val merges = TextAnalysis.bpeMergesBatched(docs, rounds = 12, batchCap = 4)
      .orderBy("round").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
    val wp = WordPiece.trainVocab(docs)
    val ug = Unigram.trainPieces(docs)

    val prof = Tokenizers.profile(docs, merges, wp, ug)
      .orderBy("doc_id").collect()
    val bpe = TextAnalysis.bpeEncodeWithTable(docs, merges)
      .select("doc_id", "n_raw", "n_encoded").orderBy("doc_id").collect()
    val wpe = WordPiece.encode(docs, wp).orderBy("doc_id").collect()
    val uge = Unigram.viterbiStats(docs, ug).orderBy("doc_id").collect()

    // the unified whitespace axis: empty tokens filtered, the same
    // convention as q188's n_words / q191's n_words
    val ws = docs.select(col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= ""))
          .cast("long").as("n"))
      .orderBy("doc_id").collect()

    prof.indices.foreach { k =>
      assert(prof(k).getLong(0) == bpe(k).getLong(0))
      assert(prof(k).getAs[Long]("n_ws") == ws(k).getAs[Long]("n"))
      assert(prof(k).getAs[Long]("n_bpe") == bpe(k).getAs[Long]("n_encoded"))
      assert(prof(k).getAs[Long]("n_wp") == wpe(k).getAs[Long]("n_pieces"))
      assert(prof(k).getAs[Long]("n_ug") == uge(k).getAs[Long]("n_pieces"))
    }
    // the families genuinely disagree somewhere (or the bake-off is moot)
    assert(prof.exists(r => r.getAs[Long]("n_wp") != r.getAs[Long]("n_ug")) ||
      prof.exists(r => r.getAs[Long]("n_bpe") != r.getAs[Long]("n_ws")))
  }

  test("n_ws skips empty tokens from irregular whitespace (the unified axis)") {
    val docs = Seq((1L, "a  b c "), (2L, " x")).toDF("doc_id", "text")
    val wp = WordPiece.Vocab(Seq("a", "b", "c", "x"), Seq("a", "b", "c", "x"))
    val ug = Seq(("a", 1L), ("b", 1L), ("c", 1L), ("x", 1L))
    val prof = Tokenizers.profile(docs, Seq(("a", "b")), wp, ug)
      .orderBy("doc_id").collect()
    assert(prof(0).getAs[Long]("n_ws") == 3L) // "a  b c " → a, b, c
    assert(prof(1).getAs[Long]("n_ws") == 1L) // " x" → x
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The greedy longest-match WordPiece encode
  * ([[graft.functions.WordPieceEncode]]) and the frequency-heuristic
  * vocabulary ([[WordPiece.trainVocab]]): hand cases for every rule the
  * kernel must get right (maximum munch, initial-vs-continuation
  * tables, `##` rendering, the 1-char fallback, empty tokens), the
  * lossless-reconstruction property on a real corpus slice, and
  * vocabulary determinism. */
class WordPieceSpec extends SparkTestBase {
  import spark.implicits._

  private def enc(text: String, init: Seq[String], cont: Seq[String]): (Long, Long, String) = {
    val r = WordPiece.encode(Seq((1L, text)).toDF("doc_id", "text"),
      WordPiece.Vocab(init, cont)).head()
    (r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("hand cases: munch order, table roles, markers, fallback") {
    val chars = "abcdehlnrsuwy".map(_.toString)
    // longest match wins: "un" over "u", then "##able" over "##a"
    assert(enc("unable", chars ++ Seq("un", "unabl"), chars ++ Seq("able", "le"))
      === ((1L, 2L, "unabl ##e")))
    // maximum munch is GREEDY, not optimal: "un" first, then no "##able"
    // continuation beats taking it piecewise
    assert(enc("unable", chars ++ Seq("un"), chars ++ Seq("able"))
      === ((1L, 2L, "un ##able")))
    // a whole-word piece swallows the word in one
    assert(enc("hello", Seq("hello"), Seq.empty) === ((1L, 1L, "hello")))
    // continuation pieces never match at word start, and vice versa
    assert(enc("aa", Seq("a"), Seq("aa", "a")) === ((1L, 2L, "a ##a")))
    // fallback: a character in NEITHER table still encodes (1-char consume)
    assert(enc("axa", Seq("a"), Seq("a")) === ((1L, 3L, "a ##x ##a")))
    // multi-word, shared vocab across words; doubled space = empty token skipped
    assert(enc("ab  ab", Seq("ab"), Seq.empty) === ((2L, 2L, "ab ab")))
    // greedy inside continuation: "##bc" (len 2) beats "##b"
    assert(enc("abc", Seq("a"), Seq("bc", "b", "c")) === ((1L, 2L, "a ##bc")))
  }

  test("corpus-trained vocab covers every character; encode reconstructs the text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull).limit(50)
    val vocab = WordPiece.trainVocab(docs)
    // full char coverage in both roles, bounded size
    val chars = docs.select(explode(split(col("text"), "")).as("c"))
      .filter(col("c") =!= "" && col("c") =!= " ").distinct()
      .as[String].collect().toSet
    assert(chars.subsetOf(vocab.init.toSet) && chars.subsetOf(vocab.cont.toSet))
    assert(vocab.init.size <= chars.size + 16 + 8 && vocab.cont.size <= chars.size + 8)
    // losslessness: stripping '##' and folding pieces back over word
    // boundaries reproduces the original text exactly
    val rows = WordPiece.encode(docs, vocab).collect()
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    rows.foreach { r =>
      val rebuilt = r.getString(3).split(' ').foldLeft(new StringBuilder) {
        (sb, p) =>
          if (p.startsWith("##")) sb.append(p.drop(2))
          else { if (sb.nonEmpty) sb.append(' '); sb.append(p) }
      }.toString
      assert(rebuilt == texts(r.getLong(0)))
      assert(r.getLong(2) >= r.getLong(1)) // pieces ≥ words, always
    }
  }

  test("vocab derivation is deterministic and count-ranked") {
    val docs = Seq((1L, "aa bb aa cc aa bb dd"), (2L, "aa bb xx")).toDF("doc_id", "text")
    val v1 = WordPiece.trainVocab(docs, topWords = 2, topAffixes = 1, affixLens = Seq(1))
    val v2 = WordPiece.trainVocab(docs, topWords = 2, topAffixes = 1, affixLens = Seq(1))
    assert(v1 == v2)
    // aa (4) and bb (3) are the two most frequent whole words
    assert(Seq("aa", "bb").forall(v1.init.contains))
    assert(!v1.init.contains("cc") || v1.init.contains("c")) // cc only via chars
    // chars present in both roles
    Seq("a", "b", "c", "d", "x").foreach { ch =>
      assert(v1.init.contains(ch) && v1.cont.contains(ch))
    }
  }
}

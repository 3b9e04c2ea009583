package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val df = Seq(Tuple1("hello, world! it's 42 degrees")).toDF("text")
    assert(df.select(TextAnalysis.tokenCount($"text")).head().getLong(0) == 5L)
    // hello , world ! it ' s 42 degrees -> 9
    assert(df.select(TextAnalysis.bpeishTokenCount($"text")).head().getLong(0) == 9L)
  }

  test("quality columns: hand-computed row") {
    val df = TextAnalysis.withQuality(Seq((1L, "aa bb aa cc")).toDF("doc_id", "text"))
    val r = df.head()
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(r.getAs[Long]("n_chars") == 11L)
    assert(r.getAs[Long]("n_distinct_tokens") == 3L)
    assert(r.getAs[Double]("avg_token_len") == 2.0)
    assert(r.getAs[Double]("distinct_ratio") == 0.75)
    assert(r.getAs[Double]("punct_ratio") == 0.0)
    val expectedScore = 0.5 * (4.0 / 64.0) + 0.4 * 0.75 + 0.1 * 1.0
    assert(math.abs(r.getAs[Double]("quality_score") - expectedScore) < 1e-15)
  }

  test("language id: hand-labeled snippets") {
    val snippets = Seq(
      (1L, "the cat sat on the mat and looked at the dog", "en"),
      (2L, "der hund ist nicht mit der katze und das ist gut", "de"),
      (3L, "le chat est dans la maison et les enfants sont pour", "fr"),
      (4L, "el perro es una mascota para los que como pero", "es"),
      (5L, "我 是 一个 学生 他 有 的 是 这 在", "zh"),
      (6L, "zzz qqq xxx", "und"))
    val got = TextAnalysis.withLangId(snippets.toDF("id", "text", "expected"))
      .select("expected", "lang_pred").as[(String, String)].collect()
    got.foreach { case (exp, pred) => assert(pred == exp, s"expected $exp got $pred") }
  }

  test("fingerprint: deterministic, order-sensitive, content-sensitive") {
    val df = Seq((1L, "a b c"), (2L, "a c b"), (3L, "a b c"), (4L, "a b d"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.withFingerprint(df)
      .select("doc_id", "fingerprint").as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(3L))   // same text, same fp
    assert(fps(1L) != fps(2L))   // order matters
    assert(fps(1L) != fps(4L))   // content matters
  }

  test("stopword lists are disjoint enough for a deterministic argmax") {
    val all = TextAnalysis.stopwords.values.flatten.toSeq
    assert(all.size == all.toSet.size, "stopword appearing in two languages breaks scoring")
  }
}

package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.ext.TextAnalysis

/** The streaming per-source Gopher rule-card store: maintained
  * (source, rule) counts must be BIT-IDENTICAL to the one-shot rule
  * card over everything ingested, under any fold split, replays
  * (before AND at the compaction watermark), a mid-stream compaction,
  * and a rebuild; the batch log must expose the per-batch time series. */
class GopherStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType)))

  private lazy val corpus = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "source", "text").limit(120).cache()

  private def cfgFor(st: String) = GopherStreamConfig(
    s"$st/_in_unused", st, s"$st/_ck_unused", schema)

  private def cardOf(st: String): Seq[(String, String, Long, Long)] =
    GopherStream.ruleCard(spark, st).orderBy("source", "rule")
      .as[(String, String, Long, Long)].collect().toSeq

  /** One-shot reference: the same unpivot+aggregate over the full
    * corpus's rule card. */
  private def oneShot(docs: org.apache.spark.sql.DataFrame) =
    TextAnalysis.gopherRules(docs, carryCols = Seq("source"))
      .select(col("source"),
        expr("""stack(7, 'keep', keep,
                'r_alpha_ratio', r_alpha_ratio, 'r_dominance', r_dominance,
                'r_mean_word_len', r_mean_word_len,
                'r_repetition', r_repetition, 'r_stopwords', r_stopwords,
                'r_word_count', r_word_count) AS (rule, pass)"""))
      .groupBy("source", "rule")
      .agg(count(lit(1)).as("n"),
        sum(when(!col("pass"), 1L).otherwise(0L)).as("n_fail"))
      .orderBy("source", "rule")
      .as[(String, String, Long, Long)].collect().toSeq

  test("folds + replays + compaction ≡ one-shot card; rebuild identical") {
    val want = oneShot(corpus)
    assert(want.nonEmpty && want.exists(_._4 > 0),
      "fixture must exercise at least one failing rule")

    val st = tmpDir("gops-a")
    val cfg = cfgFor(st)
    def third(k: Int) = corpus.filter(col("doc_id") % 3 === k)
    GopherStream.processBatch(third(0), 0L, cfg)
    GopherStream.processBatch(third(1), 1L, cfg)
    GopherStream.processBatch(third(1), 1L, cfg) // replay: must not double
    GopherStream.compact(spark, st, upToBatch = 1L)
    GopherStream.processBatch(third(0), 0L, cfg) // at watermark: skipped
    GopherStream.processBatch(third(2), 2L, cfg)
    assert(cardOf(st) == want,
      "maintained card must equal the one-shot aggregation")
    assert(cardOf(st).map(_._2).distinct.sorted == GopherStream.Rules,
      "the store's rule vocabulary is the published Rules list")

    // rebuild with a different split and order — arrival-order-free
    val st2 = tmpDir("gops-b")
    val cfg2 = cfgFor(st2)
    GopherStream.processBatch(corpus.filter(col("doc_id") % 2 === 1), 0L, cfg2)
    GopherStream.processBatch(corpus.filter(col("doc_id") % 2 === 0), 1L, cfg2)
    assert(cardOf(st2) == want, "rebuilt store must derive the identical card")
  }

  test("batch log carries the per-batch time series; totals reconcile") {
    val st = tmpDir("gops-log")
    val cfg = cfgFor(st)
    GopherStream.processBatch(corpus.filter(col("doc_id") % 2 === 0), 0L, cfg)
    GopherStream.processBatch(corpus.filter(col("doc_id") % 2 === 1), 1L, cfg)
    val log = GopherStream.batchLog(spark, st)
    assert(log.select("batch").distinct().as[Long].collect().toSet == Set(0L, 1L))
    // summing the log per (source, rule) equals the card
    val folded = log.groupBy("source", "rule")
      .agg(sum("n").as("n"), sum("n_fail").as("n_fail"))
      .orderBy("source", "rule")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(folded == cardOf(st), "log partials must reconcile with the card")
    // a compaction adds a compacted=N generation beside the batch
    // partitions — the log read must stay pinned to batch=* (an
    // unfiltered read would fail partition discovery) and the card must
    // be unchanged
    val before = cardOf(st)
    GopherStream.compact(spark, st, upToBatch = 1L)
    GopherStream.batchLog(spark, st).collect() // must not throw
    assert(cardOf(st) == before, "compaction must not change the card")
  }
}

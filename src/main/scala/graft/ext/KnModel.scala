package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The pruned-KN SERVING artifact: the entropy-pruned interpolated-KN
  * bigram model ([[NgramLM.knPrunedLogLik]], q205) exported as three
  * bounded parquet tables and scored back WITHOUT raw counts or model
  * re-derivation — what a production deployment actually ships
  * (KenLM writes an ARPA/binary file; the columnar equivalent here is
  * three vocabulary-sized frames a cluster can broadcast or
  * hash-join):
  *
  *   dir/_kn_entries  (w1, w2, p)   kept explicit probabilities
  *   dir/_kn_backoff  (w1, gamma)   renormalized back-off per history
  *   dir/_kn_cont     (w2, pcont)   continuation distribution
  *
  * Fidelity contract: the stored doubles ARE the in-memory scorer's
  * values (computed by the same column expressions over the same
  * integer count frames — [[NgramLM.knPrunedModelFrames]]) and parquet
  * round-trips IEEE doubles bit-for-bit, so [[score]] equals
  * [[NgramLM.knPrunedLogLik]] EXACTLY — q209 drives the full
  * export → load → score loop against q205's DuckDB oracle, which
  * re-derives everything from raw text; any drift in the export, the
  * file format round-trip, or the load-side arms hash-fails.
  *
  * Scale shape: export is the q205 model derivation plus three
  * bounded writes; scoring is three equi-joins of vocabulary-sized
  * frames onto the per-doc gram frame — at 100 TB the model tables
  * broadcast and scoring is map-only per executor. */
object KnModel {

  val EntriesTable = "_kn_entries"
  val BackoffTable = "_kn_backoff"
  val ContTable = "_kn_cont"

  /** Derive the pruned model from `train` and write the artifact. */
  def export(train: DataFrame, eps: Double, dir: String,
             textCol: String = "text"): Unit =
    exportFromCounts(NgramLM.corpusBigrams(train, textCol), eps, dir)

  /** [[export]] from an aggregated (w1, w2, n) count frame — the
    * maintained-store composition ([[graft.streaming.BigramStream
    * .bigramCounts]] feeds it directly). */
  def exportFromCounts(counts: DataFrame, eps: Double, dir: String): Unit = {
    val (entries, backoff, contP) = NgramLM.knPrunedModelFrames(counts, eps)
    entries.write.mode("overwrite").parquet(s"$dir/$EntriesTable")
    backoff.write.mode("overwrite").parquet(s"$dir/$BackoffTable")
    contP.write.mode("overwrite").parquet(s"$dir/$ContTable")
  }

  /** Load the three model frames from an exported artifact. */
  def frames(spark: SparkSession,
             dir: String): (DataFrame, DataFrame, DataFrame) = (
    spark.read.parquet(s"$dir/$EntriesTable"),
    spark.read.parquet(s"$dir/$BackoffTable"),
    spark.read.parquet(s"$dir/$ContTable"))

  /** Score documents against the loaded artifact — bit-identical to
    * [[NgramLM.knPrunedLogLik]] over the corpus the model was exported
    * from (see the fidelity contract above). */
  def score(spark: SparkSession, dir: String, docs: DataFrame,
            idCol: String = "doc_id", textCol: String = "text",
            scale: Int = 4): DataFrame = {
    val (entries, backoff, contP) = frames(spark, dir)
    NgramLM.knScoreFromModel(docs, entries, backoff, contP,
      idCol, textCol, scale)
  }

  /** Artifact row counts (entries, histories, continuation words) —
    * the bounded-size evidence a deployment checks before shipping. */
  def sizes(spark: SparkSession, dir: String): (Long, Long, Long) = {
    val (e, b, c) = frames(spark, dir)
    (e.count(), b.count(), c.count())
  }
}

package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over unigram features — the closed-form
  * stand-in for the fastText-style quality/domain classifiers every
  * large-scale corpus pipeline runs (CCNet's LM filter has [[NgramLM]];
  * this is the labeled-classification counterpart: train on a trusted
  * labeled slice, score the whole corpus, keep/route by predicted
  * class). NB is the one classic text classifier whose training IS
  * aggregation — count frames, no gradient loop — so the fit is exactly
  * recomputable by an independent engine and fully distributable:
  *
  *   score(d, l) = ln P(l) + Σ_w n_w(d) · ln((c(l,w) + 1) / (c(l) + V))
  *
  * with Laplace smoothing over the training vocabulary V.
  *
  * Scale shape: the model is two count frames — (label, w) conditional
  * counts (vocab × labels rows, map-side combinable) and an O(labels)
  * prior frame — documents reduce to per-doc (w, n) before any join,
  * the per-label score is one hash aggregation over docs × labels
  * partial rows, and the argmax runs per doc over `labels` rows (a
  * bounded-width window — labels is a small constant, never a corpus
  * axis). No per-row UDF, no driver-side model object.
  *
  * Determinism: scores are sums of ≤ doc-length ln() terms (1-ulp libm
  * drift ~1e-13 relative), rounded to `scale` decimals BEFORE the
  * argmax; ties after rounding break to the lexicographically smallest
  * label. An independent engine reproduces the prediction exactly.
  */
object NaiveBayes {

  /** The full (doc × label) rounded log-posterior frame both
    * [[trainScore]] and [[prCurve]] read: (doc_id, label, score_pred). */
  def scoreAll(train: DataFrame, score: DataFrame, labelCol: String,
               idCol: String = "doc_id", textCol: String = "text",
               scale: Int = 4): DataFrame = {
    def unigrams(d: DataFrame) =
      d.select(col(idCol).as("doc_id"),
          explode(split(col(textCol), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("n"))
    // model: conditional counts per (label, w) — vocab×labels-sized,
    // built by one map-side-combinable aggregation over the train slice
    val cw = train
      .select(col(labelCol).as("label"),
        explode(split(col(textCol), " ")).as("w"))
      .groupBy("label", "w").agg(count(lit(1)).as("c"))
    val cl = cw.groupBy("label").agg(sum("c").as("cl"))
    // priors: docs per label over the train slice — O(labels)
    val priors = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("nd"))
    val totals = cw.agg(countDistinct(col("w")).as("v"))
      .crossJoin(train.agg(count(lit(1)).as("nt")))
    // docs × labels scoring: each per-doc (w, n) row meets every label
    // (labels is a broadcast constant), the conditional count joins by
    // (label, w). At corpus scale the (label, w) join is the only real
    // shuffle — and it carries pre-aggregated rows, never raw tokens.
    val labelFrame = broadcast(priors.join(cl, Seq("label")))
    unigrams(score)
      .crossJoin(labelFrame)
      .join(cw, Seq("label", "w"), "left")
      .crossJoin(broadcast(totals))
      .groupBy("doc_id", "label")
      .agg(round(
        first(log(col("nd").cast("double") / col("nt"))) +
          sum(col("n") * log((coalesce(col("c"), lit(0L)) + lit(1.0)) /
            (col("cl") + col("v")))),
        scale).as("score_pred"))
  }

  /** Train on `train` (must carry `labelCol`), score every row of
    * `score`. Output: (doc_id, label_pred, score_pred) — the argmax
    * label and its rounded log-posterior. */
  def trainScore(train: DataFrame, score: DataFrame, labelCol: String,
                 idCol: String = "doc_id", textCol: String = "text",
                 scale: Int = 4): DataFrame = {
    val scored = scoreAll(train, score, labelCol, idCol, textCol, scale)
    // argmax over `labels` rows per doc; rounded-tie → smallest label
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_pred").desc, col("label").asc)
    scored
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("doc_id"), col("label").as("label_pred"), col("score_pred"))
  }

  /** One-vs-rest precision/recall sweep — the threshold-calibration
    * step a deployment runs before routing a corpus by classifier
    * score. Per doc in `eval`, margin = score(positive) −
    * max(score(other)) over ROUNDED scores (so any engine reproduces
    * every margin exactly); per threshold t in `thresholds`, the doc
    * predicts positive iff margin ≥ t. Output one row per threshold:
    * (threshold, tp, fp, fn, precision, recall) with the ratios
    * rounded to `scale` (0-denominator → precision/recall 0).
    *
    * Scale shape: scoring is [[scoreAll]] (the (label, w) join is the
    * only real shuffle); margins are one labels-per-doc aggregation;
    * the sweep crosses the O(eval) margin frame with a broadcast
    * threshold grid and reduces map-side — thresholds never multiply
    * the shuffle. */
  /** One-vs-rest margin per eval doc — `score(positive) − max(score(
    * other))` over ROUNDED scores — with the boolean truth label.
    * Shared by [[prCurve]] and [[reliability]]. */
  def marginFrame(train: DataFrame, eval: DataFrame, labelCol: String,
                  positive: String, idCol: String = "doc_id",
                  textCol: String = "text", scale: Int = 4): DataFrame =
    scoreAll(train, eval, labelCol, idCol, textCol, scale)
      .groupBy("doc_id")
      .agg(
        max(when(col("label") === positive, col("score_pred"))).as("__pos"),
        max(when(col("label") =!= positive, col("score_pred"))).as("__rest"))
      .select(col("doc_id"), (col("__pos") - col("__rest")).as("margin"))
      .join(eval.select(col(idCol).as("doc_id"),
        (col(labelCol) === positive).as("truth")), Seq("doc_id"))

  def prCurve(train: DataFrame, eval: DataFrame, labelCol: String,
              positive: String, thresholds: Seq[Double],
              idCol: String = "doc_id", textCol: String = "text",
              scale: Int = 4): DataFrame = {
    val margins = marginFrame(train, eval, labelCol, positive, idCol, textCol, scale)
    val spark = train.sparkSession
    import spark.implicits._
    val grid = broadcast(thresholds.toDF("threshold"))
    margins.crossJoin(grid)
      .groupBy("threshold")
      .agg(
        sum(when(col("margin") >= col("threshold") && col("truth"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("margin") >= col("threshold") && !col("truth"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("margin") < col("threshold") && col("truth"), 1L)
          .otherwise(0L)).as("fn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") === 0, lit(0.0))
          .otherwise(round(col("tp") / (col("tp") + col("fp")), scale))
          .as("precision"),
        when(col("tp") + col("fn") === 0, lit(0.0))
          .otherwise(round(col("tp") / (col("tp") + col("fn")), scale))
          .as("recall"))
  }

  /** Calibration (reliability) diagram for the one-vs-rest margin:
    * margins band into fixed-width bins (clamped to ±`maxBin`) and each
    * bin reports how often the positive class is actually true — a
    * well-calibrated classifier's `frac_true` rises monotonically
    * through zero. This is the diagnostic read BEFORE picking the
    * [[prCurve]] operating point: a threshold means nothing if the
    * margin bands aren't ordered. Margins come from ROUNDED scores, the
    * bin is floor arithmetic on identical doubles, counts are integers
    * — every row engine-reproducible. One O(eval) margin pass + one
    * O(bins) aggregate. */
  def reliability(train: DataFrame, eval: DataFrame, labelCol: String,
                  positive: String, binWidth: Double = 5.0, maxBin: Int = 10,
                  idCol: String = "doc_id", textCol: String = "text",
                  scale: Int = 4): DataFrame = {
    require(binWidth > 0 && maxBin >= 1)
    marginFrame(train, eval, labelCol, positive, idCol, textCol, scale)
      .select(
        least(greatest(floor(col("margin") / binWidth), lit(-maxBin.toDouble)),
          lit(maxBin.toDouble)).cast("long").as("bin"),
        col("truth"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("truth"), 1L).otherwise(0L)).as("n_true"))
      .withColumn("frac_true", round(col("n_true").cast("double") / col("n"), scale))
  }
}

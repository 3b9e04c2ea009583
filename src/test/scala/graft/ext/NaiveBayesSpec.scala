package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class NaiveBayesSpec extends SparkTestBase {
  import spark.implicits._

  private val train = Seq(
    (1L, "cat cat dog", "pets"),
    (2L, "cat mouse", "pets"),
    (3L, "stock bond stock", "finance"),
  ).toDF("doc_id", "text", "lang")

  test("trainScore: hand-computed posteriors pick the right class") {
    // model: cw(pets) = {cat->3, dog->1, mouse->1} cl=5; cw(finance) =
    // {stock->2, bond->1} cl=3; V=5; priors pets=2/3, finance=1/3
    val score = Seq((10L, "cat dog"), (11L, "stock stock")).toDF("doc_id", "text")
    val got = NaiveBayes.trainScore(train, score, "lang")
      .orderBy("doc_id")
      .as[(Long, String, Double)].collect().toSeq
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val petsCatDog = math.log(2.0 / 3) +
      math.log(4.0 / 10) + math.log(2.0 / 10)      // (3+1)/(5+5), (1+1)/(5+5)
    val finStock = math.log(1.0 / 3) + 2 * math.log(3.0 / 8) // (2+1)/(3+5) twice
    assert(got.map(t => (t._1, t._2)) == Seq((10L, "pets"), (11L, "finance")))
    assert(got(0)._3 == r4(petsCatDog))
    assert(got(1)._3 == r4(finStock))
  }

  test("unseen words score via smoothing; rounded ties break to smallest label") {
    // "zebra" appears in no class: every class scores it 1/(cl+V); the
    // prior decides — pets (2 docs) beats finance (1 doc). Equal-prior
    // engineered tie: train with one doc per class and a shared token →
    // identical rounded scores, prediction must be the smaller label.
    val score = Seq((20L, "zebra")).toDF("doc_id", "text")
    val gotPrior = NaiveBayes.trainScore(train, score, "lang").head()
    assert(gotPrior.getAs[String]("label_pred") == "pets")

    val tied = Seq((1L, "tok", "b_class"), (2L, "tok", "a_class"))
      .toDF("doc_id", "text", "lang")
    val gotTie = NaiveBayes.trainScore(tied, Seq((30L, "tok")).toDF("doc_id", "text"), "lang").head()
    assert(gotTie.getAs[String]("label_pred") == "a_class")
  }

  test("held-out slice of a planted corpus classifies by its token distribution") {
    // 40 docs, two classes with disjoint dominant vocabularies plus
    // shared noise tokens; train on 80%, every held-out doc must land
    // in its own class.
    val docs = (0 until 40).map { i =>
      val cls = if (i % 2 == 0) "red" else "blue"
      val dom = if (i % 2 == 0) "apple berry cherry" else "steel iron copper"
      (i.toLong, s"$dom common$i shared filler", cls)
    }.toDF("doc_id", "text", "lang")
    val got = NaiveBayes.trainScore(
        docs.filter(col("doc_id") % 5 =!= 0), docs, "lang")
      .as[(Long, String, Double)].collect()
    assert(got.length == 40)
    got.foreach { case (id, pred, _) =>
      assert(pred == (if (id % 2 == 0) "red" else "blue"), s"doc $id")
    }
  }

  test("prCurve: counts partition the eval slice; recall falls and precision rises with t") {
    // planted separable corpus: 'red' docs use red vocab, 'blue' blue
    val docs = (1L to 60L).map { i =>
      val lbl = if (i % 2 == 0) "red" else "blue"
      val words = if (lbl == "red") "crimson scarlet ruby" else "azure navy cobalt"
      (i, words + " common filler", lbl)
    }.toDF("doc_id", "text", "lang")
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val eval = docs.filter(col("doc_id") % 5 === 0)
    val nEval = eval.count()
    val nPos = eval.filter(col("lang") === "red").count()
    val grid = Seq(-1000.0, 0.0, 1000.0)
    val got = NaiveBayes.prCurve(train, eval, "lang", "red", grid)
      .orderBy("threshold")
      .as[(Double, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._1) == grid)
    // every row: tp + fn = positives; tp + fp <= eval size
    got.foreach { case (t, tp, fp, fn, p, r) =>
      assert(tp + fn == nPos, s"t=$t")
      assert(tp + fp <= nEval)
      if (tp + fp > 0) assert(math.abs(p - tp.toDouble / (tp + fp)) < 1e-4)
      if (tp + fn > 0) assert(math.abs(r - tp.toDouble / (tp + fn)) < 1e-4)
    }
    // t = -inf-ish: everything predicted positive → recall 1, precision = base rate
    assert(got.head._6 == 1.0 && got.head._2 == nPos)
    // t = +inf-ish: nothing predicted positive → tp 0
    assert(got.last._2 == 0L && got.last._6 == 0.0)
    // the separable middle threshold: perfect classification
    val mid = got(1)
    assert(mid._5 == 1.0 && mid._6 == 1.0, s"separable corpus at t=0: $mid")
  }

  test("reliability: separable corpus → bins ordered 0 to 1 through zero") {
    import spark.implicits._
    val docs = (1L to 60L).map { i =>
      val lbl = if (i % 2 == 0) "red" else "blue"
      val words = if (lbl == "red") "crimson scarlet ruby" else "azure navy cobalt"
      (i, words + " common filler", lbl)
    }.toDF("doc_id", "text", "lang")
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val eval = docs.filter(col("doc_id") % 5 === 0)
    val got = NaiveBayes.reliability(train, eval, "lang", "red",
        binWidth = 5.0, maxBin = 10)
      .orderBy("bin").as[(Long, Long, Long, Double)].collect().toSeq
    // counts partition the eval slice
    assert(got.map(_._2).sum == eval.count())
    // a separable corpus: every negative-margin bin is pure non-positive,
    // every non-negative bin pure positive
    got.foreach { case (bin, n, nTrue, frac) =>
      if (bin < 0) assert(nTrue == 0L, s"bin $bin impure: $nTrue/$n")
      else assert(nTrue == n, s"bin $bin impure: $nTrue/$n")
      assert(frac == math.rint(nTrue.toDouble / n * 10000) / 10000)
    }
    // both sides of zero are populated (the diagram is informative)
    assert(got.exists(_._1 < 0) && got.exists(_._1 >= 0))
    // clamping: no bin outside ±10
    assert(got.forall(r => r._1 >= -10L && r._1 <= 10L))
  }
}

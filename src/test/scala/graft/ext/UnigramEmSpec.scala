package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The unigram-LM EM trainer ([[Unigram.emTrainFromCounts]]) and the
  * segmentation kernel it explodes ([[graft.functions.UnigramSegment]]):
  * backtrace determinism (equal-cost tie → longest piece, single-char
  * fallback), a hand-built corpus where EM prunes a frequent-but-
  * always-dominated substring and strictly beats the frequency
  * heuristic's segmentation, replay determinism, and fixed-point
  * stability of the second iteration. */
class UnigramEmSpec extends SparkTestBase {
  import spark.implicits._

  private val K = Unigram.CostScale

  /** Segment one word under an inventory given as (piece, WEIGHT)
    * pairs (costs = K − weight, the trainer's convention). */
  private def segment(word: String, inv: Seq[(String, Long)]): Seq[String] =
    Seq(word).toDF("w")
      .select(graft.functions.UnigramFunctions.unigram_segment(
        col("w"), inv.map(_._1), inv.map { case (_, w) => K - w }, K).as("s"))
      .head().getSeq[String](0).toList

  test("backtrace tie-break: equal-cost segmentations resolve to the " +
      "longest piece achieving the optimum at each end position") {
    // "abc": ab+c and a+bc tie on piece count AND total weight (10 vs
    // 10) — the backtrace walks from the end and takes the LONGEST
    // piece achieving best[p], so bc wins over c, then a closes.
    val inv = Seq(("a", 5L), ("b", 1L), ("c", 5L), ("ab", 5L), ("bc", 5L))
    assert(segment("abc", inv) === Seq("a", "bc"))
    // and the choice is a pure function of (word, inventory): repeated
    // evaluation (fresh plan, fresh codegen) cannot flip the tie
    assert(segment("abc", inv) === Seq("a", "bc"))
  }

  test("single-char fallback: an uncovered position consumes one char " +
      "at cost K, exactly where no piece matches") {
    assert(segment("xy", Seq(("x", 3L))) === Seq("x", "y"))
    assert(segment("zz", Seq(("a", 1L))) === Seq("z", "z"))
    assert(segment("", Seq(("a", 1L))) === Seq.empty)
  }

  test("segment is consistent with the stats kernel: emitted piece " +
      "count equals the (unique) optimal n_pieces, cost re-adds") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull).limit(40)
    val inv = Unigram.trainPieces(docs)
    val costOf = inv.toMap
    val stats = Unigram.viterbiStats(docs, inv).orderBy("doc_id").collect()
    val segged = docs
      .select(col("doc_id"), explode(filter(split(col("text"), " "),
        t => t =!= "")).as("w"))
      .select(col("doc_id"), graft.functions.UnigramFunctions.unigram_segment(
        col("w"), inv.map(_._1), inv.map(_._2), K).as("s"))
      .groupBy("doc_id")
      .agg(sum(size(col("s"))).as("np"),
        sum(aggregate(col("s"), lit(0L),
          (acc, p) => acc + coalesce(
            element_at(map(costOf.toSeq.flatMap { case (k, v) =>
              Seq(lit(k), lit(v)) }: _*), p), lit(K)))).as("cost"))
      .orderBy("doc_id").collect()
    assert(stats.length === segged.length)
    stats.zip(segged).foreach { case (st, sg) =>
      assert(st.getLong(3) === sg.getLong(1), s"n_pieces for doc ${st.get(0)}")
      assert(st.getLong(2) === sg.getLong(2), s"cost for doc ${st.get(0)}")
    }
  }

  test("EM prunes a frequent-but-always-dominated substring; the EM " +
      "inventory strictly beats the frequency heuristic's segmentation") {
    // Corpus words: cab×10, ca×8, xy×9, b×3 (maxLen = 2).
    //  - substring weights: ca 18, ab 10, xy 9 → the frequency
    //    heuristic at width 2 keeps {ca, ab}: "ab" outweighs "xy" by
    //    raw occurrence, but every "ab" occurrence sits inside "cab"
    //    where [ca, b] (weight 18+13=31) beats [c, ab] (18+10=28) — so
    //    "ab" is NEVER used, a wasted inventory slot.
    //  - EM E-step usage: ca 18, b 13, xy 9, ab 0 → M-step at target 2
    //    keeps {ca, xy}.
    val docs = ((1 to 10).map(i => (i.toLong, "cab")) ++
      (11 to 18).map(i => (i.toLong, "ca")) ++
      (19 to 27).map(i => (i.toLong, "xy")) ++
      (28 to 30).map(i => (i.toLong, "b"))).toDF("doc_id", "text")
    val counts = WordPiece.wordCounts(docs)
    val em = Unigram.emTrainFromCounts(counts,
      topSeed = 3, target = 2, maxLen = 2, iters = 2)
    assert(em.seed.filter(_._1.length >= 2).map(_._1).toSet
      === Set("ab", "ca", "xy"), "seed admits all three candidates")
    assert(em.pieces.filter(_._1.length >= 2).map(_._1).toSet
      === Set("ca", "xy"), "EM prunes the dominated ab, admits xy")
    val heur = Unigram.collectPieces(
      Unigram.pieceFrameFromCounts(counts, topSub = 2, maxLen = 2))
    assert(heur.filter(_._1.length >= 2).map(_._1).toSet === Set("ab", "ca"),
      "the frequency heuristic at the same width keeps the dominated ab")
    def totalPieces(inv: Seq[(String, Long)]): Long =
      Unigram.viterbiStats(docs, inv).agg(sum("n_pieces")).head().getLong(0)
    // hand count — EM {ca, xy}: cab→2 ×10, ca→1 ×8, xy→1 ×9, b→1 ×3 = 40
    //         heuristic {ca, ab}: cab→2 ×10, ca→1 ×8, xy→2 ×9, b→1 ×3 = 49
    assert(totalPieces(em.pieces) === 40L)
    assert(totalPieces(heur) === 49L)
  }

  test("EM replay determinism and iteration fixed point") {
    val docs = ((1 to 10).map(i => (i.toLong, "cab")) ++
      (11 to 18).map(i => (i.toLong, "ca")) ++
      (19 to 27).map(i => (i.toLong, "xy")) ++
      (28 to 30).map(i => (i.toLong, "b"))).toDF("doc_id", "text")
    val counts = WordPiece.wordCounts(docs)
    val a = Unigram.emTrainFromCounts(counts, 3, 2, 2, iters = 2)
    val b = Unigram.emTrainFromCounts(counts, 3, 2, 2, iters = 2)
    // compare the semantic fields (iterSecs is wall clock, never equal)
    assert((a.seed, a.iterations) === ((b.seed, b.iterations)),
      "independent runs must agree bit-for-bit")
    // usage under the pruned inventory is unchanged on this corpus →
    // iteration 2 reproduces iteration 1 exactly (a fixed point)
    assert(a.iterations(0) === a.iterations(1))
    // inventory invariants: every char kept, costs in (0, K]
    val chars = Set("a", "b", "c", "x", "y")
    assert(chars.subsetOf(a.pieces.map(_._1).toSet))
    assert(a.pieces.forall { case (_, c) => c >= 1 && c <= K })
    // zero-usage singles ride at exactly cost K (weight 0)
    assert(a.pieces.toMap.apply("a") === K)
  }

  test("gradual prune schedule: shrinkPermille keeps ceil(m·s/1000) multis " +
      "per round down to target; 0 reproduces the straight-to-target cut") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull).limit(80)
    val counts = WordPiece.wordCounts(docs).cache()
    try {
      // ceil-0.75 walk from 12 multis: 12→9→7→6→5→4→3 — seven rounds
      val sched = Unigram.emTrainFromCounts(counts, topSeed = 16, target = 3,
        maxLen = 4, iters = 7, shrinkPermille = 750)
      // multis per iteration: bounded above by the ceil schedule (usage
      // can drop pieces FASTER — zero-usage multis always go), bounded
      // below by target, non-increasing, and at target by the end
      val multis = sched.iterations.map(_.count(_._1.length >= 2))
      val seedMultis = sched.seed.count(_._1.length >= 2)
      (seedMultis +: multis).sliding(2).foreach { case Seq(prev, cur) =>
        val cap = math.max(3, (prev * 750 + 999) / 1000)
        // lower bound: the schedule never undershoots the target while
        // the previous round was still above it (ADVICE r14: the old
        // `cur >= min(3, cur)` was a tautology)
        assert(cur <= cap && cur >= math.min(3, prev),
          s"schedule violated: $prev -> $cur (cap $cap)")
      case _ => ()
      }
      assert(multis.zip(multis.tail).forall { case (a, b) => b <= a })
      assert(multis.last == 3, s"schedule must reach target: $multis")
      // default (0) is the straight cut: iteration 1 already at target
      val straight = Unigram.emTrainFromCounts(counts, topSeed = 16,
        target = 3, maxLen = 4, iters = 1)
      assert(straight.iterations.head.count(_._1.length >= 2) <= 3)
    } finally { counts.unpersist(false); () }
  }

  test("EM over a corpus slice: deterministic, chars covered, and the " +
      "final stats invariant under input partitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull).limit(80)
    val em = Unigram.emTrain(docs, topSeed = 12, target = 6, iters = 2)
    val em2 = Unigram.emTrain(docs.repartition(5),
      topSeed = 12, target = 6, iters = 2)
    assert((em.seed, em.iterations) === ((em2.seed, em2.iterations)),
      "training must be partitioning-invariant")
    assert(em.pieces.count(_._1.length >= 2) <= 6)
    val a = Unigram.viterbiStats(docs, em.pieces).orderBy("doc_id").collect()
    val b = Unigram.viterbiStats(docs.repartition(7), em.pieces)
      .orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }
}

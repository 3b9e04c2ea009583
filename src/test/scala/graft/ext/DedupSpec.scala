package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.VectorFunctions.simhash64

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon"

  /** doc 1 = base; doc 2 = one token changed (near-dup); doc 3 = unrelated. */
  private val docs = Seq(
    (1L, base),
    (2L, base.replace("theta", "THETA2")),
    (3L, "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"),
    (4L, base)) // exact duplicate of 1
    .toDF("doc_id", "text")

  test("shingles: n-grams, short-text fallback") {
    val sh = Seq(Tuple1("a b c d")).toDF("text")
      .select(Dedup.shingles($"text", 3).as("sh")).head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq(Tuple1("a b")).toDF("text")
      .select(Dedup.shingles($"text", 3).as("sh")).head().getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("minhash near-dup: finds planted near-dup and exact dup, skips unrelated") {
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        shingleSize = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs.contains((1L, 4L)) && pairs((1L, 4L)) == 1.0) // exact dup
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) > 0.5)  // near dup
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L }) // unrelated absent
  }

  test("minhash jaccard matches hand-computed shingle-set jaccard") {
    // 20 tokens, 3-shingles: 18 shingles each; one token change breaks 3
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        shingleSize = 3, bands = 16, rowsPerBand = 4, threshold = 0.1)
      .filter($"id1" === 1 && $"id2" === 2).select("jaccard").as[Double].head()
    val expected = 15.0 / 21.0 // |A∩B| = 18-3, |A∪B| = 18+3
    assert(math.abs(pairs - expected) < 1e-12)
  }

  test("ngramJaccard + containment on explicit pairs") {
    val rows = Dedup.ngramJaccard(docs, "doc_id", "text", n = 1,
        pairs = Seq((1L, 4L), (1L, 3L)).toDF("id1", "id2"))
      .select("id1", "id2", "jaccard", "containment1", "containment2")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4, t._5)).toMap
    assert(rows((1L, 4L)) == ((1.0, 1.0, 1.0)))
    assert(rows((1L, 3L)) == ((0.0, 0.0, 0.0)))
    // asymmetric case: doc fully contained in a longer doc
    val contained = Seq((100L, "alpha beta gamma"), (200L, base)).toDF("doc_id", "text")
    val c = Dedup.ngramJaccard(contained, "doc_id", "text", n = 1,
        pairs = Seq((100L, 200L)).toDF("id1", "id2"))
      .select("jaccard", "containment1", "containment2")
      .as[(Double, Double, Double)].head()
    assert(c._2 == 1.0)           // all of the short doc is in the long one
    assert(c._1 == 3.0 / 20.0)    // jaccard stays low
  }

  test("simhash: deterministic, exact dups at hamming 0, pair set self-consistent") {
    val fps = docs.select($"doc_id", simhash64(split($"text", " ")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(4L)) // identical text -> identical fingerprint
    val got = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // expected = every pair whose true hamming distance <= 3 (recall is
    // guaranteed by the 4-chunk pigeonhole; precision by the exact filter)
    val ids = fps.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      if java.lang.Long.bitCount(fps(i) ^ fps(j)) <= 3
    } yield (i, j)).toSet
    assert(got == expected)
    assert(got.contains((1L, 4L)))
  }

  test("optimalBands: S-curve threshold lands on the requested jaccard") {
    assert(Dedup.optimalBands(64, 0.5) == (16, 4)) // (1/16)^(1/4) == 0.5 exactly
    val (b, r) = Dedup.optimalBands(128, 0.8)
    assert(b * r == 128)
    assert(math.abs(math.pow(1.0 / b, 1.0 / r) - 0.8) < 0.15)
    // auto variant finds the same planted dups as the manual parameters
    val auto = Dedup.minhashNearDupPairsAuto(docs, "doc_id", "text", threshold = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(auto.contains((1L, 4L)) && auto.contains((1L, 2L)))
  }

  test("bandsForRecall: guarantees recall at the threshold, maximizing rows per band") {
    // at jaccard 0.5 the optimalBands split (16x4) recalls only ~64% — the
    // recall-guaranteeing picker must refuse it and take 32x2 (~0.9999)
    assert(Dedup.lshRecallAt(16, 4, 0.5) < 0.7)
    assert(Dedup.bandsForRecall(64, 0.5, minRecall = 0.999) == (32, 2))
    assert(Dedup.lshRecallAt(32, 2, 0.5) > 0.999)
    // at threshold 0.7 with 64 hashes, r=4 (b=16) already recalls ~0.988:
    // picker keeps the cheaper large-r split once the bar allows it
    assert(Dedup.bandsForRecall(64, 0.7, minRecall = 0.98) == (16, 4))
    // unreachable bar errors instead of silently under-delivering
    assertThrows[IllegalArgumentException](Dedup.bandsForRecall(2, 0.1, 0.999))
  }

  test("clusterPairs: chains and separate clusters, both paths") {
    // chain 1-2, 2-3, 3-4 (diameter 3) + separate pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id1", "id2")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L)
    // driver union-find path
    val fast = Dedup.clusterPairs(pairs)
      .select("id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(fast == expected)
    // distributed large-star/small-star path must agree
    val dist = Dedup.distributedClusterPairs(pairs, maxIterations = 10)
      .select("id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(dist == expected)
  }

  test("distributedClusterPairs: 200-node chain converges in O(log n) rounds") {
    // a path graph is the diameter worst case: min-label propagation
    // needs ~200 rounds here; large-star/small-star must finish within
    // the DEFAULT iteration budget (log-round convergence is the point)
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("id1", "id2")
    val out = Dedup.distributedClusterPairs(chain, maxIterations = 10)
      .select("id", "cluster_id").as[(Long, Long)].collect()
    assert(out.length == 200)
    assert(out.forall(_._2 == 0L))
  }

  test("distributedClusterPairs: equals union-find on random graphs") {
    // property check across shapes: sparse, dense-ish, hub-heavy, and
    // reversed/duplicated edges (input orientation must not matter)
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val n = 60 + trial * 30
      val m = n * (trial % 2 + 1)
      val raw = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val edges = (raw ++ raw.map(_.swap)).filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val df = edges.toDF("id1", "id2")
        val fast = Dedup.clusterPairs(df)
          .select("id", "cluster_id").as[(Long, Long)].collect().toMap
        val dist = Dedup.distributedClusterPairs(df, maxIterations = 15)
          .select("id", "cluster_id").as[(Long, Long)].collect().toMap
        assert(dist == fast, s"trial $trial: star CC != union-find")
      }
    }
  }

  test("dedupCorpus keeps one representative per near-dup cluster") {
    // docs 1, 2 (near-dup of 1), 4 (exact dup of 1) collapse to doc 1;
    // doc 3 unrelated survives
    val out = Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L))
  }

  test("exact + keepFirst dedup") {
    val df = Seq((1L, "a", 3L), (1L, "a", 1L), (2L, "b", 2L)).toDF("k", "v", "ts")
    assert(Dedup.exact(df).count() == 3)
    assert(Dedup.exact(df.select("k", "v")).count() == 2)
    val first = Dedup.keepFirst(df, Seq("k"), Seq("ts"))
      .select("k", "ts").as[(Long, Long)].collect().toMap
    assert(first == Map(1L -> 1L, 2L -> 2L))
  }
  test("hot-bucket cap bounds the LSH self-join; normal pairs survive") {
    // 40 byte-identical docs all hash into the same buckets in EVERY band
    // (the degenerate case that makes the self-join quadratic); two near-
    // dup docs elsewhere must still pair up when the hot bucket is capped
    val hot = (100L until 140L).map(i => (i, "same same same same same same same same"))
    val corpus = (Seq((1L, base), (2L, base.replace("theta", "THETA2"))) ++ hot)
      .toDF("doc_id", "text")

    val capped = Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
      threshold = 0.5, maxBucketSize = 10)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L)),
      s"capped run must keep the genuine near-dup pair and drop the hot bucket, got $capped")

    val uncapped = Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
      threshold = 0.5, maxBucketSize = 0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(uncapped.contains(1L -> 2L) && uncapped.size == 1 + 40 * 39 / 2,
      s"uncapped run emits the full quadratic hot-bucket pair set, got ${uncapped.size}")
  }

  test("dedupCorpusKeepBest survives the highest-scored doc per cluster") {
    // docs 1, 2, 4 form one near-dup cluster (2 is a one-token variant of
    // the identical pair 1/4); doc 3 is unrelated. Scores favor doc 2.
    val scored = docs.withColumn("score",
      when($"doc_id" === 2L, 10.0).otherwise($"doc_id".cast("double")))
    val kept = Dedup.dedupCorpusKeepBest(scored, "doc_id", "text", "score",
        threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L), s"got $kept")
    // min-id semantics for contrast: keeps doc 1
    val keptMin = Dedup.dedupCorpus(scored, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(keptMin == Set(1L, 3L), s"got $keptMin")
  }

  test("mass-duplicate groups over the LSH bucket cap collapse to one survivor") {
    // 3× the bucket cap byte-identical copies: LSH alone drops the hot
    // bucket (capGroupSize) and would keep EVERY copy — the exact-dup
    // pre-pass must collapse them before LSH ever sees them
    val cap = 10
    val mass = (100L until 130L).map(i => (i, "same same same same same same same same"))
    val corpus = (Seq((1L, base), (2L, base.replace("theta", "THETA2"))) ++ mass)
      .toDF("doc_id", "text")
    val out = Dedup.dedupCorpus(corpus, "doc_id", "text", threshold = 0.5,
      maxBucketSize = cap).select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 100L), s"got $out")
    // keep-best: the highest-scored copy of the mass group survives
    val scored = corpus.withColumn("score",
      when($"doc_id" === 115L, 999.0).otherwise($"doc_id".cast("double")))
    val best = Dedup.dedupCorpusKeepBest(scored, "doc_id", "text", "score",
      threshold = 0.5, maxBucketSize = cap).select("doc_id").as[Long].collect().toSet
    assert(best == Set(2L, 115L), s"got $best")
  }

  test("dedupIncrement: incoming batch deduped against corpus and itself") {
    // existing corpus: base doc + an unrelated doc
    val existing = Seq((1L, base),
      (3L, "one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, base),                               // exact dup of corpus doc 1 -> drop
      (11L, base.replace("theta", "THETA2")),    // near-dup of corpus doc 1 -> drop
      (12L, "completely fresh words about entirely different topics " +
        "nothing shared with anything stored before in any way at all"),
      (13L, "completely fresh words about entirely different topics " +
        "nothing shared with anything stored before in any way at all"), // dup of 12 -> drop
      (14L, "another genuinely new document with its own unique vocabulary " +
        "covering topics absent from the corpus and the batch alike"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupIncrement(existing, incoming, "doc_id", "text",
        threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(12L, 14L), s"got $kept")
    // the pass is idempotent: appending survivors and re-running the same
    // batch keeps nothing
    val appended = existing.unionByName(incoming.filter($"doc_id".isin(12L, 14L)))
    val rerun = Dedup.dedupIncrement(appended, incoming, "doc_id", "text",
        threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(rerun.isEmpty, s"rerun must drop everything, got $rerun")
  }

  test("fused dedupIncrement equals the sequential within-then-cross composition") {
    // randomized corpus with planted exact/near dups in every direction:
    // the fused single-LSH-pass rewrite must keep EXACTLY the survivor
    // set of the three-pass composition it replaced
    val rnd = new scala.util.Random(7)
    val vocab = Vector.tabulate(60)(i => s"w$i")
    def doc() = Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    def mutate(t: String, tag: String) = {
      val toks = t.split(" "); toks(rnd.nextInt(toks.length)) = tag; toks.mkString(" ")
    }
    val corpusRows = (1L to 40L).map(i => (i, doc()))
    val freshRows = (101L to 110L).map(i => (i, doc()))
    val batchRows = freshRows ++
      corpusRows.take(4).map { case (i, t) => (200L + i, t) } ++            // exact cross dups
      corpusRows.slice(4, 8).map { case (i, t) => (300L + i, mutate(t, s"m$i")) } ++ // near cross dups
      freshRows.take(3).map { case (i, t) => (400L + i, t) } ++             // exact within dups
      freshRows.slice(3, 6).map { case (i, t) => (500L + i, mutate(t, s"n$i")) } // near within dups
    val existing = corpusRows.toDF("doc_id", "text")
    val incoming = rnd.shuffle(batchRows).toDF("doc_id", "text")

    val fused = Dedup.dedupIncrement(existing, incoming, "doc_id", "text",
      threshold = 0.5).select("doc_id").as[Long].collect().toSet

    // the pre-fusion reference: exact cross-drop, within-batch
    // dedupCorpus, then crossNearDupPairs over the survivors
    val existingHashes = existing.select(xxhash64($"text").as("__th")).distinct()
    val fresh = incoming.withColumn("__th", xxhash64($"text"))
      .join(existingHashes, Seq("__th"), "left_anti").drop("__th")
    val within = Dedup.dedupCorpus(fresh, "doc_id", "text", threshold = 0.5)
    val crossDups = Dedup.crossNearDupPairs(existing, within, "doc_id", "text",
        threshold = 0.5)
      .select($"incoming_id".as("doc_id")).distinct()
    val sequential = within.join(crossDups, Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet

    assert(fused == sequential, s"fused $fused != sequential $sequential")
    // the equivalence must be over a batch where every pass really fired:
    // every planted duplicate (exact/near × cross/within) must be gone
    val planted = Set(201L, 202L, 203L, 204L, 305L, 306L, 307L, 308L,
      501L, 502L, 503L, 604L, 605L, 606L)
    assert(planted.intersect(fused).isEmpty, s"planted dups survived: ${planted.intersect(fused)}")
    assert(fused.nonEmpty && fused.size < batchRows.size)
  }

  test("presigged cross pass equals the recompute-everything cross pass") {
    val existing = Seq((1L, base),
      (3L, "one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, base),
      (11L, base.replace("theta", "THETA2")),
      (12L, "completely fresh words about entirely different topics"))
      .toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("corpus_id", "incoming_id").as[(Long, Long)].collect().toSet
    val full = pairs(Dedup.crossNearDupPairs(existing, incoming,
      "doc_id", "text", threshold = 0.5))
    val presigged = pairs(Dedup.crossNearDupPairsPresigged(
      Dedup.signatures(existing, "doc_id", "text"), existing, incoming,
      "doc_id", "text", threshold = 0.5))
    assert(presigged == full)
    assert(full.nonEmpty) // the equivalence must be over real pairs
  }

  test("decontaminate flags embedded benchmark items, ignores unrelated docs") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      // benchmark embedded verbatim inside filler -> containment 1.0
      (1L, "xx yy alpha beta gamma delta epsilon zz ww"),
      // partial overlap (3 of 5 tokens) -> below threshold
      (2L, "alpha beta gamma nope nope"),
      (3L, "one two three four five six seven")).toDF("doc_id", "text")
    val hits = Dedup.decontaminate(corpus, bench, "doc_id", "text",
        n = 3, containment = 0.8)
      .select("doc_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(hits == Set((1L, 100L)), s"got $hits")

    // benchmark side too big to broadcast (forced via threshold 0): the
    // shuffle-hash fallback must produce the identical result set
    val fallback = Dedup.decontaminate(corpus, bench, "doc_id", "text",
      n = 3, containment = 0.8, broadcastMaxShingles = 0L)
    val plan = fallback.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), s"fallback must not broadcast:\n$plan")
    assert(plan.contains("ShuffledHashJoin"), s"expected shuffle hash join:\n$plan")
    val fbHits = fallback.select("doc_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(fbHits == hits)
  }

  test("edit-distance near-dup: indel-shifted pairs are found (Pass-Join recall)") {
    val base = "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGHIJKL" // 48 chars
    require(base.length == 48)
    val corpus = Seq(
      (1L, base + " tail"),
      (2L, base.substring(1) + "XY tail"),          // DELETE 1st char: every positional segment shifts
      (3L, "Z" + base + " tail"),                   // INSERT at front: same, other direction
      (4L, base.replace('m', '#') + " tail"),       // 1 substitution
      (5L, "completely different content that is long enough xx"),
      (6L, "short"))                                 // under prefixLen: excluded
      .toDF("doc_id", "text")
    val got = Dedup.editDistanceNearDupPairs(corpus, "doc_id", "text",
        prefixLen = 48, maxDist = 2)
      .select("id1", "id2", "dist").as[(Long, Long, Long)].collect().toSet
    // ground truth by brute force over the same prefixes
    val prefixes = Seq(1L, 2L, 3L, 4L, 5L).map { id =>
      id -> corpus.filter($"doc_id" === id).as[(Long, String)].head()._2.substring(0, 48)
    }
    val naive = (for {
      (i, pi) <- prefixes; (j, pj) <- prefixes if i < j
      d = levenshteinRef(pi, pj) if d <= 2
    } yield (i, j, d.toLong)).toSet
    assert(got == naive, s"engine=$got truth=$naive")
    // the indel pairs are the ones positional-only blocking would miss
    // (dist 2: the shift plus the char the 48-char window gains/loses)
    assert(got.contains((1L, 2L, 2L)) && got.contains((1L, 3L, 2L)))
    assert(got.contains((1L, 4L, 1L)))
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L), "short docs must not participate")
  }

  test("repeatedSpans: cross-doc k-gram accounting with deterministic anchor") {
    val corpus = Seq(
      (1L, "a b c d e f g h X"),
      (2L, "Z a b c d e f g h"),
      (3L, "a b c d e f g h a b c d e f g h"),
      (4L, "totally unrelated short text"))
      .toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(corpus, "doc_id", "text", k = 8, minDocs = 2)
      .select("gram", "n_docs", "n_occurrences", "first_doc", "first_pos")
      .as[(String, Long, Long, Long, Long)].collect()
    // the shared span: docs 1 (pos 0), 2 (pos 1), 3 (pos 0 and 8)
    assert(got.toSeq == Seq(("a b c d e f g h", 3L, 4L, 1L, 0L)))
  }

  test("dedupTiles: first occurrence survives, later duplicates cut, text rebuilt in order") {
    // width=2 tiles; "a b" appears in doc 1 (idx 0), doc 2 (idx 1), and
    // AGAIN in doc 1 (idx 2) — only doc 1 idx 0 survives.
    val corpus = Seq(
      (1L, "a b x y a b"),   // tiles: [a b][x y][a b]
      (2L, "q r a b"),       // tiles: [q r][a b]
      (3L, "x y"),           // duplicate of doc 1's tile idx 1
      (4L, "solo doc"))
      .toDF("doc_id", "text")
    val got = Dedup.dedupTiles(corpus, "doc_id", "text", width = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, "a b x y"),
      (2L, 2L, 1L, "q r"),
      (3L, 1L, 0L, ""),     // fully duplicated: row kept, text emptied
      (4L, 1L, 1L, "solo doc")))
  }

  test("dedupTiles: ragged last tile dedups as its own span; idempotent on a clean corpus") {
    val corpus = Seq((1L, "a b c"), (2L, "c"), (3L, "d e f g")).toDF("doc_id", "text")
    val first = Dedup.dedupTiles(corpus, "doc_id", "text", width = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    // doc 1 tiles [a b][c]; doc 2 tile [c] duplicates doc 1's ragged tail
    assert(first == Seq((1L, 2L, 2L, "a b c"), (2L, 1L, 0L, ""),
      (3L, 2L, 2L, "d e f g")))
    // re-running over the cleaned corpus changes nothing (no dups left)
    val cleaned = first.map { case (id, _, _, t) => (id, t) }
      .filter(_._2.nonEmpty).toDF("doc_id", "text")
    val again = Dedup.dedupTiles(cleaned, "doc_id", "text", width = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(again.map(r => (r._1, r._4)) == cleaned.orderBy("doc_id")
      .as[(Long, String)].collect().toSeq)
  }

  /** Reference Levenshtein (classic DP) for the spec's ground truth. */
  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
      if (i == 0) j else if (j == 0) i else 0))
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("tileFrame: null text emits no tiles and cannot cross-link docs") {
    // null text → split() null → size = -1; without the guard the
    // descending sequence(0, -1) emits phantom empty tiles at idx 0/-1
    // whose shared digest would edge every null-text doc to every other
    val corpus = Seq((1L, "a b c d"), (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val tiles = Dedup.tileFrame(corpus, "doc_id", "text", width = 2)
    assert(tiles.filter(col("doc_id") =!= 1L).count() == 0,
      "null-text docs must contribute no tiles")
    assert(tiles.count() == 2) // [a b][c d]
    assert(Dedup.tileDupEdges(corpus, "doc_id", "text", width = 2).count() == 0,
      "null-text docs must not form duplication edges")
  }

  test("clusterRepresentatives: argmax score per cluster, exact ties to smallest id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster_id")
    val scores = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (10L, 0.7), (11L, 0.2))
      .toDF("doc_id", "score")
    val got = Dedup.clusterRepresentatives(clusters, scores, "doc_id", "score")
      .orderBy("cluster_id")
      .as[(Long, Long, Double, Long)].collect().toSeq
    // cluster 1: 2 and 3 tie at 0.9 → smaller id 2 wins; cluster 10: 10 wins
    assert(got == Seq((1L, 2L, 0.9, 3L), (10L, 10L, 0.7, 2L)))
    val again = Dedup.clusterRepresentatives(clusters.repartition(5),
        scores.repartition(3), "doc_id", "score")
      .orderBy("cluster_id").as[(Long, Long, Double, Long)].collect().toSeq
    assert(again == got)
  }

  test("decontaminateBloom: bit-identical to the exact path, superset pruned pre-join") {
    val corpus = (1L to 120L).map { i =>
      val words = (0 until 20).map(j => s"w${i}_$j").mkString(" ")
      (i, if (i % 10 == 0) "the quick brown fox jumps over the lazy dog " + words
          else words)
    }.toDF("doc_id", "text")
    val bench = Seq((900L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val exact = Dedup.decontaminate(corpus, bench, "doc_id", "text",
        n = 3, containment = 0.8)
      .orderBy("doc_id").collect().toSeq
    val bloomed = Dedup.decontaminateBloom(corpus, bench, "doc_id", "text",
        n = 3, containment = 0.8)
      .orderBy("doc_id").collect().toSeq
    assert(bloomed == exact, "bloom path must not change the result")
    assert(exact.nonEmpty, "the planted contamination must flag")
  }

  test("contaminationProfile: per-doc dirty fraction, hand-checked") {
    val corpus = Seq(
      (1L, "a b c d e"),   // 2-grams: ab bc cd de — 2 of 4 in bench
      (2L, "x y z"),       // clean
      (3L, "a b"),         // single shingle, fully contained
      (4L, "a b c")        // ab bc — both in bench
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c")).toDF("doc_id", "text")
    val got = Dedup.contaminationProfile(corpus, bench, "doc_id", "text", n = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 4L, 2L, 0.5),
      (2L, 2L, 0L, 0.0),
      (3L, 1L, 1L, 1.0),
      (4L, 2L, 2L, 1.0)))
  }

  test("contaminationProfile: shuffle fallback is identical to broadcast path") {
    val corpus = (1L to 80L).map { i =>
      val words = (0 until 12).map(j => s"w${i}_$j").mkString(" ")
      (i, if (i % 7 == 0) "alpha beta gamma delta " + words else words)
    }.toDF("doc_id", "text")
    val bench = Seq((900L, "alpha beta gamma delta")).toDF("doc_id", "text")
    def run(maxBroadcast: Long) =
      Dedup.contaminationProfile(corpus, bench, "doc_id", "text", n = 3,
        broadcastMaxShingles = maxBroadcast).orderBy("doc_id").collect().toSeq
    assert(run(5000000L) == run(0L))
    val dirty = run(5000000L).filter(_.getAs[Double]("dirty_frac") > 0)
    assert(dirty.size == 80 / 7, "every planted doc (and only those) is dirty")
  }

  test("lshRecallAudit: block sampling, exact truth, found ⊆ truth") {
    import spark.implicits._
    def words(seed: Long, n: Int) =
      (0 until n).map(i => s"w${(seed * 31 + i * 7) % 97}_$i").mkString(" ")
    // blockSize=50, oneInBlocks=4 → sampled blocks are ids 0–49, 200–249…
    val corpus = (
      Seq((1L, words(1, 30)), (2L, words(1, 30)),              // exact dup pair IN sample
          (10L, words(2, 30) + " extra token here"),           // near pair with 11 …
          (11L, words(2, 30) + " other ending words"),
          (60L, words(3, 30)), (61L, words(3, 30))) ++         // dup pair NOT in sample
        (20L to 40L).map(i => (i, words(i, 25)))               // distinct background
      ).toDF("doc_id", "text")
    val got = Dedup.lshRecallAudit(corpus, "doc_id", "text",
        blockSize = 50L, oneInBlocks = 4L, threshold = 0.5,
        shingleSize = 3, bands = 16, rowsPerBand = 4)
      .orderBy("j_decile")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // exactly the two planted in-sample pairs — the unsampled 60/61 dup
    // pair (block 1) must NOT appear
    val totalExact = got.map(_._2).sum
    assert(totalExact == 2L, s"sampled truth must be the 2 planted pairs: $got")
    // found is a subset of truth, recall = found/exact per decile
    got.foreach { case (dec, ex, fnd, rec) =>
      assert(fnd <= ex, s"decile $dec: found $fnd > exact $ex")
      assert(rec == math.rint(fnd.toDouble / ex * 10000) / 10000 ||
        math.abs(rec - fnd.toDouble / ex) < 1e-9)
    }
    // the identical pair (J = 1.0 → decile 9) is always found by LSH
    val d9 = got.find(_._1 == 9L)
    assert(d9.exists(r => r._3 >= 1L && r._2 >= 1L), s"decile 9 missing: $got")
    // partitioning independence
    val again = Dedup.lshRecallAudit(corpus.repartition(5), "doc_id", "text",
        blockSize = 50L, oneInBlocks = 4L, threshold = 0.5,
        shingleSize = 3, bands = 16, rowsPerBand = 4)
      .orderBy("j_decile").as[(Long, Long, Long, Double)].collect().toSeq
    assert(again == got)
  }

  test("containmentPairs: quoted-whole doc has containment 1.0, small/big oriented") {
    def words(seed: Int, n: Int): String =
      (0 until n).map(i => s"w${seed}_$i").mkString(" ")
    // doc 2 = doc 1's text embedded whole in a 3x larger page: Jaccard
    // is low (~1/3) but containment of 1's shingles in 2 is 1.0 — the
    // asymmetric case symmetric dedup misses
    val small = words(1, 10)
    val corpus = Seq(
      (1L, small),
      (2L, small + " " + words(9, 20)),
      (3L, words(5, 15))).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(corpus, "doc_id", "text", threshold = 0.9)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L))) // small id first
    assert(got.head._5 == 1.0)
    assert(got.head._3 == 8L)  // 10 tokens -> 8 distinct 3-shingles
    assert(got.head._4 == 28L) // 30 tokens -> 28
    // sanity: the same pair is NOT a Jaccard near-dup at 0.5
    val jac = Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
      shingleSize = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
    assert(jac.count() == 0L)
  }

  test("containmentPairs: equal sizes tie-break on id; threshold filters") {
    def words(seed: Int, n: Int): String =
      (0 until n).map(i => s"w${seed}_$i").mkString(" ")
    // identical docs: containment 1.0 both ways, orientation = id asc
    val corpus = Seq(
      (7L, words(1, 12)), (4L, words(1, 12)),
      (9L, words(2, 12))).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(corpus, "doc_id", "text", threshold = 0.9)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((4L, 7L)))
    // a high threshold drops partial overlaps entirely
    val partial = Seq(
      (1L, words(1, 10) + " " + words(2, 10)),
      (2L, words(1, 10) + " " + words(3, 30))).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(partial, "doc_id", "text", threshold = 0.99)
      .count() == 0L)
  }

  test("containmentPairs: matches a plain-Scala all-pairs reference") {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 40).map(i => s"t$i")
    val docs = (0L until 30L).map { id =>
      val n = 5 + rnd.nextInt(20)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def shingleSet(text: String): Set[String] = {
      val toks = text.split(" ").toSeq
      if (toks.size < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val ref = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = shingleSet(ta); sb = shingleSet(tb)
      inter = (sa & sb).size
      c = inter.toDouble / math.min(sa.size, sb.size)
      if c >= 0.5
    } yield {
      val (small, big) = if (sa.size <= sb.size) ((sa.size, ia), (sb.size, ib))
                         else ((sb.size, ib), (sa.size, ia))
      (small._2, big._2, small._1.toLong, big._1.toLong, c)
    }).sortBy(p => (p._1, p._2))
    val got = Dedup.containmentPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", threshold = 0.5)
      .orderBy("id_small", "id_big")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == ref)
  }

  test("containmentPairs: maxPostingLen cap is recall-only (never adds or inflates)") {
    def words(seed: Int, n: Int): String =
      (0 until n).map(i => s"w${seed}_$i").mkString(" ")
    val boiler = "shared footer text common to all pages here now"
    val corpus = ((1L to 10L).map(i => (i, words(i.toInt, 15) + " " + boiler)) :+
      (20L, words(1, 15) + " " + boiler)).toDF("doc_id", "text")
    val uncapped = Dedup.containmentPairs(corpus, "doc_id", "text", threshold = 0.3)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._5).toMap
    val capped = Dedup.containmentPairs(corpus, "doc_id", "text", threshold = 0.3,
        maxPostingLen = 5L)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._5).toMap
    assert(capped.keySet.subsetOf(uncapped.keySet))
    capped.foreach { case (k, c) => assert(c <= uncapped(k) + 1e-12) }
    // the genuinely-contained pair (1, 20) survives the cap: its overlap
    // evidence is its own rare shingles, not the hot boilerplate
    assert(capped.contains((1L, 20L)))
  }

  test("weightedJaccardPairs: boilerplate overlap scores low, rare overlap high") {
    def words(seed: Int, n: Int): String =
      (0 until n).map(i => s"w${seed}_$i").mkString(" ")
    // every doc carries the same 12-token footer; docs 1/2 additionally
    // share a unique 12-token paragraph. Unweighted Jaccard rates the
    // (1,2) pair and any footer-only pair similarly; idf weighting must
    // separate them.
    val footer = "contact us terms of service privacy policy all rights reserved inc"
    val para = words(77, 12)
    val corpus = (Seq(
      (1L, para + " " + words(1, 6) + " " + footer),
      (2L, para + " " + words(2, 6) + " " + footer)) ++
      (10L to 29L).map(i => (i, words(i.toInt, 12) + " " + footer)))
      .toDF("doc_id", "text")
    val w = Dedup.weightedJaccardPairs(corpus, "doc_id", "text", threshold = 0.0)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    val target = w((1L, 2L))
    val footerOnly = w.filter { case ((a, b), _) => (a, b) != ((1L, 2L)) }
    assert(footerOnly.nonEmpty, "footer-sharing pairs must appear at threshold 0")
    assert(footerOnly.values.forall(_ < target / 2),
      s"boilerplate pairs must score far below the rare-overlap pair: " +
        s"target=$target, worst=${footerOnly.values.max}")
    // a threshold between the two regimes keeps exactly the meaningful pair
    val strict = Dedup.weightedJaccardPairs(corpus, "doc_id", "text",
        threshold = target / 2)
      .as[(Long, Long, Double)].collect().toSeq
    assert(strict.map(p => (p._1, p._2)) == Seq((1L, 2L)))
  }

  test("weightedJaccardPairs: matches a plain-Scala reference on a random corpus") {
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 30).map(i => s"t$i")
    val docs = (0L until 25L).map { id =>
      val n = 5 + rnd.nextInt(15)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def shingleSet(text: String): Set[String] = {
      val toks = text.split(" ").toSeq
      if (toks.size < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    val n = docs.size
    val df = sets.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    def idf(s: String): Long =
      BigDecimal(math.log(n.toDouble / df(s)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val ref = (for {
      (ia, sa) <- sets.toSeq; (ib, sb) <- sets.toSeq if ia < ib
      shared = (sa & sb).toSeq.map(idf).sum if shared > 0 || (sa & sb).nonEmpty
      wj = shared.toDouble / (sa.toSeq.map(idf).sum + sb.toSeq.map(idf).sum - shared)
      if wj >= 0.1
    } yield (ia, ib, wj)).sortBy(p => (p._1, p._2))
    val got = Dedup.weightedJaccardPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", threshold = 0.1)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    assert(got == ref)
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ShardingSpec extends SparkTestBase {
  import spark.implicits._

  test("packShards equals the sequential greedy reference") {
    // irregular token counts, several range buckets
    val docs = (1L to 1000L).map(i => (i, 1L + (i * 37) % 400)).toDF("doc_id", "n_tokens")
    val budget = 2048L
    val got = Sharding.packShards(docs, "doc_id", "n_tokens", budget, numBuckets = 7)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap

    var cum = 0L
    val expected = (1L to 1000L).map { i =>
      val shard = cum / budget
      cum += 1L + (i * 37) % 400
      i -> shard
    }.toMap
    assert(got == expected)
  }

  test("packShards: shards are contiguous and overflow by at most one doc") {
    val docs = (1L to 500L).map(i => (i, 100L + i % 50)).toDF("doc_id", "n_tokens")
    val budget = 1000L
    val out = Sharding.packShards(docs, "doc_id", "n_tokens", budget, numBuckets = 4)
    val perShard = out.groupBy("shard")
      .agg(sum("n_tokens").as("tok"), min("doc_id").as("lo"), max("doc_id").as("hi"),
        count(lit(1)).as("n"))
      .orderBy("shard")
      .as[(Long, Long, Long, Long, Long)].collect()
    // contiguity: shard k's id range ends right before shard k+1's starts
    perShard.sliding(2).foreach {
      case Array((_, _, _, hi, _), (_, _, lo, _, _)) => assert(lo == hi + 1)
      case _ =>
    }
    // a full shard spans prev-cum range [k·B, (k+1)·B): its token total is
    // within one max-doc of the budget on either side
    val maxDoc = 100L + 49L
    perShard.dropRight(1).foreach { case (s, tok, _, _, _) =>
      assert(tok > budget - maxDoc && tok < budget + maxDoc, s"shard $s total $tok")
    }
  }

  test("packShards: single bucket agrees with many buckets") {
    val docs = (1L to 300L).map(i => (i, (i % 97) + 1)).toDF("doc_id", "n_tokens")
    val one = Sharding.packShards(docs, "doc_id", "n_tokens", 512, numBuckets = 1)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val many = Sharding.packShards(docs, "doc_id", "n_tokens", 512, numBuckets = 13)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(one == many)
  }

  test("assignSplit: deterministic, all splits present, fractions sane") {
    val docs = (0L until 10000L).toDF("doc_id")
    val counts = Sharding.assignSplit(docs, "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 8000 && counts("train") < 9700, s"got $counts")
    assert(counts("val") > 100 && counts("test") > 100, s"got $counts")
    // bit-for-bit reproducible across invocations
    val again = Sharding.assignSplit(docs, "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again == counts)
    // matches the documented arithmetic
    val row = Sharding.assignSplit(docs.filter($"doc_id" === 4242L), "doc_id")
      .select("split").as[String].head()
    val bucket = ((4242L % 1000003L) * 2654435761L) % 100L
    val expected = if (bucket < 90) "train" else if (bucket < 95) "val" else "test"
    assert(row == expected)
  }

  test("capPerGroup: deterministic, equals the window-rank reference") {
    import org.apache.spark.sql.expressions.Window
    val docs = (1L to 500L).map(i => (i, s"src${i % 7}")).toDF("doc_id", "source")
    val cap = 20
    val got = Sharding.capPerGroup(docs, "source", "doc_id", cap)
      .select("doc_id").as[Long].collect().toSet
    // reference: per-group window rank over the same (bucket, id) order
    val w = Window.partitionBy("source")
      .orderBy(Sharding.splitBucket($"doc_id"), $"doc_id")
    val expected = docs.withColumn("rn", row_number().over(w))
      .filter($"rn" <= cap).select("doc_id").as[Long].collect().toSet
    assert(got == expected)
    val sizes = docs.join(got.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ <= cap) && sizes.values.exists(_ == cap))
    // column set/order preserved
    assert(Sharding.capPerGroup(docs, "source", "doc_id", cap).columns.toSeq ==
      Seq("doc_id", "source"))
  }

  test("upsampleByWeight: floor copies + deterministic fractional copy") {
    val docs = (1L to 200L).map(i => (i, if (i <= 100) "a" else "b"))
      .toDF("doc_id", "source")
    val weights = Seq(("a", 2000L), ("b", 500L)).toDF("source", "permille")
    val got = Sharding.upsampleByWeight(docs, weights)
      .select("doc_id", "copy_id").as[(Long, Long)].collect()
    val bySrc = got.groupBy { case (id, _) => if (id <= 100) "a" else "b" }
    // weight 2.0: exactly 2 copies of every doc, copy_ids 1 and 2
    assert(bySrc("a").length == 200)
    assert(bySrc("a").groupBy(_._1).forall { case (_, cs) =>
      cs.map(_._2).sorted.toSeq == Seq(1L, 2L) })
    // weight 0.5: the same hash rule as assignSplit/q77 — a strict subset,
    // one copy each, deterministic across runs
    val b1 = bySrc("b").map(_._1).toSet
    assert(bySrc("b").forall(_._2 == 1L))
    assert(b1.size > 20 && b1.size < 80, s"~half expected, got ${b1.size}")
    val again = Sharding.upsampleByWeight(docs, weights)
      .filter($"source" === "b").select("doc_id").as[Long].collect().toSet
    assert(again == b1)
    // pure function of (id, spec): repartitioning does not change the set
    val shuffled = Sharding.upsampleByWeight(docs.repartition(7), weights)
      .filter($"source" === "b").select("doc_id").as[Long].collect().toSet
    assert(shuffled == b1)
  }

  test("capTokensPerGroup: greedy hash-order prefix per group, <=1-doc overflow") {
    import org.apache.spark.sql.functions.col
    val rows = (1L to 40L).map(i => (i, if (i % 2 == 0) "a" else "b", 10L + i % 7))
    val docs = rows.toDF("doc_id", "source", "toks")
    val out = Sharding.capTokensPerGroup(docs, "source", "doc_id", col("toks"), budget = 60L)
      .select("doc_id").as[Long].collect().toSet

    // single-machine reference: walk each group by (splitBucket(id), id),
    // keep while tokens-before < budget
    def bucket(id: Long) = math.floorMod((id % 1000003L) * 2654435761L, 100L)
    val expected = rows.groupBy(_._2).values.flatMap { g =>
      val walk = g.sortBy(r => (bucket(r._1), r._1))
      walk.scanLeft((0L, 0L)) { case ((_, acc), r) => (r._1, acc + r._3) }
        .sliding(2).collect { case Seq((_, before), (id, _)) if before < 60L => id }
    }.toSet
    assert(out == expected && out.nonEmpty && out.size < 40)

    // partitioning must not change the selection (pure function of data)
    val shuffled = Sharding.capTokensPerGroup(docs.repartition(7), "source",
      "doc_id", col("toks"), budget = 60L).select("doc_id").as[Long].collect().toSet
    assert(shuffled == out)
  }

  test("capTokensPerGroup: budget below the first doc still yields one doc per group") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 10L).map(i => (i, s"s${i % 3}", 50L)).toDF("doc_id", "source", "toks")
    val out = Sharding.capTokensPerGroup(docs, "source", "doc_id", col("toks"), budget = 1L)
    val perGroup = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(perGroup.values.toSet == Set(1L) && perGroup.size == 3)
    // and a huge budget keeps everything
    val all = Sharding.capTokensPerGroup(docs, "source", "doc_id", col("toks"), budget = 1000000L)
    assert(all.count() == 10L)
  }

  test("sampleStratified: exact per-stratum counts, equals the window-rank reference") {
    import org.apache.spark.sql.expressions.Window
    val docs = (1L to 600L).map(i => (i, s"src${i % 6}")).toDF("doc_id", "source")
    // varying targets; src5 absent (contributes nothing); src0 target
    // above its stratum size (keeps all 100)
    val targets = Seq(("src0", 500L), ("src1", 7L), ("src2", 30L), ("src3", 1L),
      ("src4", 12L)).toDF("source", "n")
    val got = Sharding.sampleStratified(docs, "source", "doc_id", targets)
    val sizes = got.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(sizes == Map("src0" -> 100L, "src1" -> 7L, "src2" -> 30L,
      "src3" -> 1L, "src4" -> 12L))
    // exact row set: per-stratum window rank over the same (bucket, id) order
    val w = Window.partitionBy("source")
      .orderBy(Sharding.splitBucket($"doc_id"), $"doc_id")
    val expected = docs.join(targets, "source")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= $"n").select("doc_id").as[Long].collect().toSet
    assert(got.select("doc_id").as[Long].collect().toSet == expected)
    // column set/order preserved; deterministic across invocations
    assert(got.columns.toSeq == Seq("doc_id", "source"))
    assert(Sharding.sampleStratified(docs, "source", "doc_id", targets)
      .select("doc_id").as[Long].collect().toSet == expected)
    // empty targets = every stratum absent = empty selection (not an NPE
    // out of the null max() cell)
    assert(Sharding.sampleStratified(docs, "source", "doc_id",
      targets.limit(0)).count() == 0L)
  }

  test("ntileExact equals the window ntile reference across bucket counts") {
    val docs = (1L to 457L).map(i => (i, (i * 131) % 37)).toDF("doc_id", "v")
    for (k <- Seq(1, 4, 16, 100)) {
      val got = Sharding.ntileExact(docs, col("v"), col("doc_id"), k, numBuckets = 5)
        .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
      val w = org.apache.spark.sql.expressions.Window.orderBy($"v", $"doc_id")
      val expected = docs.withColumn("bucket", ntile(k).over(w).cast("long"))
        .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
      assert(got == expected, s"k=$k")
    }
  }

  test("ntileExact: n < k degenerates to one row per leading bucket; sizes differ by <= 1") {
    val tiny = (1L to 5L).map(i => (i, i)).toDF("doc_id", "v")
    val got = Sharding.ntileExact(tiny, col("v"), col("doc_id"), k = 9, numBuckets = 2)
      .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
    assert(got == (1L to 5L).map(i => i -> i).toMap)
    val docs = (1L to 1000L).map(i => (i, (i * 17) % 101)).toDF("doc_id", "v")
    val sizes = Sharding.ntileExact(docs, col("v"), col("doc_id"), k = 7, numBuckets = 4)
      .groupBy("bucket").count().as[(Long, Long)].collect().toMap
    assert(sizes.keySet == (1L to 7L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
  }

  test("scrubPii redacts planted emails and phones, counts them, leaves clean text") {
    val docs = Seq(
      (1L, "reach me at jane.doe+x@mail.example.org today"),
      (2L, "call 555-0100 or 555-0199 now"),
      (3L, "nothing sensitive here 12345 2026-01-01")).toDF("doc_id", "text")
    val out = TextAnalysis.scrubPii(docs)
      .select("doc_id", "n_emails", "n_phones", "scrubbed")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1 && out(1L)._4 == "reach me at [REDACTED] today")
    assert(out(2L)._3 == 2 && out(2L)._4 == "call [REDACTED] or [REDACTED] now")
    assert(out(3L)._2 == 0 && out(3L)._3 == 0 && out(3L)._4.contains("12345"))
    // date-like token must not be phone-matched
    assert(out(3L)._4 == "nothing sensitive here 12345 2026-01-01")
  }

  test("temperatureMix: sqrt-law targets upweight low-resource groups; caps at n_g") {
    // groups: big=400, small=100 docs. α=1/2 weights: w ∝ 20 / 10, so a
    // 150-row target splits 100 / 50 — the small group keeps 50% while
    // the big one keeps 25% (a proportional split would be 120/30).
    val docs = ((1L to 400L).map(i => (i, "big")) ++
      (1001L to 1100L).map(i => (i, "small"))).toDF("doc_id", "src")
    val got = Sharding.temperatureMix(docs, "src", "doc_id", totalTarget = 150L)
    val bySrc = got.groupBy("src").count().as[(String, Long)].collect().toMap
    // w_big = isqrt(4e8) = 20000, w_small = isqrt(1e8) = 10000, W = 30000
    // t_big = 150*20000 div 30000 = 100; t_small = 150*10000 div 30000 = 50
    assert(bySrc == Map("big" -> 100L, "small" -> 50L))
    // a target above the corpus size caps every group at its own n_g
    val all = Sharding.temperatureMix(docs, "src", "doc_id", totalTarget = 100000L)
    assert(all.count() == 500L)
    // determinism: same ids under a different partitioning
    val again = Sharding.temperatureMix(docs.repartition(7), "src", "doc_id", 150L)
    assert(again.select("doc_id").as[Long].collect().sorted.toSeq ==
      got.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("packSequences: exact concat-and-chop tiling — full coverage, no overlap, full sequences") {
    val rnd = new scala.util.Random(11)
    val docs = (1L to 200L).map(i => (i, 1L + rnd.nextInt(40).toLong))
      .toDF("doc_id", "n_tokens")
    val L = 32L
    val got = Sharding.packSequences(docs, "doc_id", "n_tokens", seqLen = L,
        numBuckets = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._3)).toSeq
    val total = (1L to 200L).map(i => got.filter(_._1 == i).map(_._6).sum).sum
    // 1) every token of every doc is covered exactly once, in order
    for (d <- 1L to 200L) {
      val spans = got.filter(_._1 == d).sortBy(_._4)
      assert(spans.map(_._4).zip(spans.scanLeft(0L)(_ + _._6)).forall {
        case (off, expect) => off == expect
      }, s"doc $d spans must tile [0, n) contiguously")
      assert(spans.map(_._6).sum == spans.head._2, s"doc $d must be fully covered")
    }
    // 2) every sequence except the last is exactly full
    val bySeq = got.groupBy(_._3).view.mapValues(_.map(_._6).sum).toMap
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (s, n) =>
      if (s != lastSeq) assert(n == L, s"sequence $s holds $n tokens, want $L")
      else assert(n == total - lastSeq * L)
    }
    // 3) within a sequence, spans tile [0, L) contiguously too
    for (s <- bySeq.keys) {
      val spans = got.filter(_._3 == s).sortBy(_._5)
      assert(spans.map(_._5).zip(spans.scanLeft(0L)(_ + _._6)).forall {
        case (off, expect) => off == expect
      }, s"sequence $s must fill contiguously from offset 0")
    }
    // 4) docs longer than L really split across > 2 sequences
    val wide = Seq((1L, 100L), (2L, 5L)).toDF("doc_id", "n_tokens")
    val ws = Sharding.packSequences(wide, "doc_id", "n_tokens", seqLen = 32L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(ws.filter(_._1 == 1L).map(_._3).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    // 5) bucket count cannot change the layout
    val again = Sharding.packSequences(docs.repartition(7), "doc_id", "n_tokens",
        seqLen = L, numBuckets = 11)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._3)).toSeq
    assert(again == got, "layout must be partitioning-independent")
  }

  test("epochShuffle: a seeded permutation, partitioning-independent, shard-cut") {
    val docs = (0L until 300L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val out = Sharding.epochShuffle(docs, "doc_id", seed = 7L, shardSize = 64L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

    // 1) epoch_pos is exactly the permutation 0..n-1
    assert(out.map(_._3).sorted == (0L until 300L))
    // 2) it matches the driver-computed (knuth-hash, id) rank
    val ref = out.map { case (id, _, _, _) =>
      (((id % 1000003L) + 7L) * 2654435761L % 1000000007L, id)
    }.sorted.map(_._2).zipWithIndex.map { case (id, pos) => id -> pos.toLong }.toMap
    out.foreach { case (id, _, pos, _) => assert(pos == ref(id), s"id=$id") }
    // 3) shard = pos div 64
    out.foreach { case (_, _, pos, shard) => assert(shard == pos / 64L) }
    // 4) bucket count cannot change the permutation
    val again = Sharding.epochShuffle(docs.repartition(7), "doc_id",
        seed = 7L, shardSize = 64L, numBuckets = 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(again == out, "permutation must be partitioning-independent")
    // 5) a different seed yields a different order
    val other = Sharding.epochShuffle(docs, "doc_id", seed = 8L, shardSize = 64L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(other.map(_._3) != out.map(_._3))
    // 6) the permutation decorrelates id order (no long sorted runs)
    val order = out.sortBy(_._3).map(_._1)
    val asc = order.sliding(2).count(p => p(1) == p(0) + 1)
    assert(asc < 30, s"$asc adjacent-id pairs survived the shuffle")
  }

  test("ringNegatives: ring properties, singleton buckets, seeded re-deal") {
    import spark.implicits._
    // buckets: 0 → 6 members, 1 → 3 members, 2 → singleton
    val docs = ((1L to 6L).map((_, 0L)) ++ (10L to 12L).map((_, 1L)) ++
      Seq((20L, 2L))).toDF("doc_id", "b")
    val got = Sharding.ringNegatives(docs, "doc_id", col("b"), k = 3, seed = 7L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val byAnchor = got.groupBy(_._1)
    // bucket 0: every member gets exactly 3 negatives; bucket 1: n-1 = 2;
    // singleton: none
    (1L to 6L).foreach(a => assert(byAnchor(a).size == 3, s"anchor $a"))
    (10L to 12L).foreach(a => assert(byAnchor(a).size == 2, s"anchor $a"))
    assert(!byAnchor.contains(20L))
    // negatives stay in the anchor's bucket, never the anchor itself,
    // and are distinct per anchor
    got.foreach { case (a, _, n, b) =>
      assert(n != a)
      val expectBucket = if (a >= 10L) (if (a >= 20L) 2L else 1L) else 0L
      assert(b == expectBucket, s"pair ($a,$n) crossed buckets")
    }
    byAnchor.foreach { case (a, rs) =>
      assert(rs.map(_._3).distinct.size == rs.size, s"anchor $a repeats a negative")
    }
    // ring fairness: every member of bucket 0 is a negative exactly 3 times
    val negCounts = got.filter(_._4 == 0L).groupBy(_._3).view.mapValues(_.size)
    (1L to 6L).foreach(m => assert(negCounts(m) == 3, s"member $m as negative"))
    // deterministic under repartition; a new seed re-deals the pairing
    val again = Sharding.ringNegatives(docs.repartition(4), "doc_id", col("b"),
        k = 3, seed = 7L).as[(Long, Long, Long, Long)].collect().toSeq
    assert(again.sorted == got.sorted)
    val other = Sharding.ringNegatives(docs, "doc_id", col("b"), k = 3, seed = 8L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(other.sorted != got.sorted, "seed must change the pairing")
  }

  test("property: ringNegatives equals the sequential ring reference") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val genRows = Gen.nonEmptyListOf(Gen.choose(0L, 4L))
      .map(_.zipWithIndex.map { case (b, i) => (i.toLong + 1, b) })
    val prop = Prop.forAll(genRows, Gen.choose(1, 4), Gen.choose(0L, 20L)) {
      (rows, k, seed) =>
        val got = Sharding.ringNegatives(rows.toDF("doc_id", "b"), "doc_id",
            col("b"), k = k, seed = seed)
          .as[(Long, Long, Long, Long)].collect().toSet
        // sequential reference: same hash, same ring walk
        val mult = (2 * seed + 1) % 1000003L
        def h(id: Long) = (id % 1000003L) * mult % 1000003L * 2654435761L % 1000000007L
        val ref = rows.groupBy(_._2).flatMap { case (b, members) =>
          val ring = members.map(_._1).sortBy(id => (h(id), id))
          val n = ring.size
          if (n <= 1) Seq.empty
          else ring.zipWithIndex.flatMap { case (a, p) =>
            (1 to math.min(k, n - 1)).map(j =>
              (a, j.toLong, ring((p + j) % n), b))
          }
        }.toSet
        got == ref
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(15)
      .withInitialSeed(org.scalacheck.rng.Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("mortonZ: hand-computed interleave, masking, reference parity") {
    import spark.implicits._
    // x=3 (011), y=5 (101), 3 bits → y2 x2 y1 x1 y0 x0 = 100111 = 39
    val one = Seq((3L, 5L)).toDF("x", "y")
      .select(Sharding.mortonZ(col("x"), col("y"), bits = 3).as("z"))
      .as[Long].head()
    assert(one == 39L)
    // masking: bits above `bits` are ignored
    val masked = Seq((3L + 8L, 5L + 16L)).toDF("x", "y")
      .select(Sharding.mortonZ(col("x"), col("y"), bits = 3).as("z"))
      .as[Long].head()
    assert(masked == 39L)
    // parity with a driver-side reference interleave over a grid
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).sum
    val grid = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = grid.toDF("x", "y")
      .select(col("x"), col("y"), Sharding.mortonZ(col("x"), col("y"), 4).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == ref(x, y, 4), s"($x,$y)") }
    // the curve is a bijection on the grid
    assert(got.map(_._3).distinct.length == grid.length)
  }

  test("zorderLayout: equal-size files, 2-D locality, partitioning-independent") {
    import spark.implicits._
    // 32×32 grid, one row per cell, ids unique
    val rows = for (x <- 0L until 32L; y <- 0L until 32L) yield (x * 32 + y, x, y)
    val df = rows.toDF("id", "x", "y")
    val laid = Sharding.zorderLayout(df, col("x"), col("y"), col("id"),
      bits = 5, nFiles = 16)
    val stats = laid.groupBy("file_id")
      .agg(count(lit(1)).as("n"),
        (max(col("x")) - min(col("x"))).as("sx"),
        (max(col("y")) - min(col("y"))).as("sy"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // 1024 rows into 16 files of exactly 64
    assert(stats.length == 16 && stats.forall(_._2 == 64L))
    // each file of a perfect z-curve covers an 8×8 tile: both spans = 7
    // (a row-major sort would give sx=31 for every non-boundary file)
    assert(stats.forall(s => s._3 == 7L && s._4 == 7L),
      s"z-files must be square tiles: ${stats.toSeq}")
    // assignment is a pure function of the data, not its partitioning
    val again = Sharding.zorderLayout(df.repartition(7), col("x"), col("y"),
        col("id"), bits = 5, nFiles = 16)
      .select("id", "file_id").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val first = laid.select("id", "file_id")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(again == first)
  }

  private def aesKey(id: Long, w: Long, seed: Long): Long = {
    val h = ((id % 1000003L) + seed) * 2654435761L % 1000000007L
    val u = (h + 1).toDouble / 1000000008.0
    BigDecimal(-math.log(u) / w * 1e12)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
  }

  test("weightedSample: matches the plain-Scala A-ES reference, k per stratum") {
    val rnd = new scala.util.Random(3)
    val docs = (0L until 200L).map { id =>
      (id, if (id % 2 == 0) "en" else "de", 1L + rnd.nextInt(5000))
    }
    val ref = docs.groupBy(_._2).flatMap { case (lang, rows) =>
      rows.map { case (id, _, w) => (id, aesKey(id, w, 42L)) }
        .sortBy { case (id, e) => (e, id) }.take(10).zipWithIndex
        .map { case ((id, e), i) => (lang, id, e, (i + 1).toLong) }
    }.toSeq.sortBy(r => (r._1, r._4))
    val got = Sharding.weightedSample(
        docs.toDF("doc_id", "lang", "n_chars").repartition(5),
        "lang", "n_chars", k = 10, idCol = "doc_id", seed = 42L)
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(got == ref)
  }

  test("weightedSample: deterministic per seed; heavier docs win the race in aggregate") {
    val docs = (0L until 400L).map { id =>
      // first half heavy (w=5000), second half light (w=50)
      (id, "all", if (id < 200) 5000L else 50L)
    }.toDF("doc_id", "lang", "n_chars")
    val a = Sharding.weightedSample(docs, "lang", "n_chars", k = 50,
      idCol = "doc_id", seed = 7L).as[(String, Long, Long, Long)].collect().toSeq
    val b = Sharding.weightedSample(docs, "lang", "n_chars", k = 50,
      idCol = "doc_id", seed = 7L).as[(String, Long, Long, Long)].collect().toSeq
    assert(a == b, "same seed re-deals the same sample")
    val heavy = a.count(_._2 < 200)
    assert(heavy >= 40, s"100x weight must dominate the 50-sample: got $heavy heavy")
    val other = Sharding.weightedSample(docs, "lang", "n_chars", k = 50,
      idCol = "doc_id", seed = 8L).as[(String, Long, Long, Long)].collect().toSeq
    assert(other.map(_._2).toSet != a.map(_._2).toSet,
      "a different seed re-deals a different sample")
  }

  test("weightedSample: zero/negative weights are excluded, never crash the key") {
    val docs = Seq((1L, "en", 100L), (2L, "en", 0L), (3L, "en", -5L), (4L, "en", 1L))
      .toDF("doc_id", "lang", "n_chars")
    val got = Sharding.weightedSample(docs, "lang", "n_chars", k = 10,
      idCol = "doc_id", seed = 1L).as[(String, Long, Long, Long)].collect()
    assert(got.map(_._2).toSet == Set(1L, 4L))
  }

  test("fimTransform: lossless reorder, sentinel grammar, rate, determinism") {
    import spark.implicits._
    val docs = (0L until 200L).map { id =>
      (id, (0 until (4 + (id % 20)).toInt).map(k => s"w${id}x$k").mkString(" "))
    }.toDF("doc_id", "text")
    val out = Sharding.fimTransform(docs).orderBy("doc_id").collect()
    val orig = docs.as[(Long, String)].collect().toMap
    var nFim = 0
    out.foreach { r =>
      val (id, n, fim, t) = (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getString(3))
      assert(n == orig(id).split(' ').count(_.nonEmpty))
      if (!fim) assert(t == orig(id), s"pass-through must be verbatim (doc $id)")
      else {
        nFim += 1
        assert(n >= 8, "short docs must never transform")
        // grammar: <PRE> p… <SUF> s… <MID> m…  — reassembling p+m+s
        // must reproduce the original token sequence exactly
        assert(t.startsWith("<PRE> "))
        val Array(pre, rest) = t.drop("<PRE> ".length).split(" <SUF> ", 2)
        val midIdx = rest.indexOf(" <MID>")
        assert(midIdx >= 0)
        val suf = rest.substring(0, midIdx)
        val mid = rest.substring(midIdx + " <MID>".length).stripPrefix(" ")
        val rebuilt = (pre.split(' ') ++ mid.split(' ').filter(_.nonEmpty) ++
          suf.split(' ')).mkString(" ")
        assert(rebuilt == orig(id), s"doc $id must be a pure reorder")
        assert(pre.nonEmpty && suf.nonEmpty, "prefix and suffix are never empty")
      }
    }
    // ~half of the ≥8-token docs transform (hash-selected, not exact)
    val eligible = out.count(_.getLong(1) >= 8)
    assert(nFim > eligible / 4 && nFim < eligible * 3 / 4,
      s"rate 500‰ should land near half of $eligible, got $nFim")
    // pure function of (id, seed): partitioning cannot change anything
    val again = Sharding.fimTransform(docs.repartition(7)).orderBy("doc_id").collect()
    assert(again.map(_.toSeq).toSeq == out.map(_.toSeq).toSeq)
    // a different seed moves the split points on some transformed doc
    val moved = Sharding.fimTransform(docs, seed = 99L).orderBy("doc_id").collect()
    assert(moved.map(_.toSeq).toSeq != out.map(_.toSeq).toSeq)
  }
}

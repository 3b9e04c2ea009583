package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Sharding.leakageSafeSplit]]: whole near-dup clusters move to one
  * split, singletons reproduce the plain per-doc assignment, and the
  * result is partitioning-independent. */
class LeakageSplitSpec extends SparkTestBase {
  import spark.implicits._

  // three exact 4-doc template families (guaranteed near-dup clusters)
  // plus unrelated singleton docs
  private def corpus: Seq[(Long, String)] = {
    val fam = (0 until 3).flatMap { f =>
      (0 until 4).map { i =>
        (100L * f + i, s"family $f shared template body words alpha beta gamma delta " +
          s"epsilon zeta eta theta copy marker $i")
      }
    }
    val singles = (0 until 30).map(i =>
      (1000L + i, s"unique document $i with its own ${i * 7} content " +
        s"token${i}a token${i}b token${i}c token${i}d token${i}e"))
    fam ++ singles
  }

  private def splitOf(id: Long): String = {
    val b = ((id % 1000003L) * 2654435761L) % 100L
    if (b < 90) "train" else if (b < 95) "val" else "test"
  }

  test("no near-dup pair straddles a split; singletons match assignSplit") {
    val docs = corpus.toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      shingleSize = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
    assert(pairs.count() > 0, "fixture must actually contain near-dups")
    val split = Sharding.leakageSafeSplit(docs, pairs, "doc_id")
      .as[(Long, Long, String)].collect().toSeq
    val byId = split.map(r => r._1 -> r._3).toMap

    val crossPairs = pairs.select("id1", "id2").as[(Long, Long)].collect()
      .filter { case (a, b) => byId(a) != byId(b) }
    assert(crossPairs.isEmpty,
      s"near-dup pairs must never straddle splits: $crossPairs")

    // every clustered doc is assigned by its cluster root's hash
    val roots = split.map(r => r._1 -> r._2).toMap
    split.foreach { case (id, root, s) =>
      assert(s == splitOf(root), s"doc $id: split must hash the root $root")
    }
    // singletons root at themselves → identical to the per-doc split
    val clustered = pairs.select("id1", "id2").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    split.filterNot(r => clustered(r._1)).foreach { case (id, root, s) =>
      assert(root == id && s == splitOf(id),
        "a singleton must reproduce assignSplit exactly")
    }
  }

  test("k-fold assignment: no near-dup pair straddles folds, folds in range") {
    val docs = corpus.toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      shingleSize = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
    val folds = Sharding.leakageSafeFolds(docs, pairs, "doc_id", k = 4)
      .as[(Long, Long, Long)].collect().toSeq
    val byId = folds.map(r => r._1 -> r._3).toMap
    pairs.select("id1", "id2").as[(Long, Long)].collect().foreach {
      case (a, b) => assert(byId(a) == byId(b),
        s"pair ($a, $b) straddles folds ${byId(a)} vs ${byId(b)}")
    }
    assert(folds.forall(r => r._3 >= 0 && r._3 < 4))
    // the root-mod formula reproduces exactly
    folds.foreach { case (_, root, f) =>
      assert(f == ((root % 1000003L) * 2654435761L) % 100L % 4L)
    }
    intercept[IllegalArgumentException] {
      Sharding.leakageSafeFolds(docs, pairs, "doc_id", k = 1)
    }
  }

  test("dedupRates: exact vs near losers accounted per source") {
    // src A: 3 byte-identical docs (2 exact losers) + 1 unique;
    // src B: 2 near-dups (1 near loser) + 1 unique
    val base = "the quick brown fox jumps over the lazy dog again today yes"
    val docs = Seq(
      (1L, "A", base), (2L, "A", base), (3L, "A", base),
      (4L, "A", "completely different text about spark and scala engines"),
      (5L, "B", base + " extra"), (6L, "B", base + " bonus"),
      (7L, "B", "another unique document body with its own words entirely"))
      .toDF("doc_id", "source", "text")
    val rates = Dedup.dedupRates(docs, "doc_id", "text", "source",
        threshold = 0.5)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(rates("A") == ((4L, 2L, 0L, 2L)),
      s"A: 2 exact losers, representative + unique kept: ${rates("A")}")
    // docs 5 and 6 are near-dups of A's surviving representative (doc
    // 1), so the cluster roots at 1 and BOTH B members are losers —
    // dedup clusters cross sources, and the audit must account for it
    assert(rates("B") == ((3L, 0L, 2L, 1L)),
      s"B: both near-dups lose to A's representative: ${rates("B")}")
    assert(rates.values.forall(r => r._1 == r._2 + r._3 + r._4),
      "docs = exact + near + kept, per source")
  }

  test("assignment is partitioning-independent") {
    val docs = corpus.toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      shingleSize = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
    val a = Sharding.leakageSafeSplit(docs, pairs, "doc_id")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val b = Sharding.leakageSafeSplit(docs.repartition(7), pairs.repartition(3), "doc_id")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}

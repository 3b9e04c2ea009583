package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SQSpec extends SparkTestBase {
  import spark.implicits._

  /** 200 deterministic dim-8 vectors in two loose clusters. */
  private lazy val corpus = {
    val rows = (0L until 200L).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      val v = Array.tabulate(8) { j =>
        base * (1.0f + 0.1f * j) + 0.01f * ((i * 7 + j * 13) % 23).toFloat
      }
      (i, v.toSeq)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  private lazy val model = SQ.fit(corpus, "embedding", dim = 8)

  test("fit is partitioning-independent (min/max is exact)") {
    val m1 = SQ.fit(corpus.repartition(1), "embedding", dim = 8)
    val m7 = SQ.fit(corpus.repartition(7), "embedding", dim = 8)
    assert(m1.lo.toSeq == m7.lo.toSeq && m1.step.toSeq == m7.step.toSeq)
  }

  test("encode: reconstruction error bounded by half a step per dim") {
    val enc = SQ.encode(corpus, model).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val raw = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    raw.foreach { case (id, v) =>
      val code = enc(id)
      assert(code.length == 8)
      v.indices.foreach { j =>
        val deq = model.lo(j) + (code(j) + 128) * model.step(j)
        val tol = math.max(model.step(j) / 2.0, 1e-9) + 1e-12
        assert(math.abs(deq - v(j)) <= tol,
          s"id=$id dim=$j x=${v(j)} deq=$deq step=${model.step(j)}")
      }
    }
  }

  test("sq8 cosine tracks exact cosine closely at 8 bits") {
    val a = corpus.filter($"vec_id" < 50)
      .select($"vec_id".as("ida"), $"embedding".as("va"))
    val b = corpus.filter($"vec_id" >= 50 && $"vec_id" < 100)
      .select(($"vec_id" - 50).as("ida"), $"embedding".as("vb"))
    val joined = a.join(b, "ida")
    val exact = joined.select(
      graft.functions.VectorFunctions.cosine_similarity($"va", $"vb")).as[Double].collect()
    val approx = joined.select(
      graft.functions.VectorFunctions.sq8_cosine(
        graft.functions.VectorFunctions.sq8_encode($"va", model.lo, model.step),
        graft.functions.VectorFunctions.sq8_encode($"vb", model.lo, model.step),
        model.lo, model.step)).as[Double].collect()
    exact.zip(approx).foreach { case (e, q) =>
      assert(math.abs(e - q) < 0.02, s"exact=$e sq8=$q")
    }
  }

  test("candidate set is deterministic under repartitioning") {
    val queries = corpus.filter($"vec_id" % 20 === 0)
    def cand(parts: Int): Set[(Long, Long)] =
      SQ.sqCandidates(corpus.repartition(parts), queries, model, nCandidates = 15)
        .as[(Long, Long)].collect().toSet
    assert(cand(1) == cand(6))
  }

  test("topKSq recall@10 vs brute force is near-perfect at 8 bits") {
    val queries = corpus.filter($"vec_id" % 20 === 0)
    val exact = Similarity.topKBruteForce(corpus, queries, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = SQ.topKSq(corpus, queries, k = 10, model, refine = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall=$recall")
    // and the output contract matches the other ANN paths
    val out = SQ.topKSq(corpus, queries, k = 10, model, refine = 4)
    assert(out.columns.toSeq == Seq("query_id", "neighbor_id", "sim", "rank"))
  }

  test("constant dimension (step 0) codes to 0 and does not poison cosine") {
    val flat = Seq((0L, Seq(1.0f, 5.0f)), (1L, Seq(2.0f, 5.0f)), (2L, Seq(3.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val m = SQ.fit(flat, "embedding", dim = 2)
    assert(m.step(1) == 0.0)
    val enc = SQ.encode(flat, m).collect().map(_.getAs[Array[Byte]](1))
    assert(enc.forall(_(1) == (-128).toByte)) // code 0 stored as -128
    val sims = flat.select(graft.functions.VectorFunctions.sq8_cosine(
      graft.functions.VectorFunctions.sq8_encode($"embedding", m.lo, m.step),
      graft.functions.VectorFunctions.sq8_encode($"embedding", m.lo, m.step),
      m.lo, m.step)).as[Double].collect()
    sims.foreach(s => assert(s >= 0.999, s"self-sim $s"))
  }
}

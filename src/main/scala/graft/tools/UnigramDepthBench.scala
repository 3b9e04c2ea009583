package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Depth benchmark for the unigram-LM EM trainer (VERDICT r13 #1): run
  * [[graft.ext.Unigram.emTrainFromCounts]] at production-shaped depth —
  * a ≥4k-substring seed pruned to a ≥512-piece target through the
  * gradual Kudo §3.2 shrink schedule (keep `shrinkPermille` of the
  * multis per round until the target) — and print one JSON line (also
  * appended to `bench_unigram_depth.json`, or args-overridden).
  *
  * Reported per iteration: wall seconds, surviving inventory size, and
  * DROPS (pieces pruned that round — EM only ever removes, so the
  * schedule's shape is the drop trajectory). The EM-is-working signal
  * is `em_heuristic_multi_overlap`: how many of the final EM multis the
  * one-shot frequency heuristic would ALSO have kept at the same size —
  * overlap well below 1.0 means usage re-estimation genuinely reordered
  * the cut (a frequent-but-always-dominated substring has high weight
  * but zero usage). The quality line: total corpus pieces under the EM
  * inventory vs under the one-shot heuristic inventory of the SAME
  * size — EM must not lose (UnigramEmSpec pins a corpus where it
  * strictly wins; here the claim is measured at sf-scale depth).
  *
  * The documents fixture's vocabulary is deliberately tiny (~40
  * distinct words — a few hundred distinct substrings), far below a
  * 4k-substring seed, so the bench widens it with the SAME
  * content-disjoint replication ScaleBench uses for every ×10 row:
  * `replicate` copies of the corpus with per-replica token suffixes
  * (`tok` → `tok_rI`) — token counts, word lengths, and frequency
  * shape preserved; substrings disjoint across replicas, so the
  * substring universe (and the distinct-word frame the E-step scans)
  * grows ∝ replicas. This measures the trainer at production
  * VOCABULARY depth, which is the axis EM cost lives on (iterations
  * are O(vocab), corpus-size-free — the corpus is scanned once).
  *
  * Scale notes measured by this bench: the corpus is scanned ONCE (the
  * word-count aggregation, persisted); each EM iteration is one
  * map-only kernel pass over the distinct-word frame with the
  * inventory riding as a codegen reference HashMap — per-iteration
  * wall is therefore vocabulary-bound, not corpus-bound, and flat
  * across iterations even as the inventory shrinks 4096 → 512. */
object UnigramDepthBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val topSeed = args.lift(1).map(_.toInt).getOrElse(4096)
    val target = args.lift(2).map(_.toInt).getOrElse(512)
    val maxLen = args.lift(3).map(_.toInt).getOrElse(6)
    val shrinkPermille = args.lift(4).map(_.toInt).getOrElse(750)
    // 4096 · 0.75^k ≤ 512 → k = 8 rounds reach the target; one more
    // re-estimates AT the target (the Kudo loop's final polish)
    val iters = args.lift(5).map(_.toInt).getOrElse(9)
    val replicate = args.lift(6).map(_.toInt).getOrElse(16)
    val outPath = args.lift(7).getOrElse("bench_unigram_depth.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.core.Tables.documents(spark, sfDir)
    // content-disjoint vocabulary widening (the ScaleBench replica
    // convention): replica i suffixes every token with _rI
    val docs = (0 until math.max(1, replicate)).map { i =>
      if (i == 0) base.select("doc_id", "text")
      else base.select(
        (col("doc_id") + lit(i * 100000000L)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"_r$i"))), " ").as("text"))
    }.reduce(_ unionByName _)
    // ONE corpus scan; every iteration re-reads the cached counts frame
    val counts = graft.ext.WordPiece.wordCounts(docs).persist()
    counts.count(): Unit
    val t0 = System.nanoTime()
    val res = graft.ext.Unigram.emTrainFromCounts(
      counts, topSeed, target, maxLen, iters, shrinkPermille)
    val trainSecs = (System.nanoTime() - t0) / 1e9

    val sizes = res.iterations.map(_.size)
    val drops = (res.seed +: res.iterations).sliding(2).map {
      case Seq(prev, cur) => prev.size - cur.size
      case _ => 0
    }.toSeq
    res.iterations.indices.foreach { i =>
      System.err.println(f"[unigram-depth] iter ${i + 1}%2d: " +
        f"${res.iterSecs(i)}%6.2f s  inventory ${sizes(i)}%5d  drops ${drops(i)}%4d")
    }

    // quality: EM inventory vs the one-shot heuristic at the SAME size
    // (chars + exactly as many multis as EM kept) on the same corpus
    def multisOf(inv: Seq[(String, Long)]): Set[String] =
      inv.iterator.map(_._1)
        .filter(p => p.codePointCount(0, p.length) >= 2).toSet
    val emMulti = multisOf(res.pieces)
    val emMultis = emMulti.size
    val heur = graft.ext.Unigram.collectPieces(
      graft.ext.Unigram.pieceFrameFromCounts(counts, emMultis, maxLen))
    // selection overlap: |EM multis ∩ heuristic multis| / |EM multis| —
    // below 1.0 means usage re-estimation reordered the cut
    val overlap =
      if (emMultis == 0) 1.0
      else multisOf(heur).intersect(emMulti).size.toDouble / emMultis
    def totalPieces(inv: Seq[(String, Long)]): Long = {
      val s0 = System.nanoTime()
      val n = graft.ext.Unigram.viterbiStats(docs, inv)
        .agg(sum(col("n_pieces"))).head().getLong(0)
      System.err.println(f"[unigram-depth] segment pass ${(System.nanoTime() - s0) / 1e9}%.2f s")
      n
    }
    val emPieces = totalPieces(res.pieces)
    val heurPieces = totalPieces(heur)

    // the published soft estimator at the same depth: wall + how far
    // its selection agrees with the gated hard path at scale
    val s0 = System.nanoTime()
    val soft = graft.ext.Unigram.emTrainSoft(
      counts, topSeed, target, maxLen, iters, shrinkPermille)
    val softSecs = (System.nanoTime() - s0) / 1e9
    val softMulti = soft.pieces.iterator.map(_._1)
      .filter(p => p.codePointCount(0, p.length) >= 2).toSet
    val softHardOverlap =
      if (emMultis == 0) 1.0
      else softMulti.intersect(emMulti).size.toDouble / emMultis
    // headOption/lastOption: iters=0 leaves logLik empty and the
    // unconditional head threw even though the JSON line guards (ADVICE r14)
    System.err.println(f"[unigram-depth] soft EM: $softSecs%.2f s, " +
      f"hard-multi overlap $softHardOverlap%.3f, " +
      f"LL ${soft.logLik.headOption.getOrElse(0.0)}%.1f -> " +
      f"${soft.logLik.lastOption.getOrElse(0.0)}%.1f")
    counts.unpersist(false): Unit

    val iterJson = res.iterSecs.indices.map(i =>
      f"""{"secs":${res.iterSecs(i)}%.2f,"inventory":${sizes(i)},"drops":${drops(i)}}""")
      .mkString("[", ",", "]")
    val json = f"""{"metric":"unigram_em_depth","value":$trainSecs%.2f,"unit":"sec","top_seed":$topSeed,"target":$target,"max_len":$maxLen,"shrink_permille":$shrinkPermille,"iters":${res.iterations.size},"replicate":$replicate,"seed_inventory":${res.seed.size},"final_inventory":${res.pieces.size},"iterations":$iterJson,"em_heuristic_multi_overlap":$overlap%.3f,"em_total_pieces":$emPieces,"heuristic_total_pieces":$heurPieces,"soft_em_secs":$softSecs%.2f,"soft_hard_multi_overlap":$softHardOverlap%.3f,"soft_ll_first":${soft.logLik.headOption.getOrElse(0.0)}%.1f,"soft_ll_last":${soft.logLik.lastOption.getOrElse(0.0)}%.1f,"sf":"$sfDir"}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      json + "\n", java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND): Unit
    spark.stop()
  }
}

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
  * CHURN (pieces in this inventory absent from the previous one — how
  * much the re-estimation actually moved the cut, the EM-is-working
  * signal; a gradual schedule with zero churn everywhere would mean the
  * one-shot heuristic ranking was already final). The quality line:
  * total corpus pieces under the EM inventory vs under the one-shot
  * frequency-heuristic inventory of the SAME size — EM must not lose
  * (UnigramEmSpec pins a corpus where it strictly wins; here the claim
  * is measured at sf-scale depth).
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
    val outPath = args.lift(6).getOrElse("bench_unigram_depth.json")
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
    val docs = graft.core.Tables.documents(spark, sfDir)
    // ONE corpus scan; every iteration re-reads the cached counts frame
    val counts = graft.ext.WordPiece.wordCounts(docs).persist()
    counts.count(): Unit
    val t0 = System.nanoTime()
    val res = graft.ext.Unigram.emTrainFromCounts(
      counts, topSeed, target, maxLen, iters, shrinkPermille)
    val trainSecs = (System.nanoTime() - t0) / 1e9

    val sizes = res.iterations.map(_.size)
    val churn = (res.seed +: res.iterations).sliding(2).map {
      case Seq(prev, cur) =>
        val prevSet = prev.iterator.map(_._1).toSet
        cur.count(p => !prevSet.contains(p._1))
      case _ => 0
    }.toSeq
    res.iterations.indices.foreach { i =>
      System.err.println(f"[unigram-depth] iter ${i + 1}%2d: " +
        f"${res.iterSecs(i)}%6.2f s  inventory ${sizes(i)}%5d  churn ${churn(i)}%4d")
    }

    // quality: EM inventory vs the one-shot heuristic at the SAME size
    // (chars + exactly as many multis as EM kept) on the same corpus
    val emMultis = res.pieces.count(p =>
      p._1.codePointCount(0, p._1.length) >= 2)
    val heur = graft.ext.Unigram.collectPieces(
      graft.ext.Unigram.pieceFrameFromCounts(counts, emMultis, maxLen))
    def totalPieces(inv: Seq[(String, Long)]): Long = {
      val s0 = System.nanoTime()
      val n = graft.ext.Unigram.viterbiStats(docs, inv)
        .agg(sum(col("n_pieces"))).head().getLong(0)
      System.err.println(f"[unigram-depth] segment pass ${(System.nanoTime() - s0) / 1e9}%.2f s")
      n
    }
    val emPieces = totalPieces(res.pieces)
    val heurPieces = totalPieces(heur)
    counts.unpersist(false): Unit

    val iterJson = res.iterSecs.indices.map(i =>
      f"""{"secs":${res.iterSecs(i)}%.2f,"inventory":${sizes(i)},"churn":${churn(i)}}""")
      .mkString("[", ",", "]")
    val json = f"""{"metric":"unigram_em_depth","value":$trainSecs%.2f,"unit":"sec","top_seed":$topSeed,"target":$target,"max_len":$maxLen,"shrink_permille":$shrinkPermille,"iters":${res.iterations.size},"final_inventory":${res.pieces.size},"iterations":$iterJson,"em_total_pieces":$emPieces,"heuristic_total_pieces":$heurPieces,"sf":"$sfDir"}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      json + "\n", java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND): Unit
    spark.stop()
  }
}

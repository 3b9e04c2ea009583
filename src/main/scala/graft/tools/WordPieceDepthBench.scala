package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Depth benchmark for the WordPiece vocabulary selection + greedy
  * encode (VERDICT r14 #8 — the last tokenizer family without a
  * production-depth artifact; `bench_bpe_depth.json` and
  * `bench_unigram_depth.json` carry BPE and unigram EM):
  *
  *  - SELECTION at ≥32k vocabulary: [[graft.ext.WordPiece
  *    .vocabFrameFromCounts]] over a content-disjoint-replicated
  *    (word, n) frame (the ScaleBench replica convention — replica i
  *    suffixes every word with `_rI`, so the distinct-word universe
  *    grows ∝ replicas while the frequency shape is preserved; the
  *    documents fixture's natural vocabulary is ~31 words). Selection
  *    cost is the axis that matters: it is distinct-substring
  *    aggregations over the WORD frame, corpus-size-free.
  *  - ENCODE at that width: the greedy longest-match kernel over a
  *    replicated corpus, with the ≥32k vocabulary riding as a codegen
  *    reference map — measured against the SAME corpus under the
  *    default ~70-piece vocabulary. The claim under test is encode
  *    DEPTH-INDEPENDENCE: per-char cost is bounded hash probes
  *    (longest-match from the remaining word length), so the deep
  *    encode wall must stay within a small factor of the base wall —
  *    vocabulary width buys coverage (fewer pieces/word), not time.
  *
  * Prints one JSON line; appends to `bench_wordpiece_depth.json`
  * (args-overridable). Usage:
  *   WordPieceDepthBench [sfDir] [topWords] [vocabReplicas]
  *                       [encodeReplicas] [outPath]
  */
object WordPieceDepthBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val topWords = args.lift(1).map(_.toInt).getOrElse(32768)
    val vocabReplicas = args.lift(2).map(_.toInt).getOrElse(1100)
    val encodeReplicas = args.lift(3).map(_.toInt).getOrElse(16)
    val outPath = args.lift(4).getOrElse("bench_wordpiece_depth.json")
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

    // content-disjoint word-frame widening for SELECTION depth: the
    // (word, n) multiset replicated with per-replica suffixes — the
    // substring/affix universe grows ∝ replicas, frequencies preserved.
    // ONE crossJoin against a range, not an N-way union: a 1000+-leg
    // union is a 1000-scan plan Catalyst chokes on; the replica axis is
    // data, not plan structure.
    val baseCounts = graft.ext.WordPiece.wordCounts(base)
    val wideCounts = baseCounts.crossJoin(
        spark.range(math.max(1, vocabReplicas)).select(col("id").as("__r")))
      .select(when(col("__r") === 0, col("word"))
          .otherwise(concat(col("word"), lit("_r"), col("__r"))).as("word"),
        col("n"))
      .persist()
    val nWords = wideCounts.count()

    val s0 = System.nanoTime()
    val deepFrame = graft.ext.WordPiece.vocabFrameFromCounts(
      wideCounts, topWords = topWords, topAffixes = 2048)
    val selectionSecs = (System.nanoTime() - s0) / 1e9
    val deep = graft.ext.WordPiece.collectVocab(deepFrame)
    val vocabSize = deep.init.size + deep.cont.size
    wideCounts.unpersist(false): Unit
    System.err.println(f"[wordpiece-depth] selection: $selectionSecs%.2f s " +
      f"over $nWords distinct words -> vocab $vocabSize " +
      f"(init ${deep.init.size}, cont ${deep.cont.size})")

    // the encode corpus: replicas 0..E-1 (a subset of the selection
    // replicas, so the deep vocabulary covers every word and char)
    val docs = (0 until math.max(1, encodeReplicas)).map { i =>
      if (i == 0) base.select("doc_id", "text")
      else base.select(
        (col("doc_id") + lit(i * 100000000L)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"_r$i"))), " ").as("text"))
    }.reduce(_ unionByName _).persist()
    val tokens = docs.select(
        sum(size(filter(split(col("text"), " "), t => t =!= ""))))
      .head().getLong(0)

    def encodePass(v: graft.ext.WordPiece.Vocab): (Double, Long) = {
      val t0 = System.nanoTime()
      val pieces = graft.ext.WordPiece.encode(docs, v)
        .agg(sum(col("n_pieces"))).head().getLong(0)
      ((System.nanoTime() - t0) / 1e9, pieces)
    }
    // warm one tiny pass so codegen/JIT isn't billed to the first arm
    graft.ext.WordPiece.encode(docs.limit(64),
      graft.ext.WordPiece.trainVocab(base)).count(): Unit
    val baseVocab = graft.ext.WordPiece.trainVocab(docs)
    val (baseSecs, basePieces) = encodePass(baseVocab)
    val (deepSecs, deepPieces) = encodePass(deep)
    docs.unpersist(false): Unit
    System.err.println(f"[wordpiece-depth] encode $tokens%d tokens: " +
      f"base vocab ${baseVocab.init.size + baseVocab.cont.size} -> " +
      f"$baseSecs%.2f s / $basePieces pieces; deep vocab $vocabSize -> " +
      f"$deepSecs%.2f s / $deepPieces pieces " +
      f"(depth ratio ${deepSecs / math.max(baseSecs, 1e-9)}%.2f)")

    val json = f"""{"metric":"wordpiece_depth","value":$selectionSecs%.2f,"unit":"sec","top_words":$topWords,"vocab_replicas":$vocabReplicas,"distinct_words":$nWords,"vocab_size":$vocabSize,"vocab_init":${deep.init.size},"vocab_cont":${deep.cont.size},"encode_replicas":$encodeReplicas,"encode_tokens":$tokens,"encode_secs_base":$baseSecs%.2f,"encode_secs_deep":$deepSecs%.2f,"encode_depth_ratio":${deepSecs / math.max(baseSecs, 1e-9)}%.2f,"pieces_base":$basePieces,"pieces_deep":$deepPieces,"base_vocab_size":${baseVocab.init.size + baseVocab.cont.size},"sf":"$sfDir"}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      json + "\n", java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND): Unit
    spark.stop()
  }
}

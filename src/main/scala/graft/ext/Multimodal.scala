package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with a typed metadata struct, processed partition-wise.
  *
  * The Spark side — schema, encoders, partition-wise batched execution,
  * feature-vector output shape — is real and tested. The DECODE step is a
  * clearly-marked deterministic STUB (this container has no image/audio
  * codecs): it derives pseudo-features from the bytes. A deployment swaps
  * `decodeStub` for a real codec without touching any plumbing.
  */
object Multimodal {

  case class MediaMeta(mime: String, width: Int, height: Int,
                       sampleRate: Int, durationMs: Long)
  case class MediaRecord(media_id: Long, kind: String, meta: MediaMeta, content: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           feature: Array[Float])

  /** ==== STUB ==== deterministic fake "decode + featurize": splitmix64
    * stream seeded by the content bytes' hash → unit-norm float vector.
    * Real implementation: decode image/audio, run the real extractor. */
  def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    var h = -3750763034362895579L
    var i = 0
    while (i < content.length) { h = (h ^ content(i)) * 1099511628211L; i += 1 }
    val out = new Array[Float](dim)
    var z = h
    var norm = 0.0
    i = 0
    while (i < dim) {
      z += 0x9e3779b97f4a7c15L
      var m = z
      m = (m ^ (m >>> 30)) * 0xbf58476d1ce4e5b9L
      m = (m ^ (m >>> 27)) * 0x94d049bb133111ebL
      m = m ^ (m >>> 31)
      out(i) = ((m >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
      norm += out(i).toDouble * out(i)
      i += 1
    }
    val n = math.sqrt(norm).toFloat
    if (n > 0) { i = 0; while (i < dim) { out(i) /= n; i += 1 } }
    out
  }

  /** Partition-wise feature extraction. `mapPartitions` (not per-row map)
    * so a real decoder can amortize codec/model initialization per
    * partition — the same batching contract as a vectorized UDF.
    *
    * `decode` is the codec seam: defaults to the deterministic stub (the
    * oracle path — q32's dump oracle pins it), and [[graft.ext.Codecs
    * .decodeReal]] swaps in the REAL dependency-free BMP/WAV decoders
    * with no other change (MultimodalSpec proves the swap on generated
    * real-format fixtures). */
  def extractFeatures(records: Dataset[MediaRecord], dim: Int = 64,
                      decode: (Array[Byte], Int) => Array[Float] = decodeStub)
      : Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition init would go here (codec handles, model weights)
      it.map { r =>
        MediaFeatures(r.media_id, r.kind, r.content.length.toLong,
          decode(r.content, dim))
      }
    }
  }

  /** ==== STUB ==== "resize": a real implementation decodes, resamples,
    * re-encodes. The stub rewrites the metadata and derives deterministic
    * replacement bytes so downstream schema/size accounting is exercised
    * for real. Partition-wise for codec-handle amortization. */
  def resize(records: Dataset[MediaRecord], width: Int, height: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val scale = math.max(1, r.content.length * (r.meta.width.max(1)) /
          (width.max(1) * math.max(1, r.meta.height.max(1))))
        val newLen = math.max(1, math.min(r.content.length, scale))
        r.copy(
          meta = r.meta.copy(width = width, height = height),
          content = java.util.Arrays.copyOf(r.content, newLen))
      }
    }
  }

  /** Deterministic REAL-format image corpus: every document renders as a
    * `side`×`side` 24bpp BMP whose pixel j is the FNV-1a gray of token
    * (j mod n_tokens) — so a near-duplicate document (few tokens differ)
    * renders as a near-identical image (few pixels differ), and the
    * image dedup path can be exercised end-to-end through the REAL
    * encoder/decoder pair ([[Codecs.encodeBmp]]/[[Codecs.decodeBmp]]),
    * not the stub seam. Pure integer arithmetic, reproducible anywhere. */
  def synthesizeBmpCorpus(docs: DataFrame, side: Int = 16): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    require(side >= 8)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = if (text == null || text.isEmpty) Array("") else text.split(" ")
          val rgb = new Array[Byte](side * side * 3)
          var j = 0
          while (j < side * side) {
            val t = toks(j % toks.length)
            var h = 0x811c9dc5
            var i = 0
            while (i < t.length) { h = (h ^ t.charAt(i)) * 0x01000193; i += 1 }
            val gray = (h & 0xff).toByte
            rgb(j * 3) = gray; rgb(j * 3 + 1) = gray; rgb(j * 3 + 2) = gray
            j += 1
          }
          MediaRecord(id, "image",
            MediaMeta("image/bmp", side, side, 0, 0L),
            Codecs.encodeBmp(side, side, rgb))
        }
      }
  }

  /** Average-hash (aHash) perceptual fingerprint over REAL decoded
    * bitmaps: decode ([[Codecs.decodeBmp]]), reduce to an 8×8 grid of
    * integer block-sums, set bit i iff block i's mean exceeds the global
    * mean (compared as exact integer cross-products — no division, no
    * floats, bit-identical on any engine/JVM). Two images within a few
    * differing pixels land within a few Hamming bits — the standard
    * cheap image near-dup signal ahead of an embedding pass. */
  def imageAHash(records: Dataset[MediaRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val img = Codecs.decodeBmp(r.content)
        val (w, h) = (img.width, img.height)
        val sums = new Array[Long](64)
        val counts = new Array[Long](64)
        var y = 0
        while (y < h) {
          val by = y * 8 / h
          var x = 0
          while (x < w) {
            val bx = x * 8 / w
            val o = (y * w + x) * 3
            // integer luma (Rec.601 weights scaled by 1000)
            val lum = 299L * (img.rgb(o) & 0xff) +
              587L * (img.rgb(o + 1) & 0xff) + 114L * (img.rgb(o + 2) & 0xff)
            sums(by * 8 + bx) += lum
            counts(by * 8 + bx) += 1
            x += 1
          }
          y += 1
        }
        var total = 0L; var n = 0L; var i = 0
        while (i < 64) { total += sums(i); n += counts(i); i += 1 }
        var fp = 0L
        i = 0
        while (i < 64) {
          // block_mean > global_mean ⟺ sums(i) * n > total * counts(i)
          if (counts(i) > 0 && sums(i) * n > total * counts(i)) fp |= (1L << i)
          i += 1
        }
        (r.media_id, fp)
      }
    }.toDF("id", "fp")
  }

  /** Difference-hash (dHash) perceptual fingerprint over REAL decoded
    * bitmaps: decode ([[Codecs.decodeBmp]]), reduce to a 9×8 grid of
    * integer luma block-sums, set bit (y·8+x) iff block (y,x)'s mean
    * exceeds its RIGHT neighbor's (compared as exact integer
    * cross-products — no division, no floats, bit-identical on any
    * engine/JVM). The GRADIENT complement to [[imageAHash]]'s
    * brightness threshold: a global exposure shift flips many aHash
    * bits but no dHash bit, so image-dedup pipelines run both. Same
    * scale shape: map-only decode+hash per record, 8 bytes out. */
  def imageDHash(records: Dataset[MediaRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val img = Codecs.decodeBmp(r.content)
        val (w, h) = (img.width, img.height)
        val sums = new Array[Long](72) // 9 wide × 8 tall
        val counts = new Array[Long](72)
        var y = 0
        while (y < h) {
          val by = y * 8 / h
          var x = 0
          while (x < w) {
            val bx = x * 9 / w
            val o = (y * w + x) * 3
            val lum = 299L * (img.rgb(o) & 0xff) +
              587L * (img.rgb(o + 1) & 0xff) + 114L * (img.rgb(o + 2) & 0xff)
            sums(by * 9 + bx) += lum
            counts(by * 9 + bx) += 1
            x += 1
          }
          y += 1
        }
        var fp = 0L
        var by = 0
        while (by < 8) {
          var bx = 0
          while (bx < 8) {
            val a = by * 9 + bx; val b = a + 1
            // mean(a) > mean(b) ⟺ sums(a)·counts(b) > sums(b)·counts(a)
            if (counts(a) > 0 && counts(b) > 0 &&
              sums(a) * counts(b) > sums(b) * counts(a))
              fp |= (1L << (by * 8 + bx))
            bx += 1
          }
          by += 1
        }
        (r.media_id, fp)
      }
    }.toDF("id", "fp")
  }

  case class FrameSample(media_id: Long, frame_idx: Int, ts_ms: Long, frame: Array[Byte])

  /** ==== STUB ==== frame sampling: one output row per `everyMs` of
    * duration (real impl: seek + decode the frame). The 1→N generator
    * shape (flatMap over partitions) and output schema are the real
    * contract; frame bytes are a deterministic slice. */
  def sampleFrames(records: Dataset[MediaRecord], everyMs: Long = 1000L): Dataset[FrameSample] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        val n = math.max(1, (r.meta.durationMs / everyMs).toInt)
        (0 until n).iterator.map { i =>
          val start = if (r.content.isEmpty) 0 else (i * r.content.length / n)
          val end = if (r.content.isEmpty) 0 else ((i + 1) * r.content.length / n)
          FrameSample(r.media_id, i, i * everyMs,
            java.util.Arrays.copyOfRange(r.content, start, end))
        }
      }
    }
  }

  /** Deterministic synthetic media corpus derived from `documents`:
    * text bytes stand in for encoded payloads; metadata is derived from
    * doc stats. Exercises binary columns + struct metadata end-to-end. */
  def synthesizeFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        struct(
          when(col("doc_id") % 3 === 0, "image/png")
            .when(col("doc_id") % 3 === 1, "audio/wav")
            .otherwise("video/mp4").as("mime"),
          (pmod(col("doc_id"), lit(4)) * 256 + 256).cast("int").as("width"),
          (pmod(col("doc_id"), lit(3)) * 256 + 256).cast("int").as("height"),
          lit(16000).as("sampleRate"),
          (length(col("text")) * 10).cast("long").as("durationMs")).as("meta"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaRecord]
  }

  /** End-to-end demo pipeline over `documents`: synthesize → extract →
    * aggregate per kind (row counts + mean feature norm sanity stat).
    *
    * The norm statistic is quantized per row to integer 1e-12 units
    * BEFORE the group aggregate: a floating-point `avg` across rows sums
    * in partition order and is not bit-stable under repartitioning, while
    * the per-row fold (sequential over one array, double arithmetic) is
    * deterministic — so quantize the deterministic scalar, then sum
    * exactly. `mean_sq_norm_e12 DIV 1e12` ≈ 1 for unit-norm features. */
  def featurePipeline(spark: SparkSession, docs: DataFrame, dim: Int = 64): DataFrame = {
    val feats = extractFeatures(synthesizeFromDocuments(docs), dim)
    feats.toDF()
      .withColumn("__sq", aggregate(col("feature"), lit(0.0d),
        (a, x) => a + x.cast("double") * x.cast("double")))
      .withColumn("__sq_e12", floor(col("__sq") * lit(1.0e12)).cast("long"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        expr("sum(__sq_e12) div count(1)").as("mean_sq_norm_e12"))
      .orderBy("kind")
  }
}

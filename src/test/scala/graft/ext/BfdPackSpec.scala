package graft.ext

import graft.SparkTestBase

/** Bucketed best-fit-decreasing packing ([[Sharding.bfdPack]]) and its
  * first-fit baseline ([[Sharding.ffPack]]): hand-derivable placements
  * incl. the lowest-index tie-break and the oversized-doc rule, a
  * fixture where BFD strictly beats FF on padding, bucket independence,
  * and input-partitioning invariance. */
class BfdPackSpec extends SparkTestBase {
  import spark.implicits._

  private def assignOf(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq

  test("hand case: fullest-fitting bin, lowest-index tie-break") {
    // capacity 10, arrival (tokens desc, id): 6,5,4,3,2
    //  6→bin1; 5→bin2; 4→bin1 (6 fullest fitting); 3→bin2 (5+3=8);
    //  2→bin2 (8 fullest fitting; bin1 is full at 10)
    val docs = Seq((1L, 2L), (2L, 6L), (3L, 5L), (4L, 4L), (5L, 3L))
      .toDF("doc_id", "n_tokens")
    val got = assignOf(Sharding.bfdPack(docs, "doc_id", "n_tokens",
      capacity = 10L, bucketSize = 1000L))
    assert(got == Seq((1L, 2L, 0L, 2L), (2L, 6L, 0L, 1L), (3L, 5L, 0L, 2L),
      (4L, 4L, 0L, 1L), (5L, 3L, 0L, 2L)), s"BFD placement mismatch: $got")
    // equal-load tie: two bins at 4, next doc fits both → LOWEST index
    val tie = Seq((1L, 4L), (2L, 4L), (3L, 7L), (4L, 5L))
      .toDF("doc_id", "n_tokens")
    // arrival: 7,5,4,4 → 7→bin1; 5→bin2? no: 7+5=12>10 → bin2;
    //  4→bin2 (5 fullest fitting; 7+4=11>10); 4→... bin1 7+4>10,
    //  bin2 9+4>10 → bin3
    val gotTie = assignOf(Sharding.bfdPack(tie, "doc_id", "n_tokens",
      capacity = 10L, bucketSize = 1000L))
    assert(gotTie == Seq((1L, 4L, 0L, 2L), (2L, 4L, 0L, 3L),
      (3L, 7L, 0L, 1L), (4L, 5L, 0L, 2L)), s"tie-break mismatch: $gotTie")
  }

  test("oversized doc sits alone; nothing joins its bin") {
    val docs = Seq((1L, 15L), (2L, 9L), (3L, 1L)).toDF("doc_id", "n_tokens")
    // arrival: 15,9,1 → 15→bin1 (oversized, alone); 9→bin2; 1→bin2
    val got = assignOf(Sharding.bfdPack(docs, "doc_id", "n_tokens",
      capacity = 10L, bucketSize = 1000L))
    assert(got == Seq((1L, 15L, 0L, 1L), (2L, 9L, 0L, 2L), (3L, 1L, 0L, 2L)),
      s"oversized rule mismatch: $got")
  }

  test("BFD strictly beats first-fit on the classic fixture") {
    // id order 2,6,5,4,3 at capacity 10: FF opens 3 bins (8,9,3 →
    // 10 padded); BFD packs perfectly into 2 (0 padded)
    val docs = Seq((1L, 2L), (2L, 6L), (3L, 5L), (4L, 4L), (5L, 3L))
      .toDF("doc_id", "n_tokens")
    def waste(df: org.apache.spark.sql.DataFrame) =
      Sharding.packingWaste(df, capacity = 10L)
        .as[(Long, Long, Long)].head()
    val (ffBins, ffPad, _) = waste(Sharding.ffPack(docs, "doc_id", "n_tokens", 10L, 1000L))
    val (bfdBins, bfdPad, _) = waste(Sharding.bfdPack(docs, "doc_id", "n_tokens", 10L, 1000L))
    assert((ffBins, ffPad) == ((3L, 10L)), s"FF baseline: $ffBins bins, $ffPad padded")
    assert((bfdBins, bfdPad) == ((2L, 0L)), s"BFD: $bfdBins bins, $bfdPad padded")
  }

  test("buckets pack independently; partitioning cannot move a placement") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        TextAnalysis.tokenCount(org.apache.spark.sql.functions.col("text"))
          .as("n_tokens"))
    val base = assignOf(Sharding.bfdPack(docs, "doc_id", "n_tokens", 256L, 128L))
    val shuffled = assignOf(Sharding.bfdPack(docs.repartition(13), "doc_id",
      "n_tokens", 256L, 128L))
    assert(base == shuffled, "assignment must not depend on partitioning")
    // bucket key is id-range: every doc's bucket is floor(id/128)
    assert(base.forall { case (id, _, b, _) => b == id / 128 })
    // independence: packing ONLY bucket 0's docs reproduces bucket 0
    val only0 = assignOf(Sharding.bfdPack(docs.filter("doc_id < 128"),
      "doc_id", "n_tokens", 256L, 128L))
    assert(only0 == base.filter(_._3 == 0L),
      "a bucket's placement must not see other buckets")
  }
}

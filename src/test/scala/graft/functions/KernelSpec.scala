package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class KernelSpec extends SparkTestBase {
  import spark.implicits._

  test("iso_micros is byte-identical to date_format across random micros") {
    val rnd = new scala.util.Random(7)
    // span ±200 years around the epoch plus exact boundary cases
    val micros = Seq(0L, -1L, 1L, 86399999999L, -86400000000L) ++
      Seq.fill(2000)((rnd.nextDouble() * 2 - 1) * 200L * 365 * 86400000000L)
        .map(_.toLong)
    val df = micros.toDF("us").select(timestamp_micros($"us").as("ts"))
    val bad = df.select(
        VectorFunctions.iso_micros($"ts").as("fast"),
        date_format($"ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("ref"))
      .filter($"fast" =!= $"ref")
    assert(bad.count() == 0, bad.take(3).mkString(","))
  }

  test("hashed shingles: set sizes and pair intersections match the string path") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    // cardinality equivalence per doc (no 64-bit collisions on this corpus)
    val sizes = docs.select(
        size(array_distinct(graft.ext.Dedup.shingles($"text", 3))).as("s_str"),
        size(array_distinct(graft.ext.Dedup.hashedShingles($"text", 3))).as("s_hash"))
      .filter($"s_str" =!= $"s_hash")
    assert(sizes.count() == 0)
    // pairwise intersection sizes identical => identical jaccard downstream
    val sh = docs.select($"doc_id",
      array_distinct(graft.ext.Dedup.shingles($"text", 3)).as("str"),
      array_distinct(graft.ext.Dedup.hashedShingles($"text", 3)).as("hsh"))
    val pairs = sh.as("a").join(sh.as("b"), expr("a.doc_id + 1 = b.doc_id"))
      .select(
        size(array_intersect($"a.str", $"b.str")).as("i_str"),
        size(array_intersect($"a.hsh", $"b.hsh")).as("i_hsh"))
      .filter($"i_str" =!= $"i_hsh")
    assert(pairs.count() == 0)
  }

  test("hashed shingles short-doc fallback yields one shingle") {
    val one = Seq("a b").toDF("text")
      .select(graft.ext.Dedup.hashedShingles($"text", 3).as("sh"))
      .head().getSeq[Long](0)
    assert(one.length == 1)
    // and equal texts give equal shingle hashes
    val two = Seq(("x y z w", "x y z w")).toDF("t1", "t2")
      .select(graft.ext.Dedup.hashedShingles($"t1", 3).as("a"),
              graft.ext.Dedup.hashedShingles($"t2", 3).as("b"))
      .head()
    assert(two.getSeq[Long](0) == two.getSeq[Long](1))
  }
  test("hashed shingles: byte-level tokenizer edge cases match the string path") {
    // consecutive spaces (empty tokens), leading/trailing space, multi-byte
    // UTF-8 (no 0x20 inside a codepoint), and the empty string
    val cases = Seq("a  b c", " a b", "a b ", "中文 文本 测试 again mixed",
      "", " ", "一 二 三", "tab\tis one token")
    val df = cases.toDF("text")
    val bad = df.select(
        size(array_distinct(graft.ext.Dedup.shingles($"text", 3))).as("s"),
        size(array_distinct(graft.ext.Dedup.hashedShingles($"text", 3))).as("h"))
      .filter($"s" =!= $"h")
    assert(bad.count() == 0)
    // 2-gram windows on a mixed doc: same count too
    val bad2 = df.select(
        size(array_distinct(graft.ext.Dedup.shingles($"text", 2))).as("s"),
        size(array_distinct(graft.ext.Dedup.hashedShingles($"text", 2))).as("h"))
      .filter($"s" =!= $"h")
    assert(bad2.count() == 0)
  }

  test("min_k_ids: exact above 2^53 where a double-scored heap collapses ties") {
    val big = 1L << 53
    // big+1 and big+2 are the SAME double (2^53 precision cliff): a
    // -id.toDouble score cannot order them; the long heap must
    val ids = Seq(big + 4, big + 1, big + 3, big + 2, 7L)
    val out = ids.toDF("id").agg(TopK.min_k_ids(3)($"id").as("top"))
      .head().getSeq[Long](0)
    assert(out == Seq(7L, big + 1, big + 2))
    // grouped, map-side-combinable path: per-group smallest ascending
    val grouped = Seq((1, big + 2), (1, big + 1), (1, 5L), (2, big + 9), (2, big + 8))
      .toDF("g", "id").groupBy("g").agg(TopK.min_k_ids(2)($"id").as("top"))
      .orderBy("g").collect().map(_.getSeq[Long](1).toSeq).toSeq
    assert(grouped == Seq(Seq(5L, big + 1), Seq(big + 8, big + 9)))
  }

}

package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("interleaveBits: Morton interleave matches the hand-computed value") {
    // c1 = 0b11, c2 = 0b01 at 2 bits: bits land (c1b0->0, c2b0->1,
    // c1b1->2, c2b1->3) => 0b0111 = 7
    val z = Seq((3L, 1L)).toDF("a", "b")
      .select(Layout.interleaveBits(Seq($"a", $"b"), 2).as("z"))
      .as[Long].head()
    assert(z == 7L)
    // single column degenerates to the identity on [0, 2^bits)
    val id = Seq(5L).toDF("a")
      .select(Layout.interleaveBits(Seq($"a"), 4).as("z")).as[Long].head()
    assert(id == 5L)
  }

  test("z-ordered files prune on EITHER clustered column; linear sort prunes on one") {
    // two genuinely independent dims: the full 200x200 grid, once each
    val df = (0 until 40000)
      .map(i => (i.toLong, (i % 200).toLong, (i / 200).toLong))
      .toDF("id", "x", "y")
    val dir = tmpDir("layout")
    Layout.writeZordered(df, Seq("x", "y"), s"$dir/z", numFiles = 16)
    // baseline: classic linear sort by (x, y) — x-filters prune, y-filters can't
    df.repartitionByRange(16, $"x", $"y").sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(s"$dir/linear")

    def filesTouched(path: String, cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(cond)
        .select(input_file_name()).distinct().count()

    val zX = filesTouched(s"$dir/z", $"x" <= 20)
    val zY = filesTouched(s"$dir/z", $"y" <= 20)
    val linX = filesTouched(s"$dir/linear", $"x" <= 20)
    val linY = filesTouched(s"$dir/linear", $"y" <= 20)

    // the linear layout is surgical on its prefix and hopeless on y
    assert(linX <= 4, s"linear x-filter touched $linX files")
    assert(linY == 16, s"linear y-filter should touch all files, got $linY")
    // the z-order touches a bounded fraction on BOTH dimensions
    assert(zX <= 8, s"z-order x-filter touched $zX of 16 files")
    assert(zY <= 8, s"z-order y-filter touched $zY of 16 files")

    // and the layout is a permutation, not a transformation
    val a = spark.read.parquet(s"$dir/z").select("id", "x", "y")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val b = df.select("id", "x", "y").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }
}

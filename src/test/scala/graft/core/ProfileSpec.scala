package graft.core

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("profile counts nulls, exact distincts, and min/max in one pass") {
    val df = Seq(
      (1L, Some("a"), Some(10)),
      (2L, None, Some(20)),
      (3L, Some("b"), None),
      (4L, Some("a"), Some(20))).toDF("id", "s", "v")
    val p = Profile.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(p("id") == ((0L, 4L, "1", "4")))
    assert(p("s") == ((1L, 2L, "a", "b")))
    assert(p("v") == ((1L, 2L, "10", "20")))
    // melted output is ordered by column name
    val names = Profile.profile(df, Seq("v", "id", "s"))
      .select("column_name").as[String].collect().toSeq
    assert(names == Seq("id", "s", "v"))
  }
}

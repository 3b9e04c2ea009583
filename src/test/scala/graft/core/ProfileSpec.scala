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

  test("approxProfile: same schema, exact nulls/min/max, HLL distinct, no Expand") {
    val df = (1 to 5000).map(i => (i.toLong, s"s${i % 97}", i % 13)).toDF("id", "s", "v")
    val exact = Profile.profile(df, Seq("id", "s", "v"))
    val approx = Profile.approxProfile(df, Seq("id", "s", "v"))
    assert(approx.schema == exact.schema)

    val e = exact.collect().map(r => r.getString(0) -> r).toMap
    val a = approx.collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("id", "s", "v")) {
      assert(a(c).getLong(1) == e(c).getLong(1), s"$c nulls")       // exact
      assert(a(c).getString(3) == e(c).getString(3), s"$c min")     // exact
      assert(a(c).getString(4) == e(c).getString(4), s"$c max")     // exact
      val (est, act) = (a(c).getLong(2).toDouble, e(c).getLong(2).toDouble)
      assert(math.abs(est - act) / act < 0.15, s"$c distinct: $est vs $act")
    }

    // the scale property: HLL sketches accumulate per row — no Expand
    // row replication in the plan (the exact form NEEDS one)
    val approxPlan = approx.queryExecution.executedPlan.toString
    val exactPlan = exact.queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), "approxProfile must not Expand")
    assert(exactPlan.contains("Expand"), "exact multi-distinct plans via Expand")
  }
}

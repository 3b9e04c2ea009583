package graft.core

import graft.SparkTestBase

/** The pure-SQL surface: corpus views + registered custom functions. */
class SqlSurfaceSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("spark.sql over registered views matches the DataFrame path") {
    GraftSession.enableSqlSurface(spark, dir)
    val sql = spark.sql(
      """SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin).collect()
    val df = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag").count()
      .orderBy("l_returnflag").collect()
    assert(sql.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      df.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("custom functions callable from SQL") {
    GraftSession.enableSqlSurface(spark, dir)
    val sim = spark.sql(
      """SELECT vec_id, cosine_similarity(embedding, embedding) AS self_sim
        |FROM embeddings LIMIT 5""".stripMargin).collect()
    sim.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-6))
    val fp = spark.sql(
      "SELECT token_fingerprint64(split(text, ' ')) AS fp FROM documents LIMIT 3")
    assert(fp.collect().length == 3)
    val sh = spark.sql(
      "SELECT simhash64(split(text, ' ')) AS h FROM documents LIMIT 3")
    assert(sh.collect().length == 3)
  }
  test("round-2 kernels callable from SQL") {
    GraftSession.enableSqlSurface(spark, dir)
    val iso = spark.sql(
      """SELECT iso_micros(TIMESTAMP '2026-01-02 03:04:05.123456') AS s""").head().getString(0)
    assert(iso == "2026-01-02T03:04:05.123456")
    val sh = spark.sql(
      "SELECT size(hashed_shingles(text, 3)) AS n FROM documents LIMIT 3").collect()
    assert(sh.forall(_.getInt(0) > 0))
  }

}

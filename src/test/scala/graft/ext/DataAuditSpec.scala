package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DataAuditSpec extends SparkTestBase {
  import spark.implicits._

  test("rowRules: planted violations counted in one scan") {
    val df = Seq(
      (1L, 0.05, 10.0), (2L, -0.01, 20.0), (3L, 0.2, -5.0), (4L, 0.08, 1.0))
      .toDF("id", "disc", "price")
    val rows = DataAudit.rowRules(df, Seq(
        "disc_range" -> (col("disc") < 0 || col("disc") > 0.1),
        "price_pos" -> (col("price") <= 0)))
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(rows == Seq(("disc_range", 2L, 4L), ("price_pos", 1L, 4L)))
    // all rules fuse into ONE pass over the table
    val plan = DataAudit.rowRules(df, Seq(
        "a" -> (col("disc") < 0), "b" -> (col("price") <= 0),
        "c" -> (col("id") < 0))).queryExecution.executedPlan.toString
    val scans = "LocalTableScan|Scan ".r.findAllIn(plan).size
    assert(scans == 1, s"expected one scan, got $scans:\n$plan")
  }

  test("orphans and duplicateKeys: planted integrity breaks") {
    val fact = Seq((1L, "x"), (2L, "y"), (9L, "orphan"), (9L, "orphan2"))
      .toDF("fk", "v")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("pk", "w")
    val o = DataAudit.orphans(fact, col("fk"), dim, col("pk"), "fk_orphans")
      .as[(String, Long, Long)].head()
    assert(o == (("fk_orphans", 2L, 4L)))
    val dups = DataAudit.duplicateKeys(fact, col("fk"), "fk_dups")
      .as[(String, Long, Long)].head()
    assert(dups == (("fk_dups", 1L, 4L))) // 4 rows, 3 distinct keys
    // the clean dimension audits clean
    val clean = DataAudit.duplicateKeys(dim, col("pk"), "pk_dups")
      .as[(String, Long, Long)].head()
    assert(clean == (("pk_dups", 0L, 3L)))
    // full report unions and stays deterministic under repartition
    val rep = DataAudit.audit(Seq(
        DataAudit.orphans(fact.repartition(3), col("fk"), dim, col("pk"), "fk_orphans"),
        DataAudit.duplicateKeys(fact.repartition(2), col("fk"), "fk_dups")))
      .as[(String, Long, Long)].collect().toSet
    assert(rep == Set(("fk_orphans", 2L, 4L), ("fk_dups", 1L, 4L)))
  }
}

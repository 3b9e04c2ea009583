package graft.cdc

import graft.SparkTestBase

/** [[Versioned.columnChurn]]: transition accounting against hand-counted
  * fixtures — null-safe compares, delete transitions excluded, one fused
  * scan melted per column. */
class ColumnChurnSpec extends SparkTestBase {
  import spark.implicits._

  test("counts changed transitions per column, excluding deletes") {
    // key 1: insert(a,1) -> update(a,2) -> update(b,2)
    //   transitions: 2; status changes: 1 (a->b); price changes: 1 (1->2)
    // key 2: insert(x,5) -> delete -> (reinsert)(x,5)
    //   delete-adjacent transitions excluded entirely
    // key 3: insert(null,7) -> update(null,7): null == null, no change
    val log = Seq(
      (1L, "insert", "2026-01-01T10:00:00", "a", 1L),
      (1L, "update", "2026-01-01T11:00:00", "a", 2L),
      (1L, "update", "2026-01-01T12:00:00", "b", 2L),
      (2L, "insert", "2026-01-01T10:00:00", "x", 5L),
      (2L, "delete", "2026-01-01T11:00:00", null.asInstanceOf[String], 0L),
      (2L, "insert", "2026-01-01T12:00:00", "x", 5L),
      (3L, "insert", "2026-01-01T10:00:00", null.asInstanceOf[String], 7L),
      (3L, "update", "2026-01-01T11:00:00", null.asInstanceOf[String], 7L))
      .toDF("pk", "action", "update_date", "status", "price")
    val rows = Versioned.columnChurn(log, Seq("pk"), Seq("status", "price"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // transitions: key1 has 2, key2 has 0 (both touch a delete), key3 has 1
    assert(rows("status") == ((3L, 1L)), s"status: ${rows("status")}")
    assert(rows("price") == ((3L, 1L)), s"price: ${rows("price")}")
    assert(rows.size == 2)
  }

  test("hostile column names (space, dot, hyphen, quote, backtick) melt correctly") {
    // regression: raw names were spliced into a stack() SQL string, so a
    // dot mis-resolved as a field path and a quote broke parsing
    val hostile = Seq("order status", "unit.price", "qty-on-hand", "o'brien", "a`b")
    val log = Seq(
      (1L, "insert", "2026-01-01T10:00:00", "a", 1L, 2L, "x", 9L),
      (1L, "update", "2026-01-01T11:00:00", "b", 1L, 3L, "x", 9L))
      .toDF(Seq("pk", "action", "update_date") ++ hostile: _*)
    val rows = Versioned.columnChurn(log, Seq("pk"), hostile)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows.keySet == hostile.toSet, s"every hostile name melts: $rows")
    assert(rows("order status") == ((1L, 1L)) && rows("unit.price") == ((1L, 0L)))
    assert(rows("qty-on-hand") == ((1L, 1L)) && rows("o'brien") == ((1L, 0L)))
    assert(rows("a`b") == ((1L, 0L)))
  }

  test("empty changelog yields zero counts, not an empty frame") {
    val log = Seq.empty[(Long, String, String, String, Long)]
      .toDF("pk", "action", "update_date", "status", "price")
    val out = Versioned.columnChurn(log, Seq("pk"), Seq("status", "price"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map("status" -> ((0L, 0L)), "price" -> ((0L, 0L))))
  }
}

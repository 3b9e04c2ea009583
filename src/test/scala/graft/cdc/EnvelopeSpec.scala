package graft.cdc

import graft.SparkTestBase

class EnvelopeSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val parsed = Envelope.parse(Fixtures.lines.toDF("value")).cache()

  test("envelope fields extracted; payload stays raw JSON") {
    val rows = parsed.collect()
    assert(rows.length == Fixtures.lines.length)
    val first = rows.head
    assert(first.getAs[String]("object") == "products")
    assert(first.getAs[String]("action") == "insert")
    assert(first.getAs[String]("payload").contains("\"product_id\":\"p1\""))
  }

  test("projection: registry types, synthetic columns, update_date as STRING") {
    val prod = Envelope.project(parsed, Fixtures.registry("products"))
    val row = prod.filter($"product_id" === "p1" && $"action" === "insert").head()
    assert(row.getAs[Double]("weight_g") == 225.0)
    assert(row.getAs[Long]("photos_qty") == 1L)
    // registry declares STRING here: raw ISO text passes through verbatim
    assert(row.getAs[String]("update_date") == "2026-01-01T10:00:00.000Z")
  }

  test("projection: update_date as TIMESTAMP for users") {
    val users = Envelope.project(parsed, Fixtures.registry("users"))
    val row = users.filter($"action" === "insert").head()
    assert(row.getAs[java.sql.Timestamp]("update_date") ==
      java.sql.Timestamp.from(java.time.Instant.parse("2026-01-01T10:30:00Z")))
  }

  test("null-valued and missing payload fields both land as SQL NULL") {
    val prod = Envelope.project(parsed, Fixtures.registry("products"))
    val p2 = prod.filter($"product_id" === "p2").head()
    assert(p2.isNullAt(p2.fieldIndex("category")))   // explicit null
    assert(p2.isNullAt(p2.fieldIndex("photos_qty"))) // missing key
  }

  test("delete tombstone carries key only; other columns NULL") {
    val prod = Envelope.project(parsed, Fixtures.registry("products"))
    val del = prod.filter($"action" === "delete").head()
    assert(del.getAs[String]("product_id") == "p1")
    assert(del.isNullAt(del.fieldIndex("category")))
  }

  test("malformed line does not kill the parse; survives with _raw") {
    val bad = Envelope.parse(Seq("{not json", Fixtures.lines.head).toDF("value"))
    assert(bad.count() == 2)
    assert(bad.filter($"object".isNull).count() == 1)
  }
}

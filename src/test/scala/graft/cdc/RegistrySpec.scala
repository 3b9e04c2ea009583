package graft.cdc

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class RegistrySpec extends AnyFunSuite {

  test("parses registry-shaped JSON into TableSpecs") {
    val r = Fixtures.registry
    assert(r.keySet == Set("products", "users"))
    assert(r("products").physicalName == "warehouse.products_cdc")
    assert(r("products").schema.fieldNames.toSeq ==
      Seq("product_id", "category", "weight_g", "photos_qty", "action", "update_date"))
  }

  test("BigQuery legacy type mapping (SURVEY.md §1.2)") {
    assert(Registry.sparkType("STRING") == StringType)
    assert(Registry.sparkType("FLOAT") == DoubleType)
    assert(Registry.sparkType("INT64") == LongType)
    assert(Registry.sparkType("TIMESTAMP") == TimestampType)
    assertThrows[IllegalArgumentException](Registry.sparkType("GEOGRAPHY"))
  }

  test("update_date type split: STRING for products, TIMESTAMP for users") {
    assert(Fixtures.registry("products").updateDateType == StringType)
    assert(Fixtures.registry("users").updateDateType == TimestampType)
  }

  test("payloadSchema excludes the synthetic columns") {
    assert(Fixtures.registry("users").payloadSchema.fieldNames.toSeq ==
      Seq("user_id", "email", "balance"))
  }

  test("refreshCompatible: type flips rejected, adds/removes/new tables pass") {
    def reg(fields: String): Map[String, TableSpec] = Registry.fromJson(
      s"""{"items": {"table_name": "items_cdc", "schema": {"fields": [$fields]}}}""")
    val cur = reg("""{"name":"item_id","type":"INT64"},{"name":"price","type":"FLOAT"},
                    |{"name":"action","type":"STRING"},{"name":"update_date","type":"TIMESTAMP"}"""
      .stripMargin)

    // type flip (FLOAT -> STRING): reject, keep the old spec
    val flip = reg("""{"name":"item_id","type":"INT64"},{"name":"price","type":"STRING"},
                     |{"name":"action","type":"STRING"},{"name":"update_date","type":"TIMESTAMP"}"""
      .stripMargin)
    val (m1, r1) = Registry.refreshCompatible(cur, flip)
    assert(m1("items") == cur("items"))
    assert(r1.size == 1 && r1.head.contains("items") && r1.head.contains("price"))

    // added column + new table: both pass, nothing rejected
    val grown = Registry.fromJson(
      """{"items": {"table_name": "items_cdc", "schema": {"fields": [
        |  {"name":"item_id","type":"INT64"},{"name":"price","type":"FLOAT"},
        |  {"name":"currency","type":"STRING"},
        |  {"name":"action","type":"STRING"},{"name":"update_date","type":"TIMESTAMP"}]}},
        | "extras": {"table_name": "extras_cdc", "schema": {"fields": [
        |  {"name":"id","type":"INT64"},
        |  {"name":"action","type":"STRING"},{"name":"update_date","type":"TIMESTAMP"}]}}}"""
        .stripMargin)
    val (m2, r2) = Registry.refreshCompatible(cur, grown)
    assert(r2.isEmpty)
    assert(m2("items").schema.fieldNames.contains("currency"))
    assert(m2.contains("extras"))

    // removed column: passes (mergeSchema reads union it back as NULLs)
    val shrunk = reg("""{"name":"item_id","type":"INT64"},
                       |{"name":"action","type":"STRING"},{"name":"update_date","type":"TIMESTAMP"}"""
      .stripMargin)
    val (m3, r3) = Registry.refreshCompatible(cur, shrunk)
    assert(r3.isEmpty && !m3("items").schema.fieldNames.contains("price"))
  }
}

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
}

package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

class CanonSpec extends SparkTestBase {
  import spark.implicits._

  test("ambiguous types render as engine-neutral strings; others pass through") {
    val df = Seq((1L, "2026-03-04 05:06:07.123456", BigDecimal("12.30"), 1.5))
      .toDF("id", "s", "dec", "dbl")
      .select($"id", $"s".cast("timestamp").as("ts"),
        $"s".cast("timestamp_ntz").as("ntz"),
        $"s".cast("date").as("d"),
        $"dec".cast(DecimalType(18, 2)).as("dec"), $"dbl")
    val out = Canon.canonical(df)
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("ts") == StringType && types("ntz") == StringType &&
      types("d") == StringType && types("dec") == StringType)
    assert(types("id") == LongType && types("dbl") == DoubleType)
    val r = out.head()
    assert(r.getString(1) == "2026-03-04T05:06:07.123456")
    assert(r.getString(2) == "2026-03-04T05:06:07.123456")
    assert(r.getString(3) == "2026-03-04")
    assert(r.getString(4) == "12.30")
  }

  test("identity (same plan) when no column needs rendering") {
    val df = Seq((1L, "x", 2.0)).toDF("a", "b", "c")
    assert(Canon.canonical(df) eq df)
  }

  test("null timestamps and decimals render as NULL") {
    val df = Seq(Tuple1(1L)).toDF("id")
      .select($"id", lit(null).cast("timestamp").as("ts"),
        lit(null).cast(DecimalType(18, 2)).as("dec"))
    val r = Canon.canonical(df).head()
    assert(r.isNullAt(1) && r.isNullAt(2))
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-agnostic table IO: the same declared-schema read contract over
  * parquet, ORC, CSV, and JSON(L) (the reference's S5 dynamic file scan
  * generalized past its gz-JSONL contract — `dataflow-cdc-stream.py:64`
  * reads exactly one wire format; a warehouse ingests whatever lands).
  *
  * Contract points, all spec-pinned (FormatsSpec):
  *  - schema is DECLARED, never inferred — inference samples the data and
  *    can flip types between batches (the same registry-driven discipline
  *    as the CDC path, `cdc/Registry`);
  *  - round trips are lossless for the warehouse's column types
  *    (timestamps carry explicit millis patterns in text formats; doubles
  *    survive via Java shortest-representation);
  *  - predicate pushdown reaches parquet and ORC scans as vectorized
  *    columnar batches; CSV/JSON "pushdown" only short-circuits parsing
  *    of non-matching rows — every byte is still read, row-at-a-time
  *    (`Batched: false`). The spec pins both plan facts, so a pipeline
  *    author choosing a landing format sees the cost difference in a
  *    test, not in a 100 TB bill. Text formats are LANDING formats:
  *    convert to columnar at the first hop (`convert`).
  */
object Formats {

  /** Text-format options that make timestamp round trips exact to the
    * millisecond (Spark's default CSV/JSON writers emit micros patterns
    * the reader parses back — but being explicit here is the contract). */
  private val TsPattern = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"

  val Supported: Set[String] = Set("parquet", "orc", "csv", "json")

  /** Read `path` as `format` with the DECLARED schema. */
  def readAs(spark: SparkSession, path: String, format: String,
             schema: StructType): DataFrame = {
    require(Supported.contains(format), s"unsupported format: $format")
    val r = spark.read.format(format).schema(schema)
    format match {
      case "csv" => r.option("header", "true").option("timestampFormat", TsPattern).load(path)
      case "json" => r.option("timestampFormat", TsPattern).load(path)
      case _ => r.load(path)
    }
  }

  /** Write `df` to `path` as `format` (overwrite). */
  def writeAs(df: DataFrame, path: String, format: String): Unit = {
    require(Supported.contains(format), s"unsupported format: $format")
    val w = df.write.format(format).mode(SaveMode.Overwrite)
    (format match {
      case "csv" => w.option("header", "true").option("timestampFormat", TsPattern)
      case "json" => w.option("timestampFormat", TsPattern)
      case _ => w
    }).save(path)
  }

  /** Materialize an existing table in another format, returning the
    * read-back frame (the first-hop landing→columnar conversion). */
  def convert(spark: SparkSession, df: DataFrame, outPath: String,
              format: String): DataFrame = {
    writeAs(df, outPath, format)
    readAs(spark, outPath, format, df.schema)
  }
}

package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Deterministic CDC changelog derived from `orders` (FIXTURES.md §3).
  *
  * The derivation is pure relational algebra, so DuckDB can run the
  * *identical* logic in SQL and the snapshot/as-of results hash-compare
  * (queries q17/q18):
  *   - every order emits insert(v1) at o_orderdate;
  *   - orders with o_orderkey % 3 == 0 emit an update (+10% totalprice)
  *     one day later;
  *   - orders with o_orderkey % 7 == 0 emit a delete tombstone (null
  *     payload, key only — reference README.md:57 semantics) two days
  *     later.
  * Version timestamps are strictly increasing per key by construction.
  */
object Changelog {

  def fromOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val dec = DecimalType(18, 2)

    val inserts = o.select(
      col("o_orderkey").as("pk"),
      lit("insert").as("action"),
      col("o_orderdate").as("update_date"),
      col("o_totalprice").cast(dec).as("totalprice"),
      col("o_orderstatus").as("status"))

    val updates = o.filter(col("o_orderkey") % 3 === 0).select(
      col("o_orderkey").as("pk"),
      lit("update").as("action"),
      (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("update_date"),
      // ×1.1 in exact decimal, explicit round before scale-down (Spark's
      // decimal cast rounds HALF_UP, DuckDB's truncates; round() agrees)
      round(col("o_totalprice").cast(dec) * lit(BigDecimal("1.1")), 2).cast(dec).as("totalprice"),
      col("o_orderstatus").as("status"))

    val deletes = o.filter(col("o_orderkey") % 7 === 0).select(
      col("o_orderkey").as("pk"),
      lit("delete").as("action"),
      (col("o_orderdate") + expr("INTERVAL 2 DAY")).as("update_date"),
      lit(null).cast(dec).as("totalprice"),
      lit(null).cast("string").as("status"))

    inserts.unionAll(updates).unionAll(deletes)
  }

  /** The DuckDB-side CTE producing the identical changelog. */
  val oracleCte: String =
    """WITH changelog AS (
      |  SELECT o_orderkey AS pk, 'insert' AS action, o_orderdate AS update_date,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS totalprice, o_orderstatus AS status
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, 'update', o_orderdate + INTERVAL 1 DAY,
      |         CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)), 2)
      |              AS DECIMAL(18,2)), o_orderstatus
      |  FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 'delete', o_orderdate + INTERVAL 2 DAY,
      |         CAST(NULL AS DECIMAL(18,2)), CAST(NULL AS VARCHAR)
      |  FROM orders WHERE o_orderkey % 7 = 0
      |)""".stripMargin
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Declared relational query set Q1–Q16, Q19, Q20 (SURVEY.md §2.4).
  *
  * Each query has (a) an idiomatic DataFrame implementation — declarative,
  * so Catalyst does pushdown/pruning/join-selection — and (b) an ANSI-SQL
  * oracle string that DuckDB runs over the same parquet tables.
  *
  * Hash-stability conventions (SURVEY.md §2.4):
  *  - total ORDER BY over a unique key set at the end of every query;
  *  - double aggregates go through CAST(.. AS DECIMAL(18,2)) so sums are
  *    addition-order independent (Spark partial aggregation reorders);
  *  - averages = decimal-exact SUM cast to double, then ONE double divide
  *    (a single IEEE op is bit-identical across engines, unlike a
  *    reduction over doubles);
  *  - integer-ish derived outputs cast to BIGINT (DuckDB SUM(int) is
  *    HUGEINT, Spark row_number is int — both normalized to long).
  */
object Relational {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** (name, spark impl, oracle sql) triples. */
  val defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // ------------------------------------------------------------------
    ("q01_scan_filter",
      (s: SparkSession, d: String) => {
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
                  col("l_discount").between(0.02, 0.06))
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             |  strftime(l_shipdate, '%Y-%m-%dT%H:%M:%S.%f') AS l_shipdate
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_discount BETWEEN 0.02 AND 0.06
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ------------------------------------------------------------------
    ("q02_hash_agg",
      (s: SparkSession, d: String) => {
        Tables.lineitem(s, d)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(dec2(col("l_quantity"))).as("sum_qty"),
            sum(dec2(col("l_extendedprice"))).as("sum_price"),
            (sum(col("l_discount").cast(DecimalType(18, 4))).cast("double") / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("cnt"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS sum_price,
             |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
             |  COUNT(*) AS cnt
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ------------------------------------------------------------------
    ("q03_join_agg",
      (s: SparkSession, d: String) => {
        Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"), sum(dec2(col("o_totalprice"))).as("revenue"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // ------------------------------------------------------------------
    ("q04_multijoin",
      (s: SparkSession, d: String) => {
        // nation/region are tiny: explicit broadcast keeps the 100 TB plan
        // shuffle-free on those edges; customer/orders joins are left to
        // AQE (broadcast at small SF, shuffle-hash/sort-merge at scale).
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy("n_name")
          // decimal-exact revenue: never cast a *computed* double to decimal
          // (Spark rounds the double's shortest repr, DuckDB its exact
          // binary value — they disagree on .xx5 boundaries).
          .agg(count(lit(1)).as("n_items"),
               round(sum(dec2(col("l_extendedprice")) *
                     (lit(1) - col("l_discount").cast(DecimalType(18, 4)))), 2)
                 .cast(DecimalType(18, 2)).as("revenue"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, COUNT(*) AS n_items,
             |  CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |             (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DECIMAL(18,2)) AS VARCHAR) AS revenue
             |FROM lineitem
             |JOIN orders   ON l_orderkey  = o_orderkey
             |JOIN customer ON o_custkey   = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin)),

    // ------------------------------------------------------------------
    ("q05_left_join",
      (s: SparkSession, d: String) => {
        val perCust = Tables.customer(s, d)
          .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders"))
        perCust.groupBy("n_orders")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("n_orders")
      },
      Some("""WITH per_cust AS (
             |  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
             |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
             |  GROUP BY c_custkey)
             |SELECT n_orders, COUNT(*) AS n_customers
             |FROM per_cust GROUP BY n_orders ORDER BY n_orders""".stripMargin)),

    // ------------------------------------------------------------------
    ("q06_semi_join",
      (s: SparkSession, d: String) => {
        Tables.customer(s, d)
          .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
                col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
             |ORDER BY c_custkey""".stripMargin)),

    // ------------------------------------------------------------------
    ("q07_anti_join",
      (s: SparkSession, d: String) => {
        // distinct the probe keys first: the anti join then broadcasts a
        // small key set instead of sort-merging the full fact table
        Tables.part(s, d)
          .join(Tables.lineitem(s, d).select("l_partkey").distinct(),
                col("p_partkey") === col("l_partkey"), "left_anti")
          .select("p_partkey", "p_name")
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_name FROM part p
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
             |ORDER BY p_partkey""".stripMargin)),

    // ------------------------------------------------------------------
    ("q08_set_ops",
      (s: SparkSession, d: String) => {
        // UNION/INTERSECT/EXCEPT computed in ONE aggregation pass: per-key
        // membership flags, then each set-op is a filter over the flags.
        // Naive except/intersect/union would be 3 independent
        // distinct+join shuffles over the same scan; this is 1 shuffle.
        val flags = Tables.orders(s, d)
          .filter(col("o_orderstatus").isin("O", "F"))
          .groupBy(col("o_custkey").as("k"))
          .agg(max(col("o_orderstatus") === "O").as("in_o"),
               max(col("o_orderstatus") === "F").as("in_f"))
        flags.filter(col("in_o") && !col("in_f")).select(lit("except").as("op"), col("k"))
          .unionAll(flags.filter(col("in_o") && col("in_f")).select(lit("intersect").as("op"), col("k")))
          .unionAll(flags.select(lit("union").as("op"), col("k")))
          .orderBy("op", "k")
      },
      Some("""WITH o_keys AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
             |     f_keys AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
             |SELECT 'except' AS op, k FROM (SELECT k FROM o_keys EXCEPT SELECT k FROM f_keys) t1
             |UNION ALL
             |SELECT 'intersect', k FROM (SELECT k FROM o_keys INTERSECT SELECT k FROM f_keys) t2
             |UNION ALL
             |SELECT 'union', k FROM (SELECT k FROM o_keys UNION SELECT k FROM f_keys) t3
             |ORDER BY op, k""".stripMargin)),

    // ------------------------------------------------------------------
    ("q09_window_rank",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |         CAST(row_number() OVER (PARTITION BY o_custkey
             |                                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
             |  FROM orders) t
             |WHERE rn <= 3
             |ORDER BY o_custkey, rn""".stripMargin)),

    // ------------------------------------------------------------------
    ("q10_window_analytic",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Tables.orders(s, d)
          .withColumn("running_total",
            sum(dec2(col("o_totalprice"))).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
          .withColumn("next_date", lead(col("o_orderdate"), 1).over(w))
          .select("o_custkey", "o_orderkey", "o_orderdate", "running_total", "prev_date", "next_date")
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%f') AS o_orderdate,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS running_total,
             |  strftime(lag(o_orderdate)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             |           '%Y-%m-%dT%H:%M:%S.%f') AS prev_date,
             |  strftime(lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             |           '%Y-%m-%dT%H:%M:%S.%f') AS next_date
             |FROM orders
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // ------------------------------------------------------------------
    ("q11_topk",
      (s: SparkSession, d: String) => {
        // orderBy+limit → TakeOrderedAndProject: per-partition heaps, no
        // global sort — the shape that survives 100 TB.
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(100)
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
             |FROM lineitem
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
             |LIMIT 100""".stripMargin)),

    // ------------------------------------------------------------------
    ("q12_rollup",
      (s: SparkSession, d: String) => {
        Tables.lineitem(s, d)
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
             |FROM lineitem
             |GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // ------------------------------------------------------------------
    ("q49_cube",
      (s: SparkSession, d: String) => {
        // full CUBE lattice (rollup's sibling — all 2^n grouping sets)
        Tables.lineitem(s, d)
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt"),
               sum(dec2(col("l_quantity"))).as("sum_qty"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS sum_qty
             |FROM lineitem
             |GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // ------------------------------------------------------------------
    ("q50_range_window",
      (s: SparkSession, d: String) => {
        // event-TIME range frame: per customer, revenue in the trailing 30
        // days of each order — a RANGE BETWEEN INTERVAL frame, not a row
        // count (the frame ops q10's ROWS frame can't express)
        // NTZ → (session-UTC) timestamp → epoch seconds: ANSI forbids a
        // direct NTZ→long cast
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
          .rangeBetween(-30L * 86400, 0)
        Tables.orders(s, d)
          .withColumn("trailing_30d",
            sum(dec2(col("o_totalprice"))).over(w))
          .select("o_custkey", "o_orderkey", "o_orderdate", "trailing_30d")
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%f') AS o_orderdate,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate
             |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS VARCHAR)
             |    AS trailing_30d
             |FROM orders
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // ------------------------------------------------------------------
    ("q13_scalar_funcs",
      (s: SparkSession, d: String) => {
        Tables.orders(s, d)
          .filter(col("o_orderkey") % 10 === 0)
          .select(
            col("o_orderkey"),
            upper(col("o_orderstatus")).as("status_u"),
            substring(col("o_orderpriority"), 1, 3).as("prio3"),
            concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_prio"),
            col("o_orderpriority").like("%HIGH%").as("is_high"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mon"),
            dec2(col("o_totalprice")).as("price_dec"),
            abs((col("o_orderkey") % 7) - 3).as("m7"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  upper(o_orderstatus) AS status_u,
             |  substr(o_orderpriority, 1, 3) AS prio3,
             |  concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
             |  (o_orderpriority LIKE '%HIGH%') AS is_high,
             |  strftime(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP),
             |           '%Y-%m-%dT%H:%M:%S.%f') AS month_start,
             |  CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
             |  CAST(extract(month FROM o_orderdate) AS BIGINT) AS mon,
             |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec,
             |  abs((o_orderkey % 7) - 3) AS m7
             |FROM orders
             |WHERE o_orderkey % 10 = 0
             |ORDER BY o_orderkey""".stripMargin)),

    // ------------------------------------------------------------------
    ("q14_json_extract",
      (s: SparkSession, d: String) => {
        Tables.events(s, d)
          .select(get_json_object(col("props"), "$.k").cast("long").as("k"), col("value"))
          .groupBy("k")
          .agg(count(lit(1)).as("cnt"), sum(dec2(col("value"))).as("sum_value"))
          .orderBy("k")
      },
      Some("""SELECT k, COUNT(*) AS cnt,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS sum_value
             |FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, value
             |      FROM events) t
             |GROUP BY k ORDER BY k""".stripMargin)),

    // ------------------------------------------------------------------
    ("q15_tumbling_window",
      (s: SparkSession, d: String) => {
        // Batch semantics of the streaming tumbling window: the same
        // window() operator Structured Streaming uses (graft.streaming).
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), sum(dec2(col("value"))).as("sum_value"))
          .select(col("window.start").as("hour_ts"), col("event_type"), col("cnt"), col("sum_value"))
          .orderBy("hour_ts", "event_type")
      },
      Some("""SELECT strftime(CAST(date_trunc('hour', ts) AS TIMESTAMP),
             |         '%Y-%m-%dT%H:%M:%S.%f') AS hour_ts, event_type,
             |  COUNT(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS sum_value
             |FROM events
             |GROUP BY hour_ts, event_type
             |ORDER BY hour_ts, event_type""".stripMargin)),

    // ------------------------------------------------------------------
    ("q53_sliding_window",
      (s: SparkSession, d: String) => {
        // batch semantics of the streaming SLIDING window: 1h length, 30m
        // slide — every event lands in exactly two epoch-aligned windows
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("window.start").as("win_start"), col("event_type"), col("cnt"))
          .orderBy("win_start", "event_type")
      },
      Some("""SELECT strftime(ws, '%Y-%m-%dT%H:%M:%S.%f') AS win_start, event_type,
             |  COUNT(*) AS cnt
             |FROM (SELECT unnest([time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)),
             |                    time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP))
             |                      - INTERVAL 30 MINUTE]) AS ws,
             |             event_type
             |      FROM events) t
             |GROUP BY ws, event_type
             |ORDER BY win_start, event_type""".stripMargin)),

    // ------------------------------------------------------------------
    ("q115_correlated_exists",
      (s: SparkSession, d: String) => {
        // the SQL-entry subquery surface: correlated EXISTS / NOT EXISTS
        // plus a correlated scalar aggregate, through spark.sql so
        // Catalyst's subquery DECORRELATION does the planning — each
        // subquery rewrites to a join against a pre-aggregated or
        // semi/anti frame, never a per-row subquery execution.
        Tables.customer(s, d).createOrReplaceTempView("q115_customer")
        Tables.orders(s, d).createOrReplaceTempView("q115_orders")
        s.sql("""
          SELECT c.c_custkey, c.c_name,
                 (SELECT COUNT(*) FROM q115_orders o
                  WHERE o.o_custkey = c.c_custkey) AS n_orders
          FROM q115_customer c
          WHERE EXISTS (SELECT 1 FROM q115_orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 300000)
            AND NOT EXISTS (SELECT 1 FROM q115_orders o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderstatus = 'F'
                              AND o.o_totalprice < 50000)
          ORDER BY c.c_custkey""")
      },
      Some("""SELECT c.c_custkey, c.c_name,
             |       (SELECT COUNT(*) FROM orders o
             |        WHERE o.o_custkey = c.c_custkey) AS n_orders
             |FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey
             |                AND o.o_totalprice > 300000)
             |  AND NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey
             |                    AND o.o_orderstatus = 'F'
             |                    AND o.o_totalprice < 50000)
             |ORDER BY c.c_custkey""".stripMargin)),

    ("q116_lateral_topn",
      (s: SparkSession, d: String) => {
        // LATERAL correlated subquery — per-customer top-2 orders by
        // value, the top-n-per-group idiom at the SQL entry; Spark
        // decorrelates the LIMIT'd lateral into a ranked join (no
        // per-customer subquery execution)
        Tables.customer(s, d).createOrReplaceTempView("q116_customer")
        Tables.orders(s, d).createOrReplaceTempView("q116_orders")
        s.sql("""
          SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
          FROM q116_customer c,
          LATERAL (SELECT o_orderkey, o_totalprice FROM q116_orders o
                   WHERE o.o_custkey = c.c_custkey
                   ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
          ORDER BY c.c_custkey, l.o_totalprice DESC, l.o_orderkey""")
      },
      Some("""SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
             |FROM customer c,
             |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             |         WHERE o.o_custkey = c.c_custkey
             |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
             |ORDER BY c.c_custkey, l.o_totalprice DESC, l.o_orderkey""".stripMargin)),

    ("q16_sessionize",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
                 (unix_micros(col("ts").cast("timestamp")) -
                  unix_micros(col("prev_ts").cast("timestamp"))) > lit(1800L * 1000000L), 1L)
              .otherwise(0L))
          .groupBy("user_id")
          .agg(sum(col("new_session")).cast("long").as("n_sessions"))
          .orderBy("user_id")
      },
      Some("""WITH d AS (
             |  SELECT user_id, ts,
             |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |  FROM events)
             |SELECT user_id,
             |  CAST(SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
             |                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
             |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ------------------------------------------------------------------
    ("q41_pivot",
      (s: SparkSession, d: String) => {
        // pivot with an explicit value list: no extra distinct-scan, and
        // the output schema is stable for the oracle compare
        Tables.events(s, d)
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
             |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
             |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
             |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
             |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ------------------------------------------------------------------
    ("q54_unpivot",
      (s: SparkSession, d: String) => {
        // pivot's inverse: melt per-user event-type counts (the q41 shape)
        // back to (user_id, event_type, cnt) long form
        val wide = Tables.events(s, d)
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
        wide.unpivot(Array(col("user_id")),
            Array(col("click"), col("error"), col("purchase"), col("signup"), col("view")),
            "event_type", "cnt")
          .filter(col("cnt") > 0)
          .orderBy("user_id", "event_type")
      },
      Some("""WITH wide AS (
             |  SELECT user_id,
             |    COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
             |    COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
             |    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
             |    COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
             |    COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
             |  FROM events GROUP BY user_id)
             |SELECT user_id, event_type, cnt FROM wide
             |UNPIVOT (cnt FOR event_type IN (click, error, purchase, signup, view))
             |WHERE cnt > 0
             |ORDER BY user_id, event_type""".stripMargin)),

    // ------------------------------------------------------------------
    ("q42_percentiles",
      (s: SparkSession, d: String) => {
        // exact interpolated percentiles (both engines: linear interpolation
        // over the sorted set; single double ops -> bit-stable)
        Tables.orders(s, d)
          .groupBy("o_orderstatus")
          .agg(
            expr("percentile(o_totalprice, 0.5)").as("p50"),
            expr("percentile(o_totalprice, 0.95)").as("p95"),
            min(col("o_totalprice")).as("mn"),
            max(col("o_totalprice")).as("mx"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus,
             |  quantile_cont(o_totalprice, 0.5) AS p50,
             |  quantile_cont(o_totalprice, 0.95) AS p95,
             |  min(o_totalprice) AS mn,
             |  max(o_totalprice) AS mx
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ------------------------------------------------------------------
    ("q43_window_misc",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d)
          .filter(col("o_orderkey") % 20 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
            dense_rank().over(w).cast("long").as("drank"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("prank"),
            cume_dist().over(w).as("cdist"))
          .orderBy("o_orderstatus", "o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice,
             |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
             |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             |  percent_rank() OVER w AS prank,
             |  cume_dist() OVER w AS cdist
             |FROM orders
             |WHERE o_orderkey % 20 = 0
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderstatus, o_orderkey""".stripMargin)),

    // ------------------------------------------------------------------
    ("q44_scalar_subquery",
      (s: SparkSession, d: String) => {
        // customers above the global average balance; the average is
        // decimal-exact sum / count (one double division — parity-safe)
        val c = Tables.customer(s, d)
        val avgBal = c.agg(
          (sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double") / count(lit(1)))
            .as("g")).select("g")
        c.join(broadcast(avgBal))
          .filter(col("c_acctbal") > col("g"))
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("g").as("global_avg"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_acctbal,
             |  (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             |   FROM customer) AS global_avg
             |FROM customer
             |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             |                   FROM customer)
             |ORDER BY c_custkey""".stripMargin)),

    // ------------------------------------------------------------------
    ("q45_string_agg",
      (s: SparkSession, d: String) => {
        Tables.nation(s, d)
          .groupBy("n_regionkey")
          .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"),
               count(lit(1)).as("n"))
          .orderBy("n_regionkey")
      },
      Some("""SELECT n_regionkey,
             |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
             |  COUNT(*) AS n
             |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),

    // ------------------------------------------------------------------
    ("q19_dedup_exact",
      (s: SparkSession, d: String) => {
        Tables.events(s, d)
          .distinct()
          .orderBy("event_id", "ts", "user_id", "event_type", "value", "props")
      },
      Some("""SELECT DISTINCT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS ts,
             |  user_id, event_type, value, props
             |FROM events
             |ORDER BY event_id, ts, user_id, event_type, value, props""".stripMargin)),

    // ------------------------------------------------------------------
    ("q19b_dedup_keyed",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_id", "ts", "event_type")
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS ts, event_type FROM (
             |  SELECT user_id, event_id, ts, event_type,
             |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events) t
             |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // ------------------------------------------------------------------
    ("q20_top_tokens",
      (s: SparkSession, d: String) => {
        Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy("token")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("token"))
          .limit(20)
      },
      Some("""SELECT token, COUNT(*) AS cnt
             |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
             |GROUP BY token
             |ORDER BY cnt DESC, token
             |LIMIT 20""".stripMargin)),

    // ------------------------------------------------------------------
    ("q69_grouping_sets",
      (s: SparkSession, d: String) => {
        // explicit GROUPING SETS (finer control than ROLLUP/CUBE: exactly
        // the requested lattice members, here both 1-D marginals + the
        // 2-D cells + the grand total) with grouping() markers so a NULL
        // group value is distinguishable from a rolled-up column. One
        // Expand + one hash aggregate — same shuffle as a plain groupBy.
        Tables.lineitem(s, d)
          .groupingSets(
            Seq(Seq(col("l_returnflag"), col("l_linestatus")),
                Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
            col("l_returnflag"), col("l_linestatus"))
          .agg(grouping(col("l_returnflag")).cast("int").as("g_rf"),
               grouping(col("l_linestatus")).cast("int").as("g_ls"),
               count(lit(1)).as("cnt"),
               sum(dec2(col("l_extendedprice"))).as("sum_price"))
          .orderBy(col("g_rf"), col("g_ls"),
            asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
             |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
             |  COUNT(*) AS cnt,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS sum_price
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
             |                        (l_returnflag), (l_linestatus), ())
             |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    ("q131_groupingsets_reagg",
      (s: SparkSession, d: String) => {
        // the q63→approxProfile plan-discipline pair for q69: IDENTICAL
        // output, but the lattice is RE-AGGREGATED from the finest cells
        // instead of Expand-multiplied — GROUPING SETS' one-pass Expand
        // pushes every corpus row through the shuffle once PER lattice
        // member (×4 here; ×2^k for a k-column cube), where this shape
        // scans the corpus ONCE into the (rf, ls) cell frame (12 rows)
        // and derives marginals + grand total from THAT. Exactness:
        // count and decimal-sum are associative, so re-aggregated
        // partials equal the direct aggregates bit-for-bit (the oracle
        // is literally q69's GROUPING SETS SQL).
        import org.apache.spark.sql.types.DecimalType
        val p = DecimalType(28, 2) // sum(DECIMAL(18,2))'s type: every
        // branch casts its re-sum back to it so the union is homogeneous
        val cells = Tables.lineitem(s, d)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt"),
            sum(dec2(col("l_extendedprice"))).as("sum_price"))
          .localCheckpoint(true) // ONE corpus pass, reused by all members
        val nullS = lit(null).cast("string")
        val c2 = cells.select(col("l_returnflag"), col("l_linestatus"),
          lit(0).as("g_rf"), lit(0).as("g_ls"),
          col("cnt"), col("sum_price").cast(p).as("sum_price"))
        val mRf = cells.groupBy("l_returnflag")
          .agg(sum(col("cnt")).as("cnt"), sum(col("sum_price")).cast(p).as("sum_price"))
          .select(col("l_returnflag"), nullS.as("l_linestatus"),
            lit(0).as("g_rf"), lit(1).as("g_ls"), col("cnt"), col("sum_price"))
        val mLs = cells.groupBy("l_linestatus")
          .agg(sum(col("cnt")).as("cnt"), sum(col("sum_price")).cast(p).as("sum_price"))
          .select(nullS.as("l_returnflag"), col("l_linestatus"),
            lit(1).as("g_rf"), lit(0).as("g_ls"), col("cnt"), col("sum_price"))
        val tot = cells
          .agg(sum(col("cnt")).as("cnt"), sum(col("sum_price")).cast(p).as("sum_price"))
          .select(nullS.as("l_returnflag"), nullS.as("l_linestatus"),
            lit(1).as("g_rf"), lit(1).as("g_ls"), col("cnt"), col("sum_price"))
        c2.unionByName(mRf).unionByName(mLs).unionByName(tot)
          .orderBy(col("g_rf"), col("g_ls"),
            asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
             |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
             |  COUNT(*) AS cnt,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS sum_price
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
             |                        (l_returnflag), (l_linestatus), ())
             |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // ------------------------------------------------------------------
    ("q70_gap_fill",
      (s: SparkSession, d: String) => {
        // time-series densification: hourly event counts with missing
        // hours materialized as zero. The hour axis is GENERATED with
        // sequence()+explode over ONE aggregated bounds row (never a
        // driver-side loop), and the only cross join is dimension × axis
        // — |event types| × |hours|, both tiny next to the fact table,
        // which flows through a single hash aggregate + left join.
        val ev = Tables.events(s, d)
          .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        val counts = ev.groupBy("event_type", "h").agg(count(lit(1)).as("cnt"))
        val hours = ev.agg(min("h").as("h0"), max("h").as("h1"))
          .select(explode(sequence(col("h0"), col("h1"),
            expr("interval 1 hour"))).as("h"))
        val types = ev.select("event_type").distinct()
        types.crossJoin(hours)
          .join(counts, Seq("event_type", "h"), "left")
          .select(col("event_type"), col("h"),
            coalesce(col("cnt"), lit(0L)).as("cnt"))
          .orderBy("event_type", "h")
      },
      Some("""WITH e AS (SELECT event_type,
             |            CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h FROM events),
             |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
             |hours AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
             |t AS (SELECT DISTINCT event_type FROM e),
             |c AS (SELECT event_type, h, COUNT(*) AS cnt FROM e GROUP BY 1, 2)
             |SELECT t.event_type, strftime(hours.h, '%Y-%m-%dT%H:%M:%S.%f') AS h,
             |  coalesce(c.cnt, 0) AS cnt
             |FROM t CROSS JOIN hours
             |LEFT JOIN c ON c.event_type = t.event_type AND c.h = hours.h
             |ORDER BY 1, 2""".stripMargin)),

    // ------------------------------------------------------------------
    ("q71_zscore_outliers",
      (s: SparkSession, d: String) => {
        // distributed outlier detection, EXACT across engines: the
        // |z| > 2 test is evaluated without stddev/sqrt. Per-segment
        // (n, S=Σx, Q=Σx²) are exact decimal sums over integer cents, and
        //   (n·x − S)² · (n−1)  >  2.25 · (n²·Q − n·S²)
        // is the |z| > 1.5 test multiplied through by n²(n−1) — evaluated
        // (1.5σ, not 2σ: the synthetic near-uniform price column has
        // max |z| = √3 ≈ 1.73, so a 2σ cut would select nothing) —
        // in double on operands both engines derive identically, with the
        // identical IEEE op sequence, so no Welford/stddev implementation
        // drift can flip a borderline row. Stats broadcast back over the
        // fact side: one shuffle for the agg, zero for the filter.
        // (Q ≈ n·cents² caps the exact range near 1e38 — per-PARTITION
        // sub-aggregation would extend it at warehouse scale.)
        val o = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"), col("o_orderkey"),
            dec2(col("o_totalprice")).as("price"),
            (dec2(col("o_totalprice")) * 100).cast(DecimalType(19, 0)).as("c"))
        val stats = o.groupBy("seg").agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("c")).cast("double").as("s"),
          sum(col("c") * col("c")).cast("double").as("q"))
        val x = col("c").cast("double")
        o.join(broadcast(stats), "seg")
          .filter(col("n") > 1 &&
            (col("n") * x - col("s")) * (col("n") * x - col("s")) * (col("n") - 1) >
              lit(2.25d) * (col("n") * col("n") * col("q") - col("n") * col("s") * col("s")))
          .select("seg", "o_orderkey", "price")
          .orderBy("seg", "o_orderkey")
      },
      Some("""WITH o AS (SELECT c_mktsegment AS seg, o_orderkey,
             |    CAST(o_totalprice AS DECIMAL(18,2)) AS price,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) AS c
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |st AS (SELECT seg, CAST(count(*) AS DOUBLE) AS n, CAST(sum(c) AS DOUBLE) AS s,
             |       CAST(sum(c * c) AS DOUBLE) AS q FROM o GROUP BY seg)
             |SELECT o.seg, o.o_orderkey, CAST(o.price AS VARCHAR) AS price
             |FROM o JOIN st ON o.seg = st.seg
             |WHERE st.n > 1 AND
             |  (st.n * CAST(o.c AS DOUBLE) - st.s) * (st.n * CAST(o.c AS DOUBLE) - st.s) * (st.n - 1)
             |  > 2.25 * (st.n * st.n * st.q - st.n * st.s * st.s)
             |ORDER BY 1, 2""".stripMargin)),

    // ------------------------------------------------------------------
    ("q78_histogram",
      (s: SparkSession, d: String) => {
        // equal-width histogram per segment, EXACT across engines: the
        // bucket index is pure integer arithmetic over cents —
        // ((c − min)·10) div (span + 1) ∈ [0, 9] with no clamp, no float
        // division, no width_bucket implementation drift. Global bounds
        // are one aggregate broadcast over the fact side; the histogram
        // itself is a single map-side-combinable count.
        val o = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"),
            (dec2(col("o_totalprice")) * 100).cast("long").as("c"))
        val bounds = o.agg(min("c").as("cmin"), max("c").as("cmax"))
        o.crossJoin(broadcast(bounds))
          .withColumn("bucket", expr("((c - cmin) * 10) div (cmax - cmin + 1)"))
          .groupBy("seg", "bucket")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("seg", "bucket")
      },
      Some("""WITH o AS (SELECT c_mktsegment AS seg,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |b AS (SELECT min(c) AS cmin, max(c) AS cmax FROM o)
             |SELECT o.seg, ((o.c - b.cmin) * 10) // (b.cmax - b.cmin + 1) AS bucket,
             |  COUNT(*) AS cnt
             |FROM o CROSS JOIN b
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin)),

    // ------------------------------------------------------------------
    ("q79_full_outer",
      (s: SparkSession, d: String) => {
        // FULL OUTER join — the year-over-year churn report: customers
        // active in 1996, 1997, or both, with NULL marking the absent
        // side. Both inputs pre-aggregate to one row per key before the
        // join (the join moves customer-grain rows, never order-grain),
        // and the year filters push into the scans.
        def yearAgg(y: Int, n: String, rev: String) = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
                  col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
          .groupBy("o_custkey")
          .agg(count(lit(1)).as(n), sum(dec2(col("o_totalprice"))).as(rev))
        yearAgg(1996, "n96", "rev96")
          .join(yearAgg(1997, "n97", "rev97"), Seq("o_custkey"), "full_outer")
          .select(col("o_custkey"),
            coalesce(col("n96"), lit(0L)).as("n96"), col("rev96"),
            coalesce(col("n97"), lit(0L)).as("n97"), col("rev97"))
          .orderBy("o_custkey")
      },
      Some("""WITH y96 AS (
             |  SELECT o_custkey, COUNT(*) AS n96,
             |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev96
             |  FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
             |  GROUP BY o_custkey),
             |y97 AS (
             |  SELECT o_custkey, COUNT(*) AS n97,
             |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev97
             |  FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
             |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
             |  GROUP BY o_custkey)
             |SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
             |  COALESCE(a.n96, 0) AS n96, CAST(a.rev96 AS VARCHAR) AS rev96,
             |  COALESCE(b.n97, 0) AS n97, CAST(b.rev97 AS VARCHAR) AS rev97
             |FROM y96 a FULL OUTER JOIN y97 b ON a.o_custkey = b.o_custkey
             |ORDER BY 1""".stripMargin))
  )
}

package graft.relational

import graft.{Catalog, QueryDef}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational query surface (SURVEY.md §2.4–§2.9): joins, aggregations,
  * window functions, sorts/limits, set operations and scalar functions,
  * expressed with the DataFrame API so Catalyst plans them (pushdown,
  * broadcast, AQE) — each paired with a DuckDB oracle.
  *
  * Determinism rules for oracle parity:
  *   - Double-typed SUMs are computed over exact fixed-point (cents)
  *     integer views and cast back to `double` at the end. Integer
  *     arithmetic is exact in both engines, so partial-aggregation order
  *     (Spark shuffles) cannot perturb low-order bits the way naive
  *     double summation does.
  *   - DuckDB `sum(INTEGER)` returns HUGEINT; oracles cast those sums to
  *     BIGINT to match Spark's LongType.
  *   - Every LIMIT / window ordering includes a unique tie-break column.
  *   - Raw double columns pass through untouched (bit-exact in parquet).
  */
object RelationalQueries {

  // Exact fixed-point (cents) views of the double measure columns. The
  // source data carries <=2 decimals, so round(x*100) is an exact integer
  // in both engines; long-sum then one double division keeps results
  // bit-identical cross-engine while staying on the codegen'd long-adder
  // path (wide decimal sums fall back to BigDecimal and were the q01
  // bottleneck at sf0.1).
  private val Q100  = "cast(round(l_quantity * 100) as bigint)"
  private val EP100 = "cast(round(l_extendedprice * 100) as bigint)"
  private val DI100 = "cast(round(l_discount * 100) as bigint)"
  private val TX100 = "cast(round(l_tax * 100) as bigint)"
  private val TP100 = "cast(round(o_totalprice * 100) as bigint)"
  private val AB100 = "cast(round(c_acctbal * 100) as bigint)"

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Catalog.t(s, d, n)

  def all: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------- aggs
    QueryDef(
      "q01_pricing_summary",
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  cast(sum($Q100) as double) / 100 AS sum_qty,
              |  cast(sum($EP100) as double) / 100 AS sum_base_price,
              |  cast(sum($EP100 * (100 - $DI100)) as double) / 10000 AS sum_disc_price,
              |  cast(sum($EP100 * (100 - $DI100) * (100 + $TX100)) as double) / 1000000 AS sum_charge,
              |  cast(sum($Q100) as double) / 100 / count(*) AS avg_qty,
              |  cast(sum($EP100) as double) / 100 / count(*) AS avg_price,
              |  count(*) AS count_order
              |FROM lineitem
              |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              |GROUP BY l_returnflag, l_linestatus""".stripMargin),
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          expr(s"cast(sum($Q100) as double) / 100").as("sum_qty"),
          expr(s"cast(sum($EP100) as double) / 100").as("sum_base_price"),
          expr(s"cast(sum($EP100 * (100 - $DI100)) as double) / 10000").as("sum_disc_price"),
          expr(s"cast(sum($EP100 * (100 - $DI100) * (100 + $TX100)) as double) / 1000000").as("sum_charge"),
          expr(s"cast(sum($Q100) as double) / 100 / count(*)").as("avg_qty"),
          expr(s"cast(sum($EP100) as double) / 100 / count(*)").as("avg_price"),
          count(lit(1)).as("count_order"))),

    QueryDef(
      "q02_revenue_by_segment",
      Some(s"""SELECT c_mktsegment,
              |  cast(sum($EP100 * (100 - $DI100)) as double) / 10000 AS revenue,
              |  count(*) AS n_items
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_mktsegment""".stripMargin),
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          expr(s"cast(sum($EP100 * (100 - $DI100)) as double) / 10000").as("revenue"),
          count(lit(1)).as("n_items"))),

    QueryDef(
      "q03_region_nation_stats",
      Some(s"""SELECT r_name, n_name, count(*) AS n_customers,
             |  cast(sum($AB100) as double) / 100 AS total_acctbal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name""".stripMargin),
      (s, d) => t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          expr(s"cast(sum($AB100) as double) / 100").as("total_acctbal"))),

    // ------------------------------------------------------- filtered scans
    QueryDef(
      "q04_filtered_scan",
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_quantity >= 45
             |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'""".stripMargin),
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") >= 45 &&
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")),

    // -------------------------------------------------------- sort / top-k
    QueryDef(
      "q05_topk_orders",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC
             |LIMIT 10""".stripMargin),
      (s, d) => t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)),

    // ------------------------------------------------------------- windows
    QueryDef(
      "q06_window_topn_per_cust",
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             |  FROM orders) sub
             |WHERE rn <= 3""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      }),

    QueryDef(
      "q07_running_qty",
      // l_quantity in the ORDER BY: (suppkey, shipdate, orderkey,
      // linenumber) is NOT unique at sf0.1 (the generator emits one
      // duplicated group with differing quantities), and a tied prefix
      // sum is engine-order-dependent; quantity makes the order total
      Some(s"""SELECT l_suppkey, l_orderkey, l_linenumber,
              |  cast(sum($Q100) OVER (PARTITION BY l_suppkey
              |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) / 100 AS run_qty
              |FROM lineitem""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "lineitem")
          .withColumn("run_qty", (sum(expr(Q100)).over(w).cast("double") / 100).as("run_qty"))
          .select("l_suppkey", "l_orderkey", "l_linenumber", "run_qty")
      }),

    QueryDef(
      "q08_window_lag_lead",
      Some("""SELECT event_id, user_id, value,
             |  lag(value) OVER w AS prev_value,
             |  lead(value) OVER w AS next_value,
             |  first_value(value) OVER w AS first_value
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        t(s, d, "events")
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .withColumn("next_value", lead(col("value"), 1).over(w))
          .withColumn("first_value", first(col("value")).over(w))
          .select("event_id", "user_id", "value", "prev_value", "next_value", "first_value")
      }),

    // --------------------------------------------------------------- setops
    QueryDef(
      "q09_set_operations",
      Some("""SELECT c_custkey, 'both' AS tag FROM (
             |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
             |  INTERSECT
             |  SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING','MACHINERY')) a
             |UNION ALL
             |SELECT c_custkey, 'rich_only' AS tag FROM (
             |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
             |  EXCEPT
             |  SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING','MACHINERY')) b""".stripMargin),
      (s, d) => {
        val c = t(s, d, "customer")
        val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey")
        val seg = c.filter(col("c_mktsegment").isin("BUILDING", "MACHINERY")).select("c_custkey")
        rich.intersect(seg).withColumn("tag", lit("both"))
          .unionAll(rich.except(seg).withColumn("tag", lit("rich_only")))
      }),

    // ------------------------------------------------------- distinct aggs
    QueryDef(
      "q10_distinct_agg",
      Some("""SELECT l_returnflag,
             |  count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_supps,
             |  count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))),

    // -------------------------------------------------------- rollup / cube
    QueryDef(
      "q11_rollup",
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  cast(sum($Q100) as double) / 100 AS sum_qty, count(*) AS cnt
              |FROM lineitem
              |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin),
      (s, d) => t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(expr(s"cast(sum($Q100) as double) / 100").as("sum_qty"), count(lit(1)).as("cnt"))),

    QueryDef(
      "q12_cube",
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  cast(sum($EP100) as double) / 100 AS sum_price, count(*) AS cnt
              |FROM lineitem
              |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin),
      (s, d) => t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(expr(s"cast(sum($EP100) as double) / 100").as("sum_price"), count(lit(1)).as("cnt"))),

    // ----------------------------------------------------- semi / anti join
    QueryDef(
      "q13_semi_anti_join",
      Some("""SELECT c_custkey, 'has_big_order' AS tag FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
             |UNION ALL
             |SELECT c_custkey, 'no_big_order' AS tag FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)""".stripMargin),
      (s, d) => {
        val c = t(s, d, "customer")
        val big = t(s, d, "orders").filter(col("o_totalprice") > 200000)
        c.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), lit("has_big_order").as("tag"))
          .unionAll(
            c.join(big, col("c_custkey") === col("o_custkey"), "left_anti")
              .select(col("c_custkey"), lit("no_big_order").as("tag")))
      }),

    // ------------------------------------------------------ scalar functions
    QueryDef(
      "q14_string_funcs",
      Some("""SELECT p_partkey,
             |  upper(p_brand) AS brand_u,
             |  substring(p_name, 1, 8) AS name_pfx,
             |  length(p_name) AS name_len,
             |  concat(p_brand, '#', p_type) AS brand_type,
             |  replace(p_type, ' ', '_') AS type_u
             |FROM part""".stripMargin),
      (s, d) => t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name_pfx"),
        length(col("p_name")).cast("long").as("name_len"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_type"), " ", "_").as("type_u"))),

    QueryDef(
      "q15_date_funcs",
      Some(s"""SELECT cast(year(o_orderdate) as int) AS yr,
             |  cast(month(o_orderdate) as int) AS mo,
             |  count(*) AS n_orders,
             |  cast(sum($TP100) as double) / 100 AS total
             |FROM orders GROUP BY 1, 2""".stripMargin),
      (s, d) => t(s, d, "orders")
        .groupBy(
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"),
          expr(s"cast(sum($TP100) as double) / 100").as("total"))),

    QueryDef(
      "q16_case_buckets",
      Some("""SELECT cast(floor(o_totalprice / 50000) as bigint) AS bucket,
             |  count(*) AS cnt,
             |  cast(sum(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) as bigint) AS n_urgent
             |FROM orders GROUP BY 1""".stripMargin),
      (s, d) => t(s, d, "orders")
        .groupBy(floor(col("o_totalprice") / 50000).as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("o_orderpriority").like("1%"), 1).otherwise(0)).cast("long").as("n_urgent"))),

    // --------------------------------------------------------------- having
    QueryDef(
      "q17_having",
      Some("""SELECT l_partkey, count(*) AS cnt
             |FROM lineitem GROUP BY l_partkey HAVING count(*) >= 5""".stripMargin),
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 5)),

    // --------------------------------------------------------- 5-way join
    QueryDef(
      "q18_star_join_revenue",
      Some(s"""SELECT r_name, n_name,
              |  cast(sum($EP100 * (100 - $DI100)) as double) / 10000 AS revenue,
              |  count(*) AS n_items
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY r_name, n_name""".stripMargin),
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          expr(s"cast(sum($EP100 * (100 - $DI100)) as double) / 10000").as("revenue"),
          count(lit(1)).as("n_items"))),

    QueryDef(
      "q19_supplier_revenue",
      Some(s"""SELECT s_name, n_name,
              |  cast(sum($EP100 * (100 - $DI100)) as double) / 10000 AS revenue
              |FROM lineitem
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation ON s_nationkey = n_nationkey
              |GROUP BY s_name, n_name""".stripMargin),
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("s_name"), col("n_name"))
        .agg(expr(s"cast(sum($EP100 * (100 - $DI100)) as double) / 10000").as("revenue"))),

    // --------------------------------------------------------------- events
    QueryDef(
      "q20_events_agg",
      Some("""SELECT user_id, event_type, count(*) AS n,
             |  cast(sum(cast(round(value * 100) as bigint)) as double) / 100 AS total_value
             |FROM events GROUP BY user_id, event_type""".stripMargin),
      (s, d) => t(s, d, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("cast(sum(cast(round(value * 100) as bigint)) as double) / 100").as("total_value"))),

    QueryDef(
      "q21_events_json",
      Some("""SELECT event_id,
             |  cast(nullif(regexp_extract(props, '"k": ([0-9]+)', 1), '') as int) AS k
             |FROM events""".stripMargin),
      (s, d) => t(s, d, "events").select(
        col("event_id"),
        expr("cast(nullif(regexp_extract(props, '\"k\": ([0-9]+)', 1), '') as int)")
          .as("k")))
  )
}

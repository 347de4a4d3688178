package graft.relational

import graft.{Catalog, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second batch of relational coverage: outer joins, GROUPING SETS,
  * correlated subqueries, and approximate sketches. SQL-first constructs
  * (grouping sets, correlated scalar subqueries) run through
  * `spark.sql` over per-query temp views — still fully Catalyst-planned.
  */
object RelationalQueries2 {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Catalog.t(s, d, n)

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q22_full_outer_join",
      Some("""SELECT coalesce(r.c_custkey, b.c_custkey) AS custkey,
             |  coalesce(r.rich, false) AS is_rich,
             |  coalesce(b.n_big, 0) AS n_big
             |FROM (SELECT c_custkey, true AS rich FROM customer WHERE c_acctbal > 7500) r
             |FULL OUTER JOIN (SELECT c_custkey, cast(count(*) as bigint) AS n_big
             |  FROM customer JOIN orders ON o_custkey = c_custkey
             |  WHERE o_totalprice > 250000 GROUP BY c_custkey) b
             |ON r.c_custkey = b.c_custkey""".stripMargin),
      (s, d) => {
        val c = t(s, d, "customer")
        val rich = c.filter(col("c_acctbal") > 7500)
          .select(col("c_custkey"), lit(true).as("rich"))
        val big = c.join(t(s, d, "orders"), col("o_custkey") === col("c_custkey"))
          .filter(col("o_totalprice") > 250000)
          .groupBy(col("c_custkey")).agg(count(lit(1)).as("n_big"))
        rich.join(big, Seq("c_custkey"), "full_outer")
          .select(col("c_custkey").as("custkey"),
            coalesce(col("rich"), lit(false)).as("is_rich"),
            coalesce(col("n_big"), lit(0L)).as("n_big"))
      }),

    QueryDef(
      "q23_grouping_sets",
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             |  cast(sum(cast(round(l_quantity * 100) as bigint)) as double) / 100 AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin),
      (s, d) => {
        // view name derived from the data dir: concurrent runs against
        // different scale factors must not rebind each other's views
        val v = s"li_q23_${math.abs(d.hashCode)}"
        t(s, d, "lineitem").createOrReplaceTempView(v)
        s.sql(s"""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
                |  cast(sum(cast(round(l_quantity * 100) as bigint)) as double) / 100 AS sum_qty
                |FROM $v
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
      }),

    QueryDef(
      "q24_correlated_subquery",
      Some("""SELECT c_custkey,
             |  (SELECT count(*) FROM orders
             |   WHERE o_custkey = c_custkey AND o_totalprice > 150000) AS n_big
             |FROM customer""".stripMargin),
      (s, d) => {
        val suffix = math.abs(d.hashCode)
        val cv = s"cust_q24_$suffix"; val ov = s"ord_q24_$suffix"
        t(s, d, "customer").createOrReplaceTempView(cv)
        t(s, d, "orders").createOrReplaceTempView(ov)
        s.sql(s"""SELECT c_custkey,
                |  (SELECT count(*) FROM $ov
                |   WHERE o_custkey = c_custkey AND o_totalprice > 150000) AS n_big
                |FROM $cv""".stripMargin)
      }),

    // Uncorrelated IN / NOT IN subqueries (complement to q13's
    // DataFrame-API semi/anti joins).
    QueryDef(
      "q31_in_subquery",
      Some("""SELECT p_partkey, p_brand FROM part
             |WHERE p_partkey IN (SELECT l_partkey FROM lineitem
             |                    WHERE l_quantity >= 48)
             |  AND p_partkey NOT IN (SELECT l_partkey FROM lineitem
             |                        WHERE l_returnflag = 'R')""".stripMargin),
      (s, d) => {
        val suffix = math.abs(d.hashCode)
        val pv = s"part_q31_$suffix"; val lv = s"li_q31_$suffix"
        t(s, d, "part").createOrReplaceTempView(pv)
        t(s, d, "lineitem").createOrReplaceTempView(lv)
        s.sql(s"""SELECT p_partkey, p_brand FROM $pv
                |WHERE p_partkey IN (SELECT l_partkey FROM $lv
                |                    WHERE l_quantity >= 48)
                |  AND p_partkey NOT IN (SELECT l_partkey FROM $lv
                |                        WHERE l_returnflag = 'R')""".stripMargin)
      }),

    // Array/collection functions: collect -> sort -> join as string (a
    // string output keeps the cross-engine compare scalar-typed).
    QueryDef(
      "q26_array_funcs",
      Some("""SELECT l_orderkey AS key,
             |  string_agg(cast(l_linenumber as varchar), ','
             |             ORDER BY l_linenumber) AS lines,
             |  count(*) AS n_lines
             |FROM lineitem GROUP BY l_orderkey""".stripMargin),
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_orderkey").as("key"))
        .agg(
          expr("array_join(transform(sort_array(collect_list(l_linenumber)), " +
            "x -> cast(x as string)), ',')").as("lines"),
          count(lit(1)).as("n_lines"))),

    // Date arithmetic: shipping delay in days + interval comparison.
    QueryDef(
      "q30_date_arithmetic",
      Some("""SELECT cast(date_diff('day', o_orderdate, l_shipdate) as int) AS delay_days,
             |  count(*) AS n
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= o_orderdate
             |GROUP BY 1""".stripMargin),
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >= col("o_orderdate"))
        .groupBy(datediff(col("l_shipdate"), col("o_orderdate")).as("delay_days"))
        .agg(count(lit(1)).as("n"))),

    // Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL keep
    // duplicate multiplicity, unlike q09's set variants).
    QueryDef(
      "q28_setops_all",
      Some("""SELECT l_partkey, 'common' AS tag FROM (
             |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
             |  INTERSECT ALL
             |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A') i
             |UNION ALL
             |SELECT l_partkey, 'r_extra' AS tag FROM (
             |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
             |  EXCEPT ALL
             |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A') e""".stripMargin),
      (s, d) => {
        val li = t(s, d, "lineitem")
        val r = li.filter(col("l_returnflag") === "R").select("l_partkey")
        val a = li.filter(col("l_returnflag") === "A").select("l_partkey")
        r.intersectAll(a).withColumn("tag", lit("common"))
          .unionAll(r.exceptAll(a).withColumn("tag", lit("r_extra")))
      }),

    // JSON extraction through the native json path functions.
    QueryDef(
      "q29_json_funcs",
      Some("""SELECT event_id,
             |  cast(json_extract_string(props, '$.k') as int) AS k,
             |  cast(json_extract_string(props, '$.missing') as int) AS missing
             |FROM events""".stripMargin),
      (s, d) => t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        get_json_object(col("props"), "$.missing").cast("int").as("missing"))),

    // Pivot with explicit values -> deterministic column names; oracle
    // is the equivalent conditional aggregation.
    QueryDef(
      "q27_pivot",
      Some("""SELECT l_returnflag,
             |  cast(sum(CASE WHEN l_linestatus = 'F'
             |    THEN cast(round(l_quantity * 100) as bigint) END) as double) / 100 AS F,
             |  cast(sum(CASE WHEN l_linestatus = 'O'
             |    THEN cast(round(l_quantity * 100) as bigint) END) as double) / 100 AS O
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      (s, d) => t(s, d, "lineitem")
        .withColumn("q100", expr("cast(round(l_quantity * 100) as bigint)"))
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("q100")))
        .select(col("l_returnflag"),
          (col("F").cast("double") / 100).as("F"),
          (col("O").cast("double") / 100).as("O"))),

    // Approximate distinct / percentile sketches (HLL++, GK): the
    // estimators differ from DuckDB's, so the estimates themselves can't
    // be hash-compared. Instead the EXACT NDV is the hash-checked
    // column, and each estimate is asserted within error bounds ON THE
    // SPARK SIDE, exported as a boolean the oracle pins to TRUE — an
    // out-of-bounds estimate flips the flag and fails the hash match.
    // Bounds: HLL++ default rsd is 5%, we allow 3 sigma (15%). The
    // percentile estimates are verified by their EXACT RANK: a second
    // cheap pass counts the fraction of values at or below each
    // estimate — sort-free (the exact `percentile` bound variant cost
    // 4x the whole query) yet a true exactness check: GK at accuracy
    // 1000 guarantees rank error <= 0.1%, asserted here with a
    // generous 5-point band.
    QueryDef(
      "q25_approx_distinct",
      Some("""SELECT l_returnflag,
             |  cast(count(DISTINCT l_partkey) as bigint) AS exact_parts,
             |  TRUE AS approx_parts_ok, TRUE AS p50_ok, TRUE AS p95_ok
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      (s, d) => {
        val li = t(s, d, "lineitem")
        // exact NDV as dedup + count (two plain two-phase aggs) instead
        // of count(DISTINCT) inside the mixed aggregate: the latter
        // plans an Expand that doubles the scan's rows
        // isNotNull keeps count(DISTINCT) semantics: a NULL partkey
        // must not count as a distinct value
        val exact = li.select(col("l_returnflag"), col("l_partkey"))
          .filter(col("l_partkey").isNotNull).distinct()
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_parts"))
        val est = li.groupBy(col("l_returnflag")).agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D), 1000)").as("pe"))
          .join(exact, "l_returnflag") // grouping-cardinality-sized join
          .select(col("l_returnflag"), col("exact_parts"), col("approx_parts"),
            element_at(col("pe"), 1).as("p50"), element_at(col("pe"), 2).as("p95"))
        li.join(broadcast(est), "l_returnflag")
          .groupBy(col("l_returnflag"))
          .agg(
            first(col("exact_parts")).as("exact_parts"),
            first(col("approx_parts")).as("approx_parts"),
            (sum(when(col("l_extendedprice") <= col("p50"), 1L).otherwise(0L))
              .cast("double") / count(lit(1))).as("f50"),
            (sum(when(col("l_extendedprice") <= col("p95"), 1L).otherwise(0L))
              .cast("double") / count(lit(1))).as("f95"))
          .select(col("l_returnflag"), col("exact_parts"),
            (abs(col("approx_parts") - col("exact_parts"))
              <= col("exact_parts") * 0.15).as("approx_parts_ok"),
            col("f50").between(0.45, 0.55).as("p50_ok"),
            col("f95").between(0.90, 1.0).as("p95_ok"))
      })
  )
}

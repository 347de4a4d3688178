package graft.relational

import graft.{Catalog, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third batch of relational coverage: temporal joins (as-of, banded
  * range), deterministic hash sampling, unpivot, ranking-window extras,
  * time-series gap filling with forward fill, and exact medians.
  *
  * Scale notes (100 TB stance):
  *  - j01 as-of join runs as the union-merge idiom: tag both inputs,
  *    ONE shuffle on the join key, a running `last(ignoreNulls)` window
  *    — never a per-row probe or a quadratic time join. This is the
  *    standard distributed as-of shape (a sort-merge within key groups).
  *  - j02 range join bands time into fixed buckets: each probe row
  *    expands to the 2 buckets its window can span, the join shuffles on
  *    (key, bucket), and the exact range predicate filters in-bucket —
  *    bounds the blowup to bucket co-residents instead of all pairs per
  *    key.
  *  - q32 sampling is hash-mod, not `rand()`: reproducible across
  *    retries/executors (a must for distributed lineage) and pushes as a
  *    plain filter.
  *  - q35 builds the day grid from a broadcast bounds row — the grid is
  *    |users| x |days| rows but never materializes on the driver.
  */
object RelationalQueries3 {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Catalog.t(s, d, n)

  private val HourMs = 3600000L
  private val DayMs = 86400000L
  private val GapMs = 1800000L // q47 session gap: 30 min, matches st02

  def all: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------- as-of join
    // Most recent order at-or-before each event (by customer). Orders are
    // first reduced to one representative per (custkey, orderdate) so the
    // as-of pick is unique in both engines. Spark side: union-merge —
    // tag order/event rows, single window pass per customer.
    QueryDef(
      "j01_asof_join",
      Some("""WITH reps AS (SELECT o_custkey, max(o_orderkey) AS order_key,
             |    epoch_ms(o_orderdate) AS order_ms
             |  FROM orders GROUP BY o_custkey, o_orderdate),
             |e AS (SELECT event_id, user_id,
             |    epoch_ms(cast(ts as timestamp)) AS ts_ms FROM events)
             |SELECT e.event_id, e.user_id, e.ts_ms, r.order_key, r.order_ms
             |FROM e ASOF LEFT JOIN reps r
             |  ON e.user_id = r.o_custkey AND e.ts_ms >= r.order_ms""".stripMargin),
      (s, d) => {
        val reps = t(s, d, "orders")
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max(col("o_orderkey")).as("order_key"))
          // o_orderdate is TIMESTAMP_NTZ; session TZ is UTC so the cast
          // preserves the instant and unix_millis matches epoch_ms
          .withColumn("oms", expr("unix_millis(cast(o_orderdate as timestamp))"))
          .select(col("o_custkey").as("user_id"), col("oms").as("tm"),
            lit(1).as("src"), col("order_key"), col("oms").as("order_ms"),
            lit(null).cast("long").as("event_id"))
        val ev = t(s, d, "events").select(col("user_id"),
          unix_millis(col("ts")).as("tm"),
          lit(0).as("src"), lit(null).cast("long").as("order_key"),
          lit(null).cast("long").as("order_ms"), col("event_id"))
        // at equal time an order applies to the event (<=): orders sort
        // first via src desc; event_id breaks residual ties
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tm").asc, col("src").desc, col("event_id").asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        reps.unionByName(ev)
          .withColumn("ok", last(col("order_key"), ignoreNulls = true).over(w))
          .withColumn("om", last(col("order_ms"), ignoreNulls = true).over(w))
          .filter(col("src") === 0)
          .select(col("event_id"), col("user_id"), col("tm").as("ts_ms"),
            col("ok").as("order_key"), col("om").as("order_ms"))
      }),

    // ------------------------------------------------- banded range join
    // Click-to-purchase attribution: for each purchase, the same user's
    // clicks in the preceding hour. Purchases probe the 2 hour-buckets
    // j03: FORWARD as-of with tolerance — for each purchase, the
    // customer's FIRST click at-or-after it, nulled beyond a 1-hour
    // horizon (forward attribution; j01 is the backward direction).
    // Same union-merge idiom scanned in DESCENDING time: the running
    // last(ignoreNulls) click in the reverse scan IS the nearest
    // following click — one shuffle per key, no probe join, no
    // quadratic time join. The oracle mirrors the window with
    // last_value(... IGNORE NULLS) over the identical frame.
    QueryDef(
      "j03_asof_forward",
      Some(s"""WITH ev AS (SELECT event_id, user_id, event_type,
              |    epoch_ms(cast(ts as timestamp)) AS ms FROM events),
              |u AS (SELECT user_id, ms AS tm, 1 AS src, event_id AS pid,
              |    cast(NULL as bigint) AS cid FROM ev WHERE event_type = 'purchase'
              |  UNION ALL SELECT user_id, ms, 0, NULL, event_id
              |  FROM ev WHERE event_type = 'click'),
              |w AS (SELECT *,
              |    last_value(cid IGNORE NULLS) OVER win AS ncid,
              |    last_value(CASE WHEN src = 0 THEN tm END IGNORE NULLS)
              |      OVER win AS ncms
              |  FROM u WINDOW win AS (PARTITION BY user_id
              |    ORDER BY tm DESC, src ASC, cid DESC NULLS LAST
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              |SELECT pid AS purchase_id, user_id, tm AS pms,
              |  CASE WHEN ncms <= tm + $HourMs THEN ncid END AS next_click_id,
              |  CASE WHEN ncms <= tm + $HourMs THEN ncms END AS next_cms
              |FROM w WHERE src = 1""".stripMargin),
      (s, d) => {
        val ev = t(s, d, "events").select(col("event_id"), col("user_id"),
          col("event_type"), unix_millis(col("ts")).as("ms"))
        val pur = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ms").as("tm"), lit(1).as("src"),
            col("event_id").as("pid"), lit(null).cast("long").as("cid"))
        val clk = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ms").as("tm"), lit(0).as("src"),
            lit(null).cast("long").as("pid"), col("event_id").as("cid"))
        // reverse scan: larger times first; at equal tm clicks (src 0)
        // precede purchases so a same-ms click is visible (>=); equal-ms
        // clicks order by id desc so the running last is the SMALLEST id
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tm").desc, col("src").asc, col("cid").desc_nulls_last)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pur.unionByName(clk)
          .withColumn("ncid", last(col("cid"), ignoreNulls = true).over(w))
          .withColumn("ncms", last(when(col("src") === 0, col("tm")),
            ignoreNulls = true).over(w))
          .filter(col("src") === 1)
          .select(col("pid").as("purchase_id"), col("user_id"),
            col("tm").as("pms"),
            when(col("ncms") <= col("tm") + HourMs, col("ncid"))
              .as("next_click_id"),
            when(col("ncms") <= col("tm") + HourMs, col("ncms"))
              .as("next_cms"))
      }),

    // the window can span; the exact range filters in-bucket. All time
    // math on ms bigints so both engines compare identical integers.
    QueryDef(
      "j02_range_join",
      Some(s"""WITH ev AS (SELECT event_id, user_id, event_type, value,
              |    epoch_ms(cast(ts as timestamp)) AS ms FROM events),
              |p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
              |c AS (SELECT * FROM ev WHERE event_type = 'click')
              |SELECT p.event_id, p.user_id, count(c.event_id) AS n_clicks,
              |  cast(coalesce(sum(cast(round(c.value * 100) as bigint)), 0)
              |    as double) / 100 AS click_value
              |FROM p LEFT JOIN c ON c.user_id = p.user_id
              |  AND c.ms >= p.ms - $HourMs AND c.ms < p.ms
              |GROUP BY p.event_id, p.user_id""".stripMargin),
      (s, d) => {
        val ev = t(s, d, "events").select(col("event_id"), col("user_id"),
          col("event_type"), col("value"), unix_millis(col("ts")).as("ms"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id").as("puser"), col("ms").as("pms"))
          .withColumn("bkt",
            explode(expr(s"array(pms div $HourMs, pms div $HourMs - 1)")))
        val c = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id").as("cuser"),
            expr("cast(round(value * 100) as bigint)").as("v100"),
            col("ms").as("cms"))
          .withColumn("bkt", expr(s"cms div $HourMs"))
        p.join(c, p("bkt") === c("bkt") && col("cuser") === col("puser") &&
            col("cms") >= col("pms") - HourMs && col("cms") < col("pms"), "left")
          .groupBy(col("event_id"), col("puser"))
          .agg(count(col("click_id")).as("n_clicks"),
            (coalesce(sum(col("v100")), lit(0L)).cast("double") / 100)
              .as("click_value"))
          .select(col("event_id"), col("puser").as("user_id"),
            col("n_clicks"), col("click_value"))
      }),

    // ------------------------------------- deterministic stratified sample
    // Hash-mod sampling with per-stratum rates (A 10%, N 5%, R 20%) —
    // reproducible under retries and partitioning, unlike rand().
    QueryDef(
      "q32_hash_sample",
      Some {
        val key = "cast(l_orderkey as varchar) || '|' || cast(l_linenumber as varchar)"
        s"""WITH x AS (SELECT l_orderkey, l_linenumber, l_returnflag,
           |    ${graft.llm.TextExprs.duckWordHash(s"($key)")} % 100 AS bucket
           |  FROM lineitem)
           |SELECT l_orderkey, l_linenumber, l_returnflag FROM x
           |WHERE bucket < CASE l_returnflag WHEN 'A' THEN 10
           |  WHEN 'N' THEN 5 ELSE 20 END""".stripMargin
      },
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        t(s, d, "lineitem")
          .withColumn("bucket", expr(
            "graft_polyhash32(concat(cast(l_orderkey as string), '|', " +
              "cast(l_linenumber as string))) % 100"))
          .filter(col("bucket") < expr(
            "CASE l_returnflag WHEN 'A' THEN 10 WHEN 'N' THEN 5 ELSE 20 END"))
          .select("l_orderkey", "l_linenumber", "l_returnflag")
      }),

    // ------------------------------------------------------------ unpivot
    QueryDef(
      "q33_unpivot",
      Some("""SELECT 'quantity' AS metric,
             |  cast(sum(cast(round(l_quantity * 100) as bigint)) as double) / 100 AS total
             |FROM lineitem
             |UNION ALL SELECT 'extendedprice',
             |  cast(sum(cast(round(l_extendedprice * 100) as bigint)) as double) / 100
             |FROM lineitem
             |UNION ALL SELECT 'discount',
             |  cast(sum(cast(round(l_discount * 100) as bigint)) as double) / 100
             |FROM lineitem""".stripMargin),
      (s, d) => t(s, d, "lineitem")
        .select(
          expr("cast(round(l_quantity * 100) as bigint)").as("quantity"),
          expr("cast(round(l_extendedprice * 100) as bigint)").as("extendedprice"),
          expr("cast(round(l_discount * 100) as bigint)").as("discount"))
        .unpivot(Array.empty[org.apache.spark.sql.Column], "metric", "cents")
        .groupBy(col("metric"))
        .agg((sum(col("cents")).cast("double") / 100).as("total"))),

    // ---------------------------------------------- ranking-window extras
    // ntile / percent_rank / cume_dist per priority group; cents +
    // orderkey tie-break make the ordering unique so rank ratios are
    // identical integers in both engines.
    QueryDef(
      "q34_window_extras",
      Some("""WITH o AS (SELECT o_orderkey, o_orderpriority,
             |    cast(round(o_totalprice * 100) as bigint) AS cents FROM orders)
             |SELECT o_orderkey, o_orderpriority,
             |  cast(ntile(4) OVER w as int) AS tile,
             |  percent_rank() OVER w AS pr,
             |  cume_dist() OVER w AS cd
             |FROM o WINDOW w AS (PARTITION BY o_orderpriority
             |  ORDER BY cents, o_orderkey)""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("cents"), col("o_orderkey"))
        t(s, d, "orders")
          .withColumn("cents", expr("cast(round(o_totalprice * 100) as bigint)"))
          .select(col("o_orderkey"), col("o_orderpriority"),
            ntile(4).over(w).as("tile"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
      }),

    // ------------------------------------- gap fill + forward fill (events)
    // Dense per-user day grid over the observed range; missing days get
    // n=0 and a forward-filled last observed count. The grid derives from
    // a broadcast 1-row bounds aggregate — distributed, no driver loop.
    QueryDef(
      "q35_time_fill",
      Some(s"""WITH ev AS (SELECT user_id,
              |    epoch_ms(cast(ts as timestamp)) // $DayMs AS day
              |  FROM events WHERE user_id < 20),
              |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
              |u AS (SELECT DISTINCT user_id FROM ev),
              |g AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM u, b),
              |daily AS (SELECT user_id, day, count(*) AS n FROM ev GROUP BY 1, 2)
              |SELECT g.user_id, g.day, coalesce(daily.n, 0) AS n,
              |  last_value(daily.n IGNORE NULLS) OVER (PARTITION BY g.user_id
              |    ORDER BY g.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    AS ffill
              |FROM g LEFT JOIN daily USING (user_id, day)""".stripMargin),
      (s, d) => {
        val ev = t(s, d, "events").filter(col("user_id") < 20)
          .select(col("user_id"), expr(s"unix_millis(ts) div $DayMs").as("day"))
        val bounds = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val daily = ev.groupBy(col("user_id"), col("day"))
          .agg(count(lit(1)).as("n"))
        val grid = ev.select("user_id").distinct()
          .crossJoin(broadcast(bounds))
          .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"),
            coalesce(col("n"), lit(0L)).as("n"),
            last(col("n"), ignoreNulls = true).over(w).as("ffill"))
      }),

    // ------------------------------------------- RANGE window frame
    // Per-user sliding-hour event-value sum: a RANGE frame over the ms
    // timestamp (value-based bounds, unlike the ROWS frames of q07) —
    // every row sums all events of the same user within the trailing
    // hour. Cents arithmetic keeps the sums engine-exact.
    QueryDef(
      "q37_range_frame",
      Some(s"""WITH ev AS (SELECT event_id, user_id,
              |    epoch_ms(cast(ts as timestamp)) AS ms,
              |    cast(round(value * 100) as bigint) AS v100 FROM events)
              |SELECT event_id, user_id, ms,
              |  cast(sum(v100) OVER (PARTITION BY user_id ORDER BY ms
              |    RANGE BETWEEN $HourMs PRECEDING AND CURRENT ROW) as double)
              |    / 100 AS hour_value
              |FROM ev""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ms"))
          .rangeBetween(-HourMs, Window.currentRow)
        t(s, d, "events")
          .select(col("event_id"), col("user_id"),
            unix_millis(col("ts")).as("ms"),
            expr("cast(round(value * 100) as bigint)").as("v100"))
          .select(col("event_id"), col("user_id"), col("ms"),
            (sum(col("v100")).over(w).cast("double") / 100).as("hour_value"))
      }),

    // --------------------------------------- uncorrelated scalar subquery
    // Orders above the global average price. The average is one exact
    // integer sum + one IEEE division in both engines, so the filter
    // boundary is bit-identical.
    QueryDef(
      "q38_scalar_subquery",
      Some("""SELECT o_orderkey,
             |  cast(cast(round(o_totalprice * 100) as bigint) as double) / 100
             |    AS totalprice
             |FROM orders
             |WHERE cast(cast(round(o_totalprice * 100) as bigint) as double) >
             |  (SELECT cast(sum(cast(round(o_totalprice * 100) as bigint)) as double)
             |     / count(*) FROM orders)""".stripMargin),
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders")
        s.sql("""
          SELECT o_orderkey,
            cast(cast(round(o_totalprice * 100) as bigint) as double) / 100
              AS totalprice
          FROM orders
          WHERE cast(cast(round(o_totalprice * 100) as bigint) as double) >
            (SELECT cast(sum(cast(round(o_totalprice * 100) as bigint)) as double)
               / count(*) FROM orders)""")
      }),

    // ------------------------------------------------------- LATERAL join
    // Top-2 orders per customer via a correlated LATERAL subquery — the
    // SQL-surface form of the per-group top-k (q06 does the same with a
    // window). Catalyst rewrites it to a ranked join, so it scales like
    // the window formulation.
    QueryDef(
      "q39_lateral_topk",
      Some("""SELECT c.c_custkey, o.o_orderkey,
             |  cast(o.cents as double) / 100 AS totalprice
             |FROM customer c, LATERAL (
             |  SELECT o_orderkey, cast(round(o_totalprice * 100) as bigint) AS cents
             |  FROM orders WHERE o_custkey = c.c_custkey
             |  ORDER BY cents DESC, o_orderkey LIMIT 2) o""".stripMargin),
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("customer")
        t(s, d, "orders").createOrReplaceTempView("orders")
        s.sql("""
          SELECT c.c_custkey, o.o_orderkey,
            cast(o.cents as double) / 100 AS totalprice
          FROM customer c, LATERAL (
            SELECT o_orderkey, cast(round(o_totalprice * 100) as bigint) AS cents
            FROM orders WHERE o_custkey = c.c_custkey
            ORDER BY cents DESC, o_orderkey LIMIT 2) o""")
      }),

    // -------------------------------------------------------- exact median
    // Lower median by integer row pick ((n+1) div 2 over a unique
    // ordering) — exact and engine-independent, unlike interpolating
    // percentile_cont variants.
    QueryDef(
      "q36_exact_median",
      Some("""WITH x AS (SELECT l_returnflag,
             |    cast(round(l_quantity * 100) as bigint) AS q100,
             |    row_number() OVER (PARTITION BY l_returnflag
             |      ORDER BY cast(round(l_quantity * 100) as bigint),
             |        l_orderkey, l_linenumber) AS rn,
             |    count(*) OVER (PARTITION BY l_returnflag) AS cnt
             |  FROM lineitem)
             |SELECT l_returnflag, cast(q100 as double) / 100 AS median
             |FROM x WHERE rn = (cnt + 1) // 2""".stripMargin),
      (s, d) => {
        val wo = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("q100"), col("l_orderkey"), col("l_linenumber"))
        val wc = Window.partitionBy(col("l_returnflag"))
        t(s, d, "lineitem")
          .withColumn("q100", expr("cast(round(l_quantity * 100) as bigint)"))
          .select(col("l_returnflag"), col("q100"),
            row_number().over(wo).as("rn"), count(lit(1)).over(wc).as("cnt"))
          .filter(col("rn") === expr("(cnt + 1) div 2"))
          .select(col("l_returnflag"),
            (col("q100").cast("double") / 100).as("median"))
      }),

    // -------------------------------------------- statistical aggregates
    // corr / covar_samp / stddev_samp per group — computed from EXACT
    // BIGINT fixed-point moments (n, Sx, Sy, Sxx, Sxy, Syy), cast to
    // double only for the final closed-form arithmetic. Engine-native
    // corr()/stddev() stream doubles in partition order and are NOT
    // cross-engine reproducible; decimal moments are exact but the
    // decimal->double cast rounds differently across engines (observed:
    // 1-ulp corr drift at sf0.001) — int64->double is a single IEEE
    // round-to-nearest in both. Fixed point: quantity in cents, price
    // in whole dollars, keeping Syy < 2^63 through sf ~ 10.
    QueryDef(
      "q40_stats_moments",
      Some(s"""WITH f AS (SELECT l_returnflag,
              |    cast(round(l_quantity * 100) as bigint) AS x,
              |    cast(round(l_extendedprice) as bigint) AS y FROM lineitem),
              |m AS (SELECT l_returnflag, count(*) AS n,
              |    cast(sum(x) as bigint) AS sx, cast(sum(y) as bigint) AS sy,
              |    cast(sum(x * x) as bigint) AS sxx,
              |    cast(sum(x * y) as bigint) AS sxy,
              |    cast(sum(y * y) as bigint) AS syy
              |  FROM f GROUP BY l_returnflag),
              |d AS (SELECT l_returnflag, cast(n as double) AS n,
              |    cast(sx as double) AS sx, cast(sy as double) AS sy,
              |    cast(sxx as double) AS sxx, cast(sxy as double) AS sxy,
              |    cast(syy as double) AS syy FROM m)
              |SELECT l_returnflag, cast(n as bigint) AS n,
              |  $corrSql AS corr_qp, $covarSql AS covar_qp, $stddevSql AS stddev_q
              |FROM d""".stripMargin),
      (s, d) => {
        val li = t(s, d, "lineitem")
        val m = li
          .select(col("l_returnflag"),
            expr("cast(round(l_quantity * 100) as bigint)").as("x"),
            expr("cast(round(l_extendedprice) as bigint)").as("y"))
          .groupBy(col("l_returnflag")).agg(
            count(lit(1)).as("n0"),
            sum(col("x")).as("sx0"), sum(col("y")).as("sy0"),
            sum(col("x") * col("x")).as("sxx0"),
            sum(col("x") * col("y")).as("sxy0"),
            sum(col("y") * col("y")).as("syy0"))
        m.select(col("l_returnflag"), col("n0").cast("double").as("n"),
            col("sx0").cast("double").as("sx"), col("sy0").cast("double").as("sy"),
            col("sxx0").cast("double").as("sxx"), col("sxy0").cast("double").as("sxy"),
            col("syy0").cast("double").as("syy"))
          .select(col("l_returnflag"), col("n").cast("long").as("n"),
            expr(corrSql).as("corr_qp"), expr(covarSql).as("covar_qp"),
            expr(stddevSql).as("stddev_q"))
      }),

    // Salted skew join through the hash gate: the salted dataflow
    // (ScaleOps.saltedJoin - big side scattered over 8 salt buckets,
    // small side replicated) must produce EXACTLY the plain join's
    // aggregate. Salting only reroutes rows; the oracle is the
    // unsalted SQL.
    QueryDef(
      "q41_salted_join",
      Some("""SELECT p.p_brand, count(*) AS n_items,
             |  cast(sum(cast(round(l.l_extendedprice * 100) as bigint)) as bigint)
             |    AS revenue_cents
             |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |WHERE p.p_size <= 10 GROUP BY p.p_brand""".stripMargin),
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select(col("l_partkey"),
            expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"))
        val pt = t(s, d, "part").filter(col("p_size") <= 10)
          .select(col("p_partkey"), col("p_brand"))
        ScaleOps.saltedJoin(li, pt, "l_partkey", "p_partkey", factor = 8)
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("cents")).as("revenue_cents"))
      }),

    // Bloom-pruned join through the hash gate: the pre-shuffle Bloom
    // filter never false-negatives, so the pruned join's aggregate must
    // equal the plain join's. (The filter's only effect is fewer
    // shuffled bytes - exactly what the oracle cannot see.)
    QueryDef(
      "q42_bloom_join",
      Some("""SELECT count(*) AS n_items,
             |  cast(sum(l.l_quantity) as bigint) AS total_qty
             |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |WHERE s.s_acctbal > 5000""".stripMargin),
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select(col("l_suppkey"), col("l_quantity").cast("long").as("qty"))
        val sup = t(s, d, "supplier").filter(col("s_acctbal") > 5000)
          .select(col("s_suppkey"))
        ScaleOps.bloomPrunedJoin(li, sup, "l_suppkey", "s_suppkey",
            expectedItems = 10000)
          .agg(count(lit(1)).as("n_items"), sum(col("qty")).as("total_qty"))
      }),

    // Ordered funnel analysis: per user, the earliest strictly-ordered
    // view -> click -> purchase completion (each step's timestamp must
    // exceed the previous step's). The canonical product-analytics
    // query; every stage is a keyed filter-aggregate or a user_id-keyed
    // join — map-side partial everywhere, no window wider than a user.
    QueryDef(
      "q43_funnel",
      Some("""WITH e AS (SELECT user_id, event_type,
             |    epoch_ms(cast(ts as timestamp)) AS tms FROM events),
             |v AS (SELECT user_id, min(tms) AS t1 FROM e
             |  WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, min(tms) AS t2 FROM e JOIN v USING (user_id)
             |  WHERE event_type = 'click' AND tms > t1 GROUP BY 1),
             |p AS (SELECT e.user_id, min(tms) AS t3 FROM e JOIN c USING (user_id)
             |  WHERE event_type = 'purchase' AND tms > t2 GROUP BY 1)
             |SELECT v.user_id, t1, t2, t3,
             |  cast(1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
             |    + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END as int) AS steps
             |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin),
      (s, d) => {
        val e = t(s, d, "events").select(col("user_id"), col("event_type"),
          unix_millis(col("ts")).as("tms"))
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("tms")).as("t1"))
        val c = e.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("tms") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("tms")).as("t2"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("tms") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("tms")).as("t3"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .select(col("user_id"), col("t1"), col("t2"), col("t3"),
            (lit(1) + col("t2").isNotNull.cast("int")
              + col("t3").isNotNull.cast("int")).as("steps"))
      }),

    // Join-key skew profile: the diagnostic you run BEFORE choosing a
    // salting/AQE strategy — top-20 heaviest keys with their share of
    // all rows. One map-side-partial aggregate, a broadcast 1-row total,
    // and a deterministic top-k (cnt desc, key asc); at any scale the
    // heavy hitters are what this surfaces, and limit-20 keeps the
    // result driver-sized.
    QueryDef(
      "q44_skew_profile",
      Some("""WITH f AS (SELECT l_suppkey AS key, count(*) AS cnt
             |  FROM lineitem GROUP BY 1),
             |t AS (SELECT cast(sum(cnt) as bigint) AS total FROM f)
             |SELECT key, cnt, cast(cnt as double) / total AS share
             |FROM f, t ORDER BY cnt DESC, key ASC LIMIT 20""".stripMargin),
      (s, d) => {
        val f = t(s, d, "lineitem")
          .groupBy(col("l_suppkey").as("key")).agg(count(lit(1)).as("cnt"))
        val tot = f.agg(sum(col("cnt")).as("total"))
        f.crossJoin(broadcast(tot))
          .select(col("key"), col("cnt"),
            (col("cnt").cast("double") / col("total")).as("share"))
          .orderBy(col("cnt").desc, col("key").asc)
          .limit(20)
      }),

    // Retention cohorts: customers grouped by first-order month, counted
    // in each subsequent month they ordered again — the classic cohort
    // triangle. Two keyed aggregates (first-order month, then distinct
    // customers per cohort x month-offset); everything shuffles on
    // custkey or the tiny (cohort, k) pair, and months arithmetic is
    // exact integer in both engines.
    QueryDef(
      "q45_retention_cohorts",
      Some("""WITH fo AS (SELECT o_custkey,
             |    min(date_trunc('month', o_orderdate)) AS cohort FROM orders
             |  GROUP BY 1),
             |m AS (SELECT o.o_custkey, fo.cohort,
             |    (date_part('year', o.o_orderdate) - date_part('year', fo.cohort)) * 12
             |      + (date_part('month', o.o_orderdate) - date_part('month', fo.cohort))
             |      AS k
             |  FROM orders o JOIN fo USING (o_custkey))
             |SELECT cohort, cast(k as int) AS k,
             |  count(DISTINCT o_custkey) AS n_cust
             |FROM m GROUP BY 1, 2""".stripMargin),
      (s, d) => {
        val o = t(s, d, "orders")
        // trunc() (not date_trunc) keeps DATE type — the oracle's
        // date_trunc over DATE stays DATE, and a timestamp here is a
        // cross-engine schema drift the ns-safe gate rejects
        val fo = o.groupBy(col("o_custkey"))
          .agg(min(trunc(col("o_orderdate"), "month")).as("cohort"))
        o.join(fo, "o_custkey")
          .select(col("o_custkey"), col("cohort"),
            ((year(col("o_orderdate")) - year(col("cohort"))) * 12
              + (month(col("o_orderdate")) - month(col("cohort")))).as("k"))
          .groupBy(col("cohort"), col("k"))
          .agg(countDistinct(col("o_custkey")).as("n_cust"))
      }),

    // Exact per-group quantiles by rank selection: the value at rank
    // ceil(q*n) in a total (cents, orderkey) order. Both engines state
    // the SAME rank formula — no reliance on either engine's
    // quantile-function indexing convention (they differ), no float
    // interpolation. Per-group windows bound the sort width; an exact
    // GLOBAL quantile at 100 TB uses the same rank math over a range
    // partitioning (globalPrefixSum's layout) instead.
    QueryDef(
      "q46_exact_quantiles",
      Some("""WITH o AS (SELECT o_orderpriority AS pri,
             |    cast(round(o_totalprice * 100) as bigint) AS cents, o_orderkey
             |  FROM orders),
             |r AS (SELECT pri, cents,
             |    row_number() OVER (PARTITION BY pri ORDER BY cents, o_orderkey)
             |      AS rn,
             |    count(*) OVER (PARTITION BY pri) AS n FROM o)
             |SELECT pri, cast(pct as int) AS pct, cents
             |FROM r CROSS JOIN (SELECT unnest([25, 50, 75, 95]) AS pct) q
             |WHERE rn = (n * pct + 99) // 100""".stripMargin),
      (s, d) => {
        val o = t(s, d, "orders").select(
          col("o_orderpriority").as("pri"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("cents"),
          col("o_orderkey"))
        val w = Window.partitionBy(col("pri"))
          .orderBy(col("cents"), col("o_orderkey"))
        val cw = Window.partitionBy(col("pri"))
        o.select(col("pri"), col("cents"),
            row_number().over(w).as("rn"), count(lit(1)).over(cw).as("n"))
          .withColumn("pct", explode(expr("array(25, 50, 75, 95)")))
          .filter(expr("rn = (n * pct + 99) div 100"))
          .select(col("pri"), col("pct"), col("cents"))
      }),

    // Batch sessionization — the batch twin of st02's stateful
    // streaming sessionizer: per user, a session breaks on >30 min
    // gaps; session ids are the running count of breaks (the classic
    // gaps-and-islands pair of windows), then one aggregate per
    // session. All windows are user-bounded; the same 30-min constant
    // as the streaming path.
    QueryDef(
      "q47_batch_sessions",
      Some(s"""WITH e AS (SELECT user_id, event_id,
              |    epoch_ms(cast(ts as timestamp)) AS ms FROM events),
              |x AS (SELECT user_id, event_id, ms,
              |    CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id
              |        ORDER BY ms, event_id) > $GapMs THEN 1 ELSE 0 END AS brk
              |  FROM e),
              |s AS (SELECT user_id, ms,
              |    sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
              |      ROWS UNBOUNDED PRECEDING) + 1 AS session_id
              |  FROM x)
              |SELECT user_id, cast(session_id as int) AS session_id,
              |  count(*) AS n_events, min(ms) AS start_ms, max(ms) AS end_ms
              |FROM s GROUP BY 1, 2""".stripMargin),
      (s, d) => {
        val ord = Seq(col("ms"), col("event_id"))
        val wl = Window.partitionBy(col("user_id")).orderBy(ord: _*)
        val wc = Window.partitionBy(col("user_id")).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
          .withColumn("brk",
            when(col("ms") - lag(col("ms"), 1).over(wl) > GapMs, 1)
              .otherwise(0))
          .withColumn("session_id", (sum(col("brk")).over(wc) + 1).cast("int"))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ms")).as("start_ms"), max(col("ms")).as("end_ms"))
      }),

    // GLOBAL exact quantiles without a single-reducer sort — the
    // corpus-wide companion of q46's per-group rank math, and the gate
    // for PLANS.md's claim that globalPrefixSum generalizes to exact
    // order statistics. Distinct-value counts prefix-sum into rank
    // RANGES (value v covers ranks cum-cnt+1..cum) under the range
    // partitioning; each target rank r = ceil(pct*n/100) — probed to
    // be DuckDB quantile_disc's convention — finds its value by a
    // broadcast range join against the tiny rank table. No window, no
    // global sort, no SinglePartition exchange at any width.
    QueryDef(
      "q48_global_quantiles",
      Some("""WITH o AS (SELECT cast(round(o_totalprice * 100) as bigint)
             |    AS cents FROM orders)
             |SELECT 1 AS pct, quantile_disc(cents, 0.01) AS cents FROM o
             |UNION ALL SELECT 25, quantile_disc(cents, 0.25) FROM o
             |UNION ALL SELECT 50, quantile_disc(cents, 0.50) FROM o
             |UNION ALL SELECT 75, quantile_disc(cents, 0.75) FROM o
             |UNION ALL SELECT 99, quantile_disc(cents, 0.99) FROM o""".stripMargin),
      (s, d) => {
        import s.implicits._
        val o = t(s, d, "orders")
          .select(expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
        val counts = o.groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
        val (pre, n) = ScaleOps.globalPrefixSumWithTotal(counts,
          Seq(col("cents").asc), col("cnt"), "cum")
        // r = ceil(pct * n / 100), integer-exact; clamped to >= 1
        val ranks = Seq(1, 25, 50, 75, 99)
          .map(p => (p, math.max(1L, (p * n + 99L) / 100L)))
          .toDF("pct", "r")
        pre.join(broadcast(ranks),
            col("r") > col("cum") - col("cnt") && col("r") <= col("cum"))
          .select(col("pct"), col("cents"))
      }),

    // SQL-interface parity: the ONE SQL text below runs verbatim through
    // `spark.sql` over registered views AND through DuckDB as its own
    // oracle — proving the engine's surface is reachable as ANSI SQL,
    // not only as the DataFrame API. (Catalyst still plans it: the
    // 3-table join broadcasts nation/customer, aggregation is partial.)
    QueryDef(
      "q49_sql_interface",
      Some(SqlInterfaceText),
      (s, d) => {
        Catalog.tableNames.foreach(n =>
          t(s, d, n).createOrReplaceTempView(n))
        s.sql(SqlInterfaceText)
      })
  )

  /** Shared dialect subset (ANSI joins, GROUP BY, HAVING, CASE, ORDER)
    * that parses and evaluates identically in Spark SQL and DuckDB.
    */
  private val SqlInterfaceText: String =
    """SELECT n_name,
      |  count(*) AS n_orders,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS urgent_orders,
      |  CAST(sum(o_custkey) AS BIGINT) AS custkey_sum
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |HAVING count(*) > 10""".stripMargin

  // Closed forms over the double-cast moments — ONE definition rendered
  // into both the Spark plan and the DuckDB oracle, so the IEEE
  // operation sequence is identical by construction.
  private def corrSql: String =
    "(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))"
  private def covarSql: String =
    "(sxy - (sx * sy) / n) / (n - cast(1 as double))"
  private def stddevSql: String =
    "sqrt((n * sxx - sx * sx) / (n * (n - cast(1 as double))))"
}

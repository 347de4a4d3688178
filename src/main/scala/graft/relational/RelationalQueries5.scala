package graft.relational

import graft.{Catalog, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifth batch: the round-14 inferential/robust statistics panel —
  * the readouts an experimentation or data-quality team runs on top of
  * the warehouse, each computed in EXACT integer/decimal arithmetic so
  * the two engines cannot drift (the q80/q81 discipline):
  *
  *  - q82 Mann–Whitney rank-sum test: the nonparametric A/B companion
  *    to q80's two-proportion z² — q80 tests a RATE, q82 tests a whole
  *    distribution shift (per-customer order counts between holdout
  *    arms) with no normality assumption. Tie-exact via doubled ranks.
  *  - q83 Gini concentration of token mass per source: the corpus-
  *    inequality screen ("is this source five giant documents in a
  *    trench coat?") that sits next to t46's drift and p29's caps.
  *  - q84 Kendall tau-a between two event streams' daily volumes:
  *    rank correlation from concordant/discordant day pairs — the
  *    monotone-association readout immune to outlier days (q81's
  *    robustness argument applied to correlation).
  *  - q85 lag-1 autocorrelation of daily event volume: the serial-
  *    dependence diagnostic (trend/seasonality smell test) behind
  *    every "is traffic i.i.d. enough to sample daily?" decision.
  *  - q86 Spearman rank correlation (round 15): Pearson over doubled
  *    average ranks — completes the rank-statistics trio (q82 rank
  *    sums, q84 concordance, q86 rank correlation), reported as the
  *    signed square so it stays one exact rational.
  *  - q87 Wald–Wolfowitz runs test (round 15): above/below-median
  *    sign streaks in daily volume — the categorical companion to
  *    q85's linear serial dependence.
  *
  * Scale notes (100 TB stance): every query reduces event/order volume
  * to a BOUNDED grain first — value grain (q82: the per-customer count
  * domain), source grain (q83), day grain (q84/q85: the calendar span,
  * zero-filled from a generated spine so missing days count as zeros in
  * both engines). The only pairwise work (q84) runs on the day spine —
  * (span choose 2) pairs regardless of event volume. Wide products ride
  * decimal(38,0)/HUGEINT (ANSI mode throws on int64 overflow, never
  * drifts). Per-op headroom: q82's z² stages its reduction past
  * n = 200000 customers (exact single rational below, ≤1.5e-5-z²
  * staging above, good to ~1e8 — see the q82 note); q83's Gini needs
  * n_docs·total_tokens·2e6 ≤ 1e38 (≈5e31 doc·tokens per source — far
  * past any real corpus); q84/q85 run at day grain where 38 digits
  * are effectively unbounded.
  */
object RelationalQueries5 {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Catalog.t(s, d, n)

  /** q86's staged-reduction crossover (round 17, from the r16 advice):
    * ONE constant interpolated into BOTH dialect strings, so the exact
    * and staged branches cannot drift apart silently above test scale.
    */
  private val Q86StageDays = 1000L

  def all: Seq[QueryDef] = Seq(

    // q82: MANN-WHITNEY U rank-sum test — per-customer order counts
    // compared between the o_custkey-parity holdout arms. Exactness:
    // ranks are handled at VALUE grain with the doubled-average-rank
    // trick (avg rank of a tie block starting after m smaller rows
    // with c members is m + (c+1)/2 — doubled, 2m + c + 1, an
    // integer), so U, its null mean, and the tie-corrected z² are all
    // exact rationals: z² = 3·(2U − n0n1)²·n(n−1) /
    // (n0·n1·(n³ − n − Σ(t³−t))). Headroom (ANSI throws loud past
    // it, never drifts): the single-rational numerator diff2²·3n(n−1)
    // ·1e6 reaches ~1.9e5·n⁶ when the arms fully separate (|diff2| =
    // n0·n1 ≈ n²/4), overflowing decimal(38,0)/HUGEINT near n ≈
    // 2.9e5 customers — so past n = 200000 both dialects switch to a
    // STAGED reduction: (diff2² div n0n1) — an integer ≤ n0n1 with
    // truncation error < 1 — times 3n(n−1)·1e6 div cubic. Numerator
    // ≤ 0.75e6·n⁴ → good to n ≈ 1e8 customers; the staging costs at
    // most 3e6/n fx units (≤ 15 at the crossover, i.e. z² off by
    // ≤ 1.5e-5), and both engines stage IDENTICALLY so the gate hash
    // cannot split. Rank-biserial effect size (2U/(n0n1) − 1) rides
    // the same doubled integers (safe to n ~ 2e16). Scale: one keyed
    // count per customer, then everything at COUNT-VALUE grain (a
    // handful of distinct values no matter how many customers).
    QueryDef(
      "q82_ranksum_test",
      Some("""WITH u AS (SELECT o_custkey, abs(o_custkey % 2) AS variant,
             |    count(*) AS cnt FROM orders GROUP BY 1, 2),
             |v AS (SELECT cnt AS val, count(*) AS c,
             |    sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS c1
             |  FROM u GROUP BY 1),
             |r AS (SELECT val, c, c1,
             |    coalesce(sum(c) OVER (ORDER BY val
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS m
             |  FROM v),
             |a AS (SELECT
             |    coalesce(sum(c1 * (2 * m + c + 1)), 0) AS r1_2,
             |    coalesce(sum(c1), 0) AS n1,
             |    coalesce(sum(c - c1), 0) AS n0,
             |    coalesce(sum(c * c * c - c), 0) AS tie_term
             |  FROM r),
             |z AS (SELECT n0, n1, tie_term,
             |    r1_2 - n1 * (n1 + 1) AS u1_2,
             |    n0 + n1 AS n,
             |    cast(r1_2 - n1 * (n1 + 1) as HUGEINT) - cast(n0 as
             |      HUGEINT) * n1 AS diff2,
             |    cast(n0 + n1 as HUGEINT) * (n0 + n1) * (n0 + n1)
             |      - (n0 + n1) - tie_term AS cubic
             |  FROM a)
             |SELECT cast(n0 as bigint) AS n_control,
             |  cast(n1 as bigint) AS n_treatment,
             |  cast(u1_2 as bigint) AS u1_doubled,
             |  cast(n0 * n1 as bigint) AS mean_u_doubled,
             |  cast(tie_term as bigint) AS tie_term,
             |  cast(CASE WHEN n0 = 0 OR n1 = 0 THEN 0
             |    ELSE diff2 * 1000000 // (cast(n0 as HUGEINT) * n1) END
             |    as bigint) AS rank_biserial_fx,
             |  cast(CASE WHEN n0 = 0 OR n1 = 0 OR cubic = 0 THEN 0
             |    WHEN n <= 200000
             |    THEN diff2 * diff2 * 3 * n * (n - 1) * 1000000
             |      // (cast(n0 as HUGEINT) * n1 * cubic)
             |    ELSE cast((diff2 * diff2)
             |        // (cast(n0 as HUGEINT) * n1) as HUGEINT)
             |      * 3 * n * (n - 1) * 1000000 // cubic
             |    END as bigint) AS z2_fx
             |FROM z""".stripMargin),
      (s, d) => {
        val u = t(s, d, "orders")
          .groupBy(col("o_custkey"), expr("abs(o_custkey % 2)").as("variant"))
          .agg(count(lit(1)).as("cnt"))
        val v = u.groupBy(col("cnt").as("val"))
          .agg(count(lit(1)).as("c"),
            sum(when(col("variant") === 1, 1L).otherwise(0L)).as("c1"))
        // value-grain window: a handful of rows however many customers
        val wm = Window.orderBy(col("val"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val r = v.withColumn("m",
          coalesce(sum(col("c")).over(wm), lit(0L)))
        r.agg(
          coalesce(sum(expr("c1 * (2 * m + c + 1)")), lit(0L)).as("r1_2"),
          coalesce(sum(col("c1")), lit(0L)).as("n1"),
          coalesce(sum(expr("c - c1")), lit(0L)).as("n0"),
          coalesce(sum(expr("c * c * c - c")), lit(0L)).as("tie_term"))
          .withColumn("u1_2", expr("r1_2 - n1 * (n1 + 1)"))
          .withColumn("n", expr("n0 + n1"))
          .withColumn("diff2", expr("cast(u1_2 as decimal(38,0))" +
            " - cast(n0 as decimal(38,0)) * n1"))
          .withColumn("cubic", expr("cast(n as decimal(38,0)) * n * n" +
            " - n - tie_term"))
          .select(col("n0").cast("long").as("n_control"),
            col("n1").cast("long").as("n_treatment"),
            col("u1_2").cast("long").as("u1_doubled"),
            expr("cast(n0 * n1 as bigint)").as("mean_u_doubled"),
            col("tie_term").cast("long").as("tie_term"),
            expr("cast(CASE WHEN n0 = 0 OR n1 = 0 THEN 0" +
              " ELSE diff2 * 1000000" +
              " div (cast(n0 as decimal(38,0)) * n1) END as bigint)")
              .as("rank_biserial_fx"),
            expr("cast(CASE WHEN n0 = 0 OR n1 = 0 OR cubic = 0 THEN 0" +
              " WHEN n <= 200000" +
              " THEN diff2 * diff2 * 3 * n * (n - 1) * 1000000" +
              " div (cast(n0 as decimal(38,0)) * n1 * cubic)" +
              " ELSE cast((diff2 * diff2)" +
              " div (cast(n0 as decimal(38,0)) * n1) as decimal(38,0))" +
              " * 3 * n * (n - 1) * 1000000 div cubic" +
              " END as bigint)").as("z2_fx"))
      }),

    // q83: GINI concentration of token mass per source — how unequal
    // a source's contribution is across its documents (a source whose
    // tokens live in three giant files needs different dedup/packing
    // treatment than one with uniform pages). Exactness: with docs
    // ranked ASCENDING by (tokens, doc_id), G = (2·Σi·xᵢ − (n+1)·Σx)
    // / (n·Σx); the tie-break is value-neutral (equal x inside a tie
    // block contribute x·Σi whatever the order), so the statistic is
    // deterministic and one integer division makes it fixed point.
    // Scale: one narrow projection, a per-source window at document
    // grain, one keyed aggregate — nothing pairwise.
    QueryDef(
      "q83_gini_concentration",
      Some("""WITH dd AS (SELECT source, doc_id,
             |    CASE WHEN text IS NULL THEN 0
             |      ELSE cast(len(string_split(text, ' ')) as bigint) END
             |      AS toks
             |  FROM documents),
             |r AS (SELECT source, toks, row_number() OVER (
             |    PARTITION BY source ORDER BY toks, doc_id) AS i
             |  FROM dd),
             |a AS (SELECT source, count(*) AS n, sum(toks) AS tot,
             |    sum(cast(i as HUGEINT) * toks) AS iwx
             |  FROM r GROUP BY 1)
             |SELECT source, cast(n as bigint) AS n_docs,
             |  cast(tot as bigint) AS total_tokens,
             |  cast(CASE WHEN tot = 0 THEN 0
             |    ELSE (2 * iwx - (cast(n as HUGEINT) + 1) * tot)
             |      * 1000000 // (cast(n as HUGEINT) * tot) END
             |    as bigint) AS gini_fx
             |FROM a""".stripMargin),
      (s, d) => {
        // NULL text → toks 0 explicitly (not coalesce: a legacy
        // sizeOfNull=-1 session would sneak -1 past a coalesce), so
        // the rank window's ORDER BY toks never sees a NULL — Spark
        // sorts NULLS FIRST ascending, DuckDB NULLS LAST, and a NULL
        // toks would shift every rank i cross-engine.
        val dd = t(s, d, "documents").select(col("source"), col("doc_id"),
          expr("CASE WHEN text IS NULL THEN 0L" +
            " ELSE cast(size(split(text, ' ')) as bigint) END").as("toks"))
        val wr = Window.partitionBy(col("source"))
          .orderBy(col("toks"), col("doc_id"))
        dd.withColumn("i", row_number().over(wr))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("toks")).as("tot"),
            sum(expr("cast(i as decimal(38,0)) * toks")).as("iwx"))
          .select(col("source"),
            col("n").cast("long").as("n_docs"),
            col("tot").cast("long").as("total_tokens"),
            expr("cast(CASE WHEN tot = 0 THEN 0" +
              " ELSE (2 * iwx - (cast(n as decimal(38,0)) + 1) * tot)" +
              " * 1000000 div (cast(n as decimal(38,0)) * tot) END" +
              " as bigint)").as("gini_fx"))
      }),

    // q84: KENDALL tau-a between click and purchase daily volumes —
    // monotone association from concordant/discordant day pairs, the
    // correlation that (like q81's slope) ignores how FAR an outlier
    // day moved, only which way. The day series zero-fills from a
    // generated calendar spine, so a day with clicks and no purchases
    // counts as (a, 0) in both engines instead of silently vanishing
    // from the join. tau-a = (C − D) / (n choose 2) — an exact
    // rational; C, D, and the tie count are plain integers. Scale:
    // volume crosses ONE keyed day count; the pair panel is
    // (span choose 2) rows on the broadcast day spine — bounded by
    // the calendar, never by event volume.
    QueryDef(
      "q84_kendall_corr",
      Some("""WITH b AS (SELECT min(cast(ts AS DATE)) AS lo,
             |    max(cast(ts AS DATE)) AS hi FROM events),
             |spine AS (SELECT cast(unnest(generate_series(lo, hi,
             |    INTERVAL 1 DAY)) as date) AS day FROM b),
             |c AS (SELECT cast(ts AS DATE) AS day,
             |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |      AS a,
             |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS bb
             |  FROM events GROUP BY 1),
             |x AS (SELECT day, coalesce(a, 0) AS a, coalesce(bb, 0) AS b
             |  FROM spine LEFT JOIN c USING (day)),
             |p AS (SELECT (u.a - v.a) * (u.b - v.b) AS prod
             |  FROM x u JOIN x v ON u.day < v.day),
             |g AS (SELECT count(*) AS n_pairs,
             |    coalesce(sum(CASE WHEN prod > 0 THEN 1 ELSE 0 END), 0)
             |      AS concordant,
             |    coalesce(sum(CASE WHEN prod < 0 THEN 1 ELSE 0 END), 0)
             |      AS discordant,
             |    coalesce(sum(CASE WHEN prod = 0 THEN 1 ELSE 0 END), 0)
             |      AS tied
             |  FROM p),
             |nd AS (SELECT count(*) AS n_days FROM x)
             |SELECT cast(n_days as bigint) AS n_days,
             |  cast(n_pairs as bigint) AS n_pairs,
             |  cast(concordant as bigint) AS concordant,
             |  cast(discordant as bigint) AS discordant,
             |  cast(tied as bigint) AS tied,
             |  cast(concordant - discordant as bigint) AS s_stat,
             |  cast(CASE WHEN n_pairs = 0 THEN 0
             |    ELSE (concordant - discordant) * 1000000 // n_pairs END
             |    as bigint) AS tau_a_fx
             |FROM nd, g""".stripMargin),
      (s, d) => {
        val ev = t(s, d, "events")
        val b = ev.agg(min(to_date(col("ts"))).as("lo"),
          max(to_date(col("ts"))).as("hi"))
        // empty input: sequence(NULL, NULL) is NULL and explode drops
        // it, so the spine is empty in both engines, not a crash
        val spine = b.select(
          explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
        val c = ev.groupBy(to_date(col("ts")).as("day"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("a"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("b"))
        val x = spine.join(c, Seq("day"), "left")
          .select(col("day"), coalesce(col("a"), lit(0L)).as("a"),
            coalesce(col("b"), lit(0L)).as("b"))
        val xu = x.select(col("day").as("du"), col("a").as("au"),
          col("b").as("bu"))
        val xv = x.select(col("day").as("dv"), col("a").as("av"),
          col("b").as("bv"))
        // day-grain pair panel: both sides bounded by the calendar
        // span, so the broadcast nested-loop is a fixed small cost
        val p = xu.join(broadcast(xv), col("du") < col("dv"))
          .select(expr("(au - av) * (bu - bv)").as("prod"))
        val g = p.agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(when(col("prod") > 0, 1L).otherwise(0L)), lit(0L))
            .as("concordant"),
          coalesce(sum(when(col("prod") < 0, 1L).otherwise(0L)), lit(0L))
            .as("discordant"),
          coalesce(sum(when(col("prod") === 0, 1L).otherwise(0L)), lit(0L))
            .as("tied"))
        val nd = x.agg(count(lit(1)).as("n_days"))
        nd.crossJoin(broadcast(g))
          .select(col("n_days").cast("long").as("n_days"),
            col("n_pairs").cast("long").as("n_pairs"),
            col("concordant").cast("long").as("concordant"),
            col("discordant").cast("long").as("discordant"),
            col("tied").cast("long").as("tied"),
            (col("concordant") - col("discordant")).cast("long")
              .as("s_stat"),
            expr("cast(CASE WHEN n_pairs = 0 THEN 0" +
              " ELSE (concordant - discordant) * 1000000L div n_pairs" +
              " END as bigint)").as("tau_a_fx"))
      }),

    // q85: LAG-1 AUTOCORRELATION of daily event volume — the serial-
    // dependence smell test ("is yesterday's traffic informative about
    // today's?") behind sampling and forecasting decisions. Exactness:
    // multiply the Pearson form through by n² so the centered terms
    // are INTEGERS (cy_t = n·y_t − Σy), then r₁ = Σ(cy_t·cy_{t+1}) /
    // Σ(cy_t²) is one exact rational → one fixed-point division (the
    // q80 single-rational discipline; no float mean to drift). The
    // series zero-fills from the calendar spine like q84, so gaps are
    // real zeros. Scale: one keyed day count; the window and aggregate
    // run at day grain.
    QueryDef(
      "q85_autocorr_lag1",
      Some("""WITH b AS (SELECT min(cast(ts AS DATE)) AS lo,
             |    max(cast(ts AS DATE)) AS hi FROM events),
             |spine AS (SELECT cast(unnest(generate_series(lo, hi,
             |    INTERVAL 1 DAY)) as date) AS day FROM b),
             |c AS (SELECT cast(ts AS DATE) AS day, count(*) AS y
             |  FROM events GROUP BY 1),
             |x AS (SELECT day, coalesce(y, 0) AS y
             |  FROM spine LEFT JOIN c USING (day)),
             |st AS (SELECT count(*) AS n, coalesce(sum(y), 0) AS s
             |  FROM x),
             |z AS (SELECT cast(n as HUGEINT) * y - s AS cy,
             |    lead(cast(n as HUGEINT) * y - s) OVER (ORDER BY day)
             |      AS cy1
             |  FROM x, st),
             |a AS (SELECT coalesce(sum(cy * cy), 0) AS den,
             |    coalesce(sum(cy * cy1), 0) AS num
             |  FROM z)
             |SELECT cast(n as bigint) AS n_days,
             |  cast(s as bigint) AS total_events,
             |  cast(CASE WHEN den = 0 THEN 0
             |    ELSE num * 1000000 // den END as bigint) AS r1_fx
             |FROM st, a""".stripMargin),
      (s, d) => {
        val ev = t(s, d, "events")
        val b = ev.agg(min(to_date(col("ts"))).as("lo"),
          max(to_date(col("ts"))).as("hi"))
        val spine = b.select(
          explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
        val c = ev.groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("y"))
        val x = spine.join(c, Seq("day"), "left")
          .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
        val st = x.agg(count(lit(1)).as("n"),
          coalesce(sum(col("y")), lit(0L)).as("s"))
        // day-grain window (tiny): the lead pairs adjacent calendar
        // days; the NULL tail product drops from the sum identically
        // in both engines
        val wd = Window.orderBy(col("day"))
        val z = x.crossJoin(broadcast(st))
          .withColumn("cy", expr("cast(n as decimal(38,0)) * y - s"))
          .withColumn("cy1", lead(col("cy"), 1).over(wd))
        val a = z.agg(
          coalesce(sum(expr("cy * cy")), lit(0L).cast("decimal(38,0)"))
            .as("den"),
          coalesce(sum(expr("cy * cy1")), lit(0L).cast("decimal(38,0)"))
            .as("num"))
        st.crossJoin(broadcast(a))
          .select(col("n").cast("long").as("n_days"),
            col("s").cast("long").as("total_events"),
            expr("cast(CASE WHEN den = 0 THEN 0" +
              " ELSE num * 1000000 div den END as bigint)").as("r1_fx"))
      }),

    // q86: SPEARMAN rank correlation between click and purchase daily
    // volumes — completes the rank-statistics trio next to q82 (rank
    // sums) and q84 (concordance): Spearman is Pearson over the RANK
    // series, robust to any monotone rescaling of the volumes.
    // Exactness: ranks are the q82 doubled-average-rank integers
    // (2·rank() + tie_count − 1), centering multiplies through by n
    // (the q85 trick) so cx/cy are integers, and the report is the
    // SIGNED SQUARE sign(Sxy)·Sxy²/(Sxx·Syy) — one exact rational, no
    // square root to drift (the q80 z² convention). The sign is
    // applied OUTSIDE the truncated division so both engines divide
    // positives only (no floor-vs-trunc trap). Headroom: the single
    // rational holds to n = 1000 days (Sxy² ≤ 16n¹⁰); past that both
    // dialects stage by SHIFTING the moments by n³ first (round 16 —
    // see the staged-branch note at the Spark select): good to ~3e7
    // days with sub-fx staging error for non-degenerate series. Scale:
    // one keyed day count; ranks/windows at day grain.
    QueryDef(
      "q86_spearman_corr",
      Some(s"""WITH b AS (SELECT min(cast(ts AS DATE)) AS lo,
             |    max(cast(ts AS DATE)) AS hi FROM events),
             |spine AS (SELECT cast(unnest(generate_series(lo, hi,
             |    INTERVAL 1 DAY)) as date) AS day FROM b),
             |c AS (SELECT cast(ts AS DATE) AS day,
             |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |      AS a,
             |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS bb
             |  FROM events GROUP BY 1),
             |x AS (SELECT day, coalesce(a, 0) AS a, coalesce(bb, 0) AS b
             |  FROM spine LEFT JOIN c USING (day)),
             |r AS (SELECT
             |    2 * rank() OVER (ORDER BY a)
             |      + count(*) OVER (PARTITION BY a) - 1 AS ra,
             |    2 * rank() OVER (ORDER BY b)
             |      + count(*) OVER (PARTITION BY b) - 1 AS rb
             |  FROM x),
             |st AS (SELECT count(*) AS n, coalesce(sum(ra), 0) AS sa,
             |    coalesce(sum(rb), 0) AS sb FROM r),
             |z AS (SELECT cast(n as HUGEINT) * ra - sa AS cx,
             |    cast(n as HUGEINT) * rb - sb AS cy
             |  FROM r, st),
             |a2 AS (SELECT coalesce(sum(cx * cy), 0) AS sxy,
             |    coalesce(sum(cx * cx), 0) AS sxx,
             |    coalesce(sum(cy * cy), 0) AS syy
             |  FROM z),
             |q AS (SELECT n, sxy, sxx, syy,
             |    abs(sxy) // (cast(n as HUGEINT) * n * n) AS sxyq,
             |    sxx // (cast(n as HUGEINT) * n * n) AS sxxq,
             |    syy // (cast(n as HUGEINT) * n * n) AS syyq
             |  FROM st, a2)
             |SELECT cast(n as bigint) AS n_days,
             |  cast(CASE WHEN sxy > 0 THEN 1 WHEN sxy < 0 THEN -1
             |    ELSE 0 END as bigint) AS rho_sign,
             |  cast(CASE WHEN sxx = 0 OR syy = 0 THEN 0
             |    WHEN n <= $Q86StageDays
             |    THEN (CASE WHEN sxy >= 0 THEN 1 ELSE -1 END)
             |      * (sxy * sxy * 1000000 // (sxx * syy))
             |    WHEN sxxq = 0 OR syyq = 0 THEN 0
             |    ELSE (CASE WHEN sxy >= 0 THEN 1 ELSE -1 END)
             |      * (cast(sxyq as HUGEINT) * sxyq * 1000000
             |        // (cast(sxxq as HUGEINT) * syyq))
             |    END as bigint) AS rho2_fx
             |FROM q""".stripMargin),
      (s, d) => {
        val ev = t(s, d, "events")
        val b = ev.agg(min(to_date(col("ts"))).as("lo"),
          max(to_date(col("ts"))).as("hi"))
        val spine = b.select(
          explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
        val c = ev.groupBy(to_date(col("ts")).as("day"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("a"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("b"))
        val x = spine.join(c, Seq("day"), "left")
          .select(col("day"), coalesce(col("a"), lit(0L)).as("a"),
            coalesce(col("b"), lit(0L)).as("b"))
        // doubled average ranks at day grain (tiny global windows —
        // the q84/q85 calendar-bounded discipline)
        val r = x.select(
          expr("2 * rank() OVER (ORDER BY a)" +
            " + count(*) OVER (PARTITION BY a) - 1").as("ra"),
          expr("2 * rank() OVER (ORDER BY b)" +
            " + count(*) OVER (PARTITION BY b) - 1").as("rb"))
        val st = r.agg(count(lit(1)).as("n"),
          coalesce(sum(col("ra")), lit(0L)).as("sa"),
          coalesce(sum(col("rb")), lit(0L)).as("sb"))
        val z = r.crossJoin(broadcast(st))
          .select(expr("cast(n as decimal(38,0)) * ra - sa").as("cx"),
            expr("cast(n as decimal(38,0)) * rb - sb").as("cy"))
        val a2 = z.agg(
          coalesce(sum(expr("cx * cy")), lit(0L).cast("decimal(38,0)"))
            .as("sxy"),
          coalesce(sum(expr("cx * cx")), lit(0L).cast("decimal(38,0)"))
            .as("sxx"),
          coalesce(sum(expr("cy * cy")), lit(0L).cast("decimal(38,0)"))
            .as("syy"))
        // Staged branch restaged in round 16 (r15 advice: the old
        // (sxy² div sxx)·1e6 div syy staged form still materialized
        // sxy² — decimal/HUGEINT overflow near n ≈ 4800 days — and
        // Spark's Long-typed IntegralDivide quotient diverged from
        // DuckDB's HUGEINT // before that). New form: shift all three
        // moments by n³ FIRST (sxyq = |sxy| div n³ ≤ 4n², Long-safe to
        // n ≈ 1.5e9), then one rational sxyq²·1e6 div (sxxq·syyq) —
        // every intermediate ≤ 1.6e7·n⁴, so the binding bound is the
        // sxx/syy aggregates themselves (4n⁵ ≤ 1e38 → n ≈ 3e7 days,
        // 82,000 years). Staging error ≲ (2n³/|sxy| + n³/sxx +
        // n³/syy)·1e6 fx — sub-fx for any non-degenerate series past
        // the 1000-day crossover (sxx,syy ~ n⁵ there); a pathological
        // near-constant series with sxx < n³ reports 0 (sxxq = 0), in
        // BOTH engines, rather than either engine throwing. Both
        // dialects stage identically, so the gate hash cannot split.
        // Spec: RoundSixteenOpsSpec.
        st.crossJoin(broadcast(a2))
          .withColumn("sxyq",
            expr("abs(sxy) div (cast(n as decimal(38,0)) * n * n)"))
          .withColumn("sxxq",
            expr("sxx div (cast(n as decimal(38,0)) * n * n)"))
          .withColumn("syyq",
            expr("syy div (cast(n as decimal(38,0)) * n * n)"))
          .select(col("n").cast("long").as("n_days"),
            expr("cast(CASE WHEN sxy > 0 THEN 1 WHEN sxy < 0 THEN -1" +
              " ELSE 0 END as bigint)").as("rho_sign"),
            expr("cast(CASE WHEN sxx = 0 OR syy = 0 THEN 0" +
              s" WHEN n <= $Q86StageDays" +
              " THEN (CASE WHEN sxy >= 0 THEN 1 ELSE -1 END)" +
              " * (sxy * sxy * 1000000 div (sxx * syy))" +
              " WHEN sxxq = 0 OR syyq = 0 THEN 0" +
              " ELSE (CASE WHEN sxy >= 0 THEN 1 ELSE -1 END)" +
              " * (cast(sxyq as decimal(38,0)) * sxyq * 1000000" +
              " div (cast(sxxq as decimal(38,0)) * syyq))" +
              " END as bigint)").as("rho2_fx"))
      }),

    // q87: WALD-WOLFOWITZ runs test on daily event volume — is the
    // above/below-median sign sequence random, or does traffic come in
    // streaks? The categorical companion to q85's autocorrelation (q85
    // measures LINEAR serial dependence; the runs test catches any
    // sign-pattern clustering). Exactness: the median is the LOWER
    // median by rank (the q36 idiom — an actual data value, no
    // interpolation), days equal to the median drop (the classical
    // convention, deterministic in both engines), runs count sign
    // changes + 1, and z² = (R·m − 2·n₁n₂ − m)²·(m−1) /
    // (2n₁n₂·(2n₁n₂ − m)) is ONE exact rational (μ and σ² of the run
    // count under the null, multiplied through) — good to ~1e6 days
    // in 38 digits. Scale: day grain throughout.
    QueryDef(
      "q87_runs_test",
      Some("""WITH b AS (SELECT min(cast(ts AS DATE)) AS lo,
             |    max(cast(ts AS DATE)) AS hi FROM events),
             |spine AS (SELECT cast(unnest(generate_series(lo, hi,
             |    INTERVAL 1 DAY)) as date) AS day FROM b),
             |c AS (SELECT cast(ts AS DATE) AS day, count(*) AS y
             |  FROM events GROUP BY 1),
             |x AS (SELECT day, coalesce(y, 0) AS y
             |  FROM spine LEFT JOIN c USING (day)),
             |st AS (SELECT count(*) AS n FROM x),
             |rk AS (SELECT y, row_number() OVER (ORDER BY y, day) AS rn
             |  FROM x),
             |med AS (SELECT coalesce(max(CASE WHEN rn =
             |    (SELECT (n + 1) // 2 FROM st) THEN y END), 0) AS med
             |  FROM rk),
             |s AS (SELECT day, CASE WHEN y > med THEN 1 ELSE 0 END
             |    AS sgn
             |  FROM x, med WHERE y <> med),
             |r AS (SELECT sgn, lag(sgn) OVER (ORDER BY day) AS prev
             |  FROM s),
             |g AS (SELECT count(*) AS m,
             |    coalesce(sum(sgn), 0) AS n_above,
             |    coalesce(sum(CASE WHEN prev IS NOT NULL AND sgn <> prev
             |      THEN 1 ELSE 0 END), 0) AS changes
             |  FROM r),
             |z AS (SELECT m, n_above, m - n_above AS n_below,
             |    CASE WHEN m > 0 THEN changes + 1 ELSE 0 END AS runs,
             |    cast(CASE WHEN m > 0 THEN changes + 1 ELSE 0 END
             |        as HUGEINT) * m
             |      - 2 * cast(n_above as HUGEINT) * (m - n_above) - m
             |      AS dd,
             |    2 * cast(n_above as HUGEINT) * (m - n_above)
             |      * (2 * cast(n_above as HUGEINT) * (m - n_above) - m)
             |      AS den
             |  FROM g)
             |SELECT cast(n as bigint) AS n_days,
             |  cast(med as bigint) AS median_volume,
             |  cast(n_above as bigint) AS n_above,
             |  cast(n_below as bigint) AS n_below,
             |  cast(runs as bigint) AS n_runs,
             |  cast(CASE WHEN den = 0 THEN 0
             |    ELSE dd * dd * (m - 1) * 1000000 // den END
             |    as bigint) AS z2_fx
             |FROM st, med, z""".stripMargin),
      (s, d) => {
        val ev = t(s, d, "events")
        val b = ev.agg(min(to_date(col("ts"))).as("lo"),
          max(to_date(col("ts"))).as("hi"))
        val spine = b.select(
          explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
        val c = ev.groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("y"))
        val x = spine.join(c, Seq("day"), "left")
          .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
        val st = x.agg(count(lit(1)).as("n"))
        val rk = x.select(col("y"),
          expr("row_number() OVER (ORDER BY y, day)").as("rn"))
        // lower median by rank: an actual value, empty-safe via the
        // always-one-row aggregate
        val med = rk.crossJoin(broadcast(st))
          .agg(coalesce(max(when(col("rn") === expr("(n + 1) div 2"),
            col("y"))), lit(0L)).as("med"))
        val sgn = x.crossJoin(broadcast(med))
          .filter(col("y") =!= col("med"))
          .select(col("day"),
            when(col("y") > col("med"), 1L).otherwise(0L).as("sgn"))
        val r = sgn.select(col("sgn"),
          expr("lag(sgn) OVER (ORDER BY day)").as("prev"))
        val g = r.agg(count(lit(1)).as("m"),
          coalesce(sum(col("sgn")), lit(0L)).as("n_above"),
          coalesce(sum(when(col("prev").isNotNull &&
            col("sgn") =!= col("prev"), 1L).otherwise(0L)), lit(0L))
            .as("changes"))
        val z = g.select(col("m"), col("n_above"),
          (col("m") - col("n_above")).as("n_below"),
          when(col("m") > 0, col("changes") + 1L).otherwise(0L)
            .as("runs"))
          .withColumn("dd", expr("cast(runs as decimal(38,0)) * m" +
            " - 2 * cast(n_above as decimal(38,0)) * n_below - m"))
          .withColumn("den",
            expr("2 * cast(n_above as decimal(38,0)) * n_below" +
              " * (2 * cast(n_above as decimal(38,0)) * n_below - m)"))
        st.crossJoin(broadcast(med)).crossJoin(broadcast(z))
          .select(col("n").cast("long").as("n_days"),
            col("med").cast("long").as("median_volume"),
            col("n_above").cast("long").as("n_above"),
            col("n_below").cast("long").as("n_below"),
            col("runs").cast("long").as("n_runs"),
            expr("cast(CASE WHEN den = 0 THEN 0" +
              " ELSE dd * dd * (m - 1) * 1000000 div den END" +
              " as bigint)").as("z2_fx"))
      })
  )
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16: the q80 and q86 staged-reduction headroom contracts
  * (closing the r15 verdict's "q80 is the last unstaged single
  * rational" and the r15 advice's q86 Long-typed-quotient divergence).
  *
  * q80: the exact z² numerator df²·(n0+n1)·1e6 grows ~6e4·n⁵ at full
  * separation (|df| = n0·n1) and overflows decimal(38,0)/HUGEINT near
  * n ≈ 4.4e6 users. Past n = 2,000,000 both dialects stage:
  * (df² div n0n1) — Long-safe to n ≈ 6e9, truncation error < 1 —
  * times (n0+n1)·1e6 div (c·(n−c)). The spec runs the query AT a
  * magnitude where the old single rational provably exceeds 38 digits
  * (BigInt-checked) and pins the result to an independent BigInt
  * recomputation of the staged form.
  *
  * q86: the OLD staged branch ((sxy² div sxx)·1e6 div syy) still
  * materialized sxy² — decimal/HUGEINT overflow at n ≈ 4800 fully
  * correlated days — and Spark's IntegralDivide typed the quotient
  * Long where DuckDB's HUGEINT // did not, a cross-engine divergence.
  * The round-16 form shifts all three moments by n³ FIRST, so every
  * intermediate is ≤ 1.6e7·n⁴. The spec runs the query at a
  * correlated-series magnitude where sxy² provably exceeds 38 digits
  * (so the old branch would throw in BOTH engines) and asserts the
  * shifted form returns the exact ρ² = +1e6 fx.
  */
class RoundSixteenOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q80 staged z² is correct at a magnitude where the single " +
    "rational overflows decimal(38,0)") {
    val n0 = 2400000L // even user ids: no purchases (control)
    val n1 = 2400000L // odd user ids: one purchase each (treatment)
    val n = n0 + n1   // 4.8e6 > the 2,000,000 staging threshold
    val baseUs = 1704067200000000L
    val ev = spark.range(n).select(
      col("id").as("event_id"),
      expr(s"timestamp_micros(${baseUs}L + id)").as("ts"),
      col("id").as("user_id"),
      expr("CASE WHEN id % 2 = 1 THEN 'purchase' ELSE 'view' END")
        .as("event_type"),
      lit(1.0).as("value"),
      lit("{}").as("props"))
    val dir = TempDirs.create("graft-q80-staged")
    TestIo.writeSingleFile(ev, dir, "events")

    // independent BigInt recomputation: full separation, c0 = 0
    val (bn0, bn1) = (BigInt(n0), BigInt(n1))
    val bn = bn0 + bn1
    val df = bn1 * bn0 // c1·n0 − c0·n1 with c1 = n1, c0 = 0
    val c = bn1
    val oldNumerator = df * df * bn * 1000000
    assert(oldNumerator > BigInt(10).pow(38),
      s"fixture must exceed the 38-digit ceiling, got $oldNumerator")
    val staged = (df * df / (bn0 * bn1)) * bn * 1000000 / (c * (bn - c))
    val exact = oldNumerator / (bn0 * bn1 * c * (bn - c))
    // staging error bound: n·1e6/(c·(n−c)) fx
    assert((staged - exact).abs <= bn * 1000000 / (c * (bn - c)) + 1,
      "staged z2 must stay within the documented error bound")

    val r = SparkEntry.queries("q80_holdout_lift")(spark, dir).head()
    assert(r.getLong(0) === n0, "n_control")
    assert(r.getLong(1) === 0L, "conv_control")
    assert(r.getLong(2) === n1, "n_treatment")
    assert(r.getLong(3) === n1, "conv_treatment")
    assert(r.getLong(6) === 1000000L, "lift_fx at full separation")
    assert(BigInt(r.getLong(7)) === staged,
      "z2_fx matches the BigInt staged reduction")
  }

  test("q86 shifted staged ρ² is exact at a magnitude where the old " +
    "staged form overflows decimal(38,0)") {
    // 9000 days, two volume blocks (identical click and purchase
    // series → ρ = 1 exactly): days 0..4499 get 1 click + 1 purchase,
    // days 4500..8999 get 2 + 2. With k = n/2 the centered ranks are
    // ±k·(n+1)/... — sxx = sxy = syy ≈ n⁵/4, so sxy² ≈ n¹⁰/16 ≈
    // 2.2e38 > the 38-digit ceiling: the OLD staged branch (which
    // multiplied sxy·sxy) would throw in both engines here.
    val nDays = 9000L
    val k = nDays / 2
    val baseUs = 1704067200000000L
    val dayUs = 86400000000L
    val ev = spark.range(nDays * 2).select(
      (col("id")).as("event_id"),
      expr(s"timestamp_micros(${baseUs}L + (id % ${nDays}L) * ${dayUs}L)")
        .as("ts"),
      col("id").as("user_id"),
      expr("CASE WHEN id < " + nDays + "L THEN 'click' ELSE 'purchase' END")
        .as("event_type"),
      lit(1.0).as("value"),
      lit("{}").as("props"))
    // second copy of each event for the high-volume block only
    val extra = spark.range(nDays * 2)
      .filter(col("id") % nDays >= k)
      .select((col("id") + 10000000L).as("event_id"),
        expr(s"timestamp_micros(${baseUs}L + (id % ${nDays}L) * ${dayUs}L)")
          .as("ts"),
        col("id").as("user_id"),
        expr("CASE WHEN id < " + nDays + "L THEN 'click' ELSE 'purchase' END")
          .as("event_type"),
        lit(1.0).as("value"),
        lit("{}").as("props"))
    val dir = TempDirs.create("graft-q86-staged")
    TestIo.writeSingleFile(ev.unionAll(extra), dir, "events")

    // BigInt recount of the moment magnitudes: two tie blocks of size
    // k = n/2, centered doubled ranks come out to ±k·n (low block
    // ra = k+1, high block ra = k+n+1, sa = k(k+1) + k(k+n+1), so
    // |cx| = |n·ra − sa| = k·n for every day) → sxy = sxx = syy =
    // 2k·(kn)² = 2k³n².
    val (bn, bk) = (BigInt(nDays), BigInt(k))
    val cx = bk * bn
    val sxy = (bk * cx * cx) * 2
    assert(sxy * sxy > BigInt(10).pow(38),
      s"fixture must overflow the OLD staged form's sxy², got ${sxy * sxy}")
    // shifted form: sxyq = sxxq = syyq → ρ² is exactly 1e6 fx
    val shf = bn * bn * bn
    val q = sxy / shf
    assert(q > 0, "shifted moments must stay nonzero")
    assert(q * q * 1000000 / (q * q) === BigInt(1000000))

    val r = SparkEntry.queries("q86_spearman_corr")(spark, dir).head()
    assert(r.getLong(0) === nDays, "n_days")
    assert(r.getLong(1) === 1L, "rho_sign")
    assert(r.getLong(2) === 1000000L,
      "rho2_fx must be exactly +1e6 for identical series")
  }

  test("q80 and q86 gate-scale results are on the exact branch " +
    "(staging thresholds not reached at any test SF)") {
    // the staging CASE arms must be dead at oracle-gate scale: the
    // gate corpus has far fewer than 2e6 users and 1000 days, so the
    // round-16 staging cannot move a gate hash
    val ev = Catalog.t(spark, "/root/testdata/sf0.001", "events")
    val nUsers = ev.filter(col("user_id").isNotNull)
      .select(col("user_id")).distinct().count()
    assert(nUsers < 2000000L, s"gate users $nUsers must sit below the " +
      "q80 staging threshold")
    val days = ev.agg(expr("datediff(max(ts), min(ts))")).head().getInt(0)
    assert(days < 1000, s"gate span $days days must sit below the q86 " +
      "staging threshold")
  }
}

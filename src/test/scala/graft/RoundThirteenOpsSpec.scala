package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 laws: the st28 band-occupancy monitor's tier-raise signal
  * agrees with the adaptive ladder (the r12 verdict's "nothing consumes
  * the monitor" drill), and the raised 22×18 ladder cap keeps the
  * prefix identity and recall arithmetic of the 16×16 family it
  * replaced.
  */
class RoundThirteenOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import graft.llm.Similarity

  // st28's monitor family: a fixed 4×12 prefix of the maximal adaptive
  // plane family — the constants mirrored from StreamingQueries
  // (MonBands/MonBits); the spec uses the shared bandKeyStructs
  // definition, so a drift between the two surfaces here too.
  private val MonBands = 4
  private val MonBits = 12

  // The monitor→tier occupancy estimate: a 12-bit monitor bucket is
  // the union of 2^(rb−12) buckets of a finer tier (and a coarser
  // tier's bucket is the union of 2^(12−rb) monitor buckets), so the
  // expected tier-rb occupancy from a monitor carrying n vectors over
  // the full 4096-bucket key space is n/4096 scaled by that factor —
  // algebraically n / 2^rb in both directions.
  private def tierOccupancyEstimate(nVecs: Long, rb: Int): Double =
    nVecs.toDouble / (1L << rb)

  test("st28 drill: the monitor's shifted occupancy estimate crosses " +
    "the raise threshold exactly at every ladder boundary") {
    // Every AdLadder tier satisfies maxN = 2^(rowBits+2): the ladder's
    // design occupancy is 4 vectors per bucket. So the monitor-derived
    // estimate crosses 4.0 EXACTLY when adaptiveFamily abandons the
    // tier — the documented "raise the ladder tier" signal is the
    // ladder's own decision rule, read from stream state instead of a
    // batch count.
    val ladder = Similarity.AdLadder
    ladder.zipWithIndex.foreach { case ((maxN, rb, _), i) =>
      assert(maxN == (1L << (rb + 2)),
        s"tier $rb: maxN $maxN is not 2^(rb+2) — occupancy law broken")
      assert(tierOccupancyEstimate(maxN, rb) <= 4.0)
      assert(tierOccupancyEstimate(maxN + 1, rb) > 4.0)
      // and the ladder agrees on both sides of the boundary
      assert(Similarity.adaptiveFamily(maxN)._2 == rb)
      val nextRb =
        if (i + 1 < ladder.size) ladder(i + 1)._2 else Similarity.AdMaxBits
      assert(Similarity.adaptiveFamily(maxN + 1)._2 == nextRb,
        s"above tier-$rb boundary the ladder should pick $nextRb bits")
    }
  }

  test("st28 drill: a real monitor reading reproduces the ladder's " +
    "tier decision across a boundary") {
    // corpora straddling the tier-10 boundary (maxN 4096): the monitor
    // aggregation (st28's batch shape, same bandKeyStructs prefix
    // family) must conserve the corpus per band, spread occupancy
    // across buckets (decorrelated planes), and — read through the
    // shifted estimate — pick exactly the tier adaptiveFamily picks.
    graft.functions.GraftFunctions.register(spark)
    Seq(4096L -> 10, 4097L -> 11).foreach { case (n, expectRb) =>
      val vecs = spark.range(n).toDF("vec_id")
        .withColumn("embedding", expr(
          "transform(sequence(0L, 63L), i -> " +
            "cast(pmod(hash(vec_id, i), 1000) - 500 as float) / 500.0F)"))
      val structs = Similarity.bandKeyStructs(MonBands, MonBits,
        Similarity.AdMaxBits)
      val perBand = vecs
        .select(explode(expr(s"array($structs)")).as("bb"))
        .select(col("bb.band").as("band"), col("bb.bk").as("bk"))
        .groupBy("band", "bk").agg(count(lit(1)).as("n"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_buckets_used"),
          max(col("n")).as("max_occupancy"),
          sum(col("n")).as("n_vecs"))
        .collect()
      assert(perBand.length == MonBands)
      perBand.foreach { r =>
        // corpus conservation: the estimator's numerator is exact
        assert(r.getAs[Long]("n_vecs") == n)
        // occupancy actually spreads — a re-correlated plane family
        // would collapse mass into few buckets and blow this bound
        // (mean occupancy at n=4096 over 4096 buckets is 1; the
        // deterministic observed max under the splitmix64 family is
        // single-digit)
        assert(r.getAs[Long]("max_occupancy") <= 24,
          s"band ${r.getAs[Int]("band")}: hot bucket " +
            s"${r.getAs[Long]("max_occupancy")} — planes re-correlated?")
      }
      // the monitor-derived tier decision: smallest rowBits whose
      // shifted occupancy estimate meets the design target of 4
      val nVecs = perBand.head.getAs[Long]("n_vecs")
      val rbFromMonitor = (Similarity.AdLadder.head._2 to
        Similarity.AdMaxBits)
        .find(rb => tierOccupancyEstimate(nVecs, rb) <= 4.0).get
      assert(rbFromMonitor == expectRb)
      assert(Similarity.adaptiveFamily(n)._2 == expectRb,
        s"monitor picked $rbFromMonitor bits but the ladder disagrees")
    }
  }

  test("raised ladder cap: new tiers keep the prefix identity the " +
    "static oracle SQL depends on") {
    import spark.implicits._
    // a corpus small enough to collect but forced onto a NEW tier
    // (17 bits × 19 bands — past the old 16×16 cap) by building the
    // candidate plan at an asserted family; the prefix identity must
    // hold at the raised widths exactly as it did below the old cap
    val n = 400
    val vecs = spark.range(n).toDF("vec_id")
      .withColumn("embedding", expr(
        "transform(sequence(0L, 63L), i -> " +
          "cast(pmod(hash(vec_id, i), 1000) - 500 as float) / 500.0F)"))
    Seq((19, 17), (Similarity.AdMaxBands, Similarity.AdMaxBits))
      .foreach { case (bands, rowBits) =>
        val prefix = Similarity.lshCandidatePairs(vecs, bands, rowBits,
          Similarity.AdMaxBits).as[(Long, Long)].collect().toSet
        val full = Similarity.lshCandidatePairsMaskedForTest(vecs, bands,
          rowBits).as[(Long, Long)].collect().toSet
        assert(prefix == full, s"prefix identity broken at ${bands}x$rowBits")
      }
  }

  // ------------------------------------------ round-13 operator laws

  private val sf = "/root/testdata/sf0.001"

  test("q75 cusum: the drawdown identity reproduces the textbook " +
    "recursion exactly, on real data") {
    // the query computes C_t = P_t − min(0, min P_j) with windows; the
    // law re-runs the sequential recursion C_t = max(0, C_{t-1} + d_t)
    // driver-side on the same daily series and demands equality — the
    // identity that makes CUSUM distributable is pinned, not assumed
    val rows = SparkEntry.queries("q75_cusum_drift")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, g) =>
      val days = g.sortBy(_.getAs[java.sql.Date]("day").toString)
      val xs = days.map(_.getAs[Long]("n_events"))
      val nDays = xs.length.toLong
      val total = xs.sum
      var up = 0L; var down = 0L
      days.zip(xs).foreach { case (r, x) =>
        val dev = nDays * x - total
        up = math.max(0L, up + dev)
        down = math.max(0L, down - dev)
        assert(r.getAs[Long]("cusum_up") == up,
          s"cusum_up mismatch on ${r.getAs[java.sql.Date]("day")}")
        assert(r.getAs[Long]("cusum_down") == down)
      }
      // a centered series ends where it started: both stats return to
      // bounded values and the final prefix sum is zero by construction
      assert(days.map(r => nDays * r.getAs[Long]("n_events") - total)
        .sum == 0L)
    }
  }

  test("j07 interval coalesce: a driver-side sweep line agrees on " +
    "every user") {
    val out = SparkEntry.queries("j07_interval_coalesce")(spark, sf)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_intervals"), r.getAs[Long]("n_islands"),
          r.getAs[Long]("covered_ms"))).toMap
    val ev = graft.Catalog.t(spark, sf, "events")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("s"),
        expr("unix_millis(ts) + greatest(cast(floor(value * 1000) as" +
          " bigint), 0L)").as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ev.nonEmpty)
    ev.groupBy(_._1).foreach { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      var islands = 0L; var covered = 0L
      var curStart = 0L; var curEnd = Long.MinValue
      sorted.foreach { case (_, _, s0, e0) =>
        if (islands == 0L || s0 > curEnd) {
          if (islands > 0L) covered += curEnd - curStart
          islands += 1; curStart = s0; curEnd = e0
        } else curEnd = math.max(curEnd, e0)
      }
      covered += curEnd - curStart
      assert(out(uid) == ((sorted.length.toLong, islands, covered)),
        s"user $uid: got ${out(uid)}, swept " +
          s"(${sorted.length}, $islands, $covered)")
    }
  }

  test("q74 rolling distinct: 7-day actives dominate 1-day actives " +
    "and match a driver-side recount") {
    val out = SparkEntry.queries("q74_rolling_distinct")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val du = graft.Catalog.t(spark, sf, "events")
      .filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    out.foreach { r =>
      val wd = r.getAs[java.sql.Date]("wday").toLocalDate
      val d1 = r.getAs[Long]("n_active_1d")
      val d7 = r.getAs[Long]("n_active_7d")
      assert(d7 >= d1)
      val expect7 = du.filter { case (day, _) =>
        !day.isAfter(wd) && !day.isBefore(wd.minusDays(6)) }
        .map(_._2).distinct.length.toLong
      assert(d7 == expect7, s"$wd: 7d $d7 vs recount $expect7")
    }
  }

  test("p28 pack sweep: per-budget bookkeeping is exact (waste < " +
    "budget per shard, totals invariant)") {
    val rows = SparkEntry.queries("p28_pack_budget_sweep")(spark, sf)
      .collect()
    assert(rows.length == 4)
    val totals = rows.map(_.getAs[Long]("total_tokens")).distinct
    assert(totals.length == 1) // the corpus does not vary with budget
    rows.foreach { r =>
      val b = r.getAs[Long]("budget"); val sh = r.getAs[Long]("n_shards")
      val bins = r.getAs[Long]("n_bins")
      val waste = r.getAs[Long]("waste_tokens")
      assert(waste >= 0 && waste < b * sh,
        s"budget $b: waste $waste outside [0, ${b * sh})")
      assert(bins * b - r.getAs[Long]("total_tokens") == waste)
      val eff = r.getAs[Long]("efficiency_fx")
      assert(eff > 0 && eff <= 1000000L)
    }
    // bigger budgets can only reduce bin count
    val byBudget = rows.sortBy(_.getAs[Long]("budget"))
    byBudget.zip(byBudget.tail).foreach { case (a, b) =>
      assert(a.getAs[Long]("n_bins") >= b.getAs[Long]("n_bins"))
    }
  }

  test("g15 multiSourceBfs: planted path graph yields exact per-probe " +
    "distances; probe panel is capped") {
    import spark.implicits._
    // path 0-1-2-3-4-5 plus isolated 9: distances are exact
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val seeds = Seq((0L, 0L), (3L, 3L)).toDF("probe", "id")
    val dist = graft.llm.GraphAlgs.multiSourceBfs(edges, seeds, 3)
      .as[(Long, Long, Int)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // probe 0 reaches 1,2,3 within depth 3; probe 3 reaches everything
    // but 0 needs 3 hops too
    assert(dist((0L, 0L)) == 0 && dist((0L, 1L)) == 1 &&
      dist((0L, 2L)) == 2 && dist((0L, 3L)) == 3)
    assert(!dist.contains((0L, 4L)))
    assert(dist((3L, 0L)) == 3 && dist((3L, 5L)) == 2 &&
      dist((3L, 1L)) == 2 && dist((3L, 4L)) == 1)
    // the gate panel law: never more than ProbeCap probes at any scale
    val probes = SparkEntry.queries("g15_harmonic_centrality")(spark, sf)
      .collect()
    assert(probes.length <= 8 && probes.nonEmpty)
    probes.foreach { r =>
      assert(r.getAs[Long]("harmonic_fx") <=
        r.getAs[Long]("n_reached") * 1000000L)
    }
  }

  test("st29 contamination gate: rates are consistent and the eval " +
    "side never appears") {
    val rows = SparkEntry.queries("st29_stream_contamination_gate")(
      spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val c = r.getAs[Long]("n_contaminated")
      assert(c >= 0 && c <= n)
      assert(r.getAs[Long]("contamination_fx") == c * 1000000L / n)
    }
    // arrivals cover exactly the non-eval documents
    val expected = graft.Catalog.t(spark, sf, "documents")
      .filter(col("doc_id") % 97 =!= 0).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == expected)
  }

  test("d30 cross-label audit: labels differ on every row and pair " +
    "counts are positive") {
    val rows = SparkEntry.queries("d30_cross_label_neardup")(spark, sf)
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("label_lo") < r.getAs[Long]("label_hi"))
      assert(r.getAs[Long]("n_pairs") > 0)
      assert(r.getAs[Double]("max_cosine") >= 0.4)
    }
  }

  test("q76 decayed engagement: integer shift weights match a " +
    "driver-side recount, and bounds hold") {
    val out = SparkEntry.queries("q76_decayed_engagement")(spark, sf)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("last_age_days"),
          r.getAs[Long]("decayed_fx"))).toMap
    val ev = graft.Catalog.t(spark, sf, "events")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val anchor = ev.map(_._2).maxBy(_.toEpochDay)
    ev.groupBy(_._1).foreach { case (uid, rows) =>
      val ages = rows.map(r => anchor.toEpochDay - r._2.toEpochDay)
      val expect = ages.map(a => 1000000L >> math.min(a / 7, 30L).toInt).sum
      assert(out(uid) == ((rows.length.toLong, ages.min, expect)),
        s"user $uid: got ${out(uid)}")
    }
    // a user active only today scores n_events * 1e6; nobody exceeds it
    out.values.foreach { case (n, _, fx) => assert(fx <= n * 1000000L) }
  }

  test("t46 source vocab drift: a driver-side exact TV recount over " +
    "the top-50 vocab agrees") {
    val out = SparkEntry.queries("t46_source_vocab_drift")(spark, sf)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_vocab_hits"), r.getAs[Long]("tv_fx"))).toMap
    val words = graft.Catalog.t(spark, sf, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val corpus = words.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val vocab = corpus.toSeq.sortBy { case (w, c) => (-c, w) }.take(50)
    val tt = vocab.map(_._2).sum
    val vset = vocab.map(_._1).toSet
    val hitting = words.filter(w => vset(w._2)).groupBy(_._1)
    hitting.foreach { case (src, ws) =>
      val o = ws.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val ss = o.values.sum
      val num = vocab.map { case (w, c) =>
        math.abs(o.getOrElse(w, 0L) * tt - c * ss) }.sum
      val tv = num * 1000000L / (2 * ss * tt)
      assert(out(src) == ((ss, tv)), s"$src: got ${out(src)}, " +
        s"recounted ($ss, $tv)")
      assert(tv >= 0 && tv <= 1000000L)
    }
    // EVERY source appears — one with zero top-50 hits reads as fully
    // drifted (TV = 1.0), never silently absent (round-13 review: the
    // inner join dropped exactly the most-diverged sources)
    val allSources = words.map(_._1).toSet
    assert(out.keySet == allSources)
    (allSources -- hitting.keySet).foreach { src =>
      assert(out(src) == ((0L, 1000000L)), s"zero-hit $src: ${out(src)}")
    }
  }

  test("adaptiveCandidatePairs two-arg overload: a supplied count picks " +
    "the same family as the counted path") {
    import spark.implicits._
    val n = 600L
    val vecs = spark.range(n).toDF("vec_id")
      .withColumn("embedding", expr(
        "transform(sequence(0L, 63L), i -> " +
          "cast(pmod(hash(vec_id, i), 1000) - 500 as float) / 500.0F)"))
    val counted = Similarity.adaptiveCandidatePairs(vecs)
      .as[(Long, Long)].collect().toSet
    val supplied = Similarity.adaptiveCandidatePairs(vecs, n)
      .as[(Long, Long)].collect().toSet
    assert(counted == supplied)
    assert(counted.nonEmpty)
  }
}

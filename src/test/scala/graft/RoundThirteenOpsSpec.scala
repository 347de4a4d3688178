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

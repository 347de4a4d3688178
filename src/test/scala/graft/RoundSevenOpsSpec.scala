package graft

import graft.llm.{Clustering, Pipeline, Similarity}
import graft.relational.ScaleOps

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 guard + correctness specs: enforced bounded-cardinality
  * contracts, the integral-input guard on the prefix sum, kmeans++ seed
  * exclusion under duplicate embeddings, and the hard-negative
  * per-partition pre-reduce.
  */
class RoundSevenOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dupSpanRanges extracts maximal cross-doc spans with word-exact " +
    "boundaries, and separated repeats stay separate islands") {
    val share = (1 to 10).map(i => s"s$i").mkString(" ")   // 10 shared words
    val share2 = (1 to 9).map(i => s"z$i").mkString(" ")   // 9 shared words
    val docs = Seq(
      (1L, s"a1 a2 a3 $share b1 b2 b3 b4 b5 b6 b7 $share2"),
      (2L, s"$share c1 c2"),
      (3L, s"$share2 d1")).toDF("doc_id", "text")
    // SpanWords = 8: a 10-word shared run yields 3 consecutive dup
    // windows; the 9-word run yields 2; the b-gap breaks the islands
    val got = graft.llm.Dedup.dupSpanRanges(docs)
      .as[(Long, Long, Long, Long)].collect().toSet
    val d1Share2Start = 3 + 10 + 7 // a-prefix + share + b-gap
    assert(got === Set(
      (1L, 3L, 12L, 3L),
      (1L, d1Share2Start.toLong, (d1Share2Start + 8).toLong, 2L),
      (2L, 0L, 9L, 3L),
      (3L, 0L, 8L, 2L)))
  }

  test("globalPrefixSum rejects non-integral value columns instead of " +
    "silently truncating") {
    val df = Seq((1L, 1.5), (2L, 2.5)).toDF("id", "w")
    val e = intercept[IllegalArgumentException] {
      ScaleOps.globalPrefixSum(df, Seq(col("id").asc), col("w"), "cum")
    }
    assert(e.getMessage.contains("integral"))
    // explicit cast = caller accepts the rounding; must work
    val ok = ScaleOps.globalPrefixSum(df, Seq(col("id").asc),
      col("w").cast("long"), "cum").select("id", "cum")
      .as[(Long, Long)].collect().toMap
    assert(ok === Map(1L -> 1L, 2L -> 3L))
  }

  test("globalPrefixSumWithTotal exposes the grand total without an " +
    "extra scan; broadcast offsets match the CASE-fold semantics") {
    val rows = (0 until 500).map(i => (i.toLong, 2L))
    val (df, total) = ScaleOps.globalPrefixSumWithTotal(rows.toDF("id", "v"),
      Seq(col("id").asc), col("v"), "cum", partitions = 8)
    assert(total === 1000L)
    val got = df.select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got === rows.map { case (id, _) => id -> (id + 1) * 2 }.toMap)
  }

  test("mixAllocation enforces the bounded-group contract with a clear " +
    "error above MaxMixGroups") {
    val wide = spark.range(Pipeline.MaxMixGroups + 1).toDF("g")
    val e = intercept[IllegalArgumentException] {
      Pipeline.mixAllocation(wide, col("g"), lit(1L), 1000L).collect()
    }
    assert(e.getMessage.contains("MaxMixGroups"))
    // within bounds: integer-exact largest-remainder split sums to budget
    val ok = Pipeline.mixAllocation(
      Seq(("a", 10L), ("b", 20L), ("c", 5L)).toDF("g", "t"),
      col("g"), col("t"), 100L)
    assert(ok.agg(sum("alloc")).as[Long].head() === 100L)
  }

  test("temperatureMix enforces the same bound") {
    val wide = spark.range(Pipeline.MaxMixGroups + 1).toDF("g")
    val e = intercept[IllegalArgumentException] {
      Pipeline.temperatureMix(wide, col("g"), lit(1L), 1000L).collect()
    }
    assert(e.getMessage.contains("MaxMixGroups"))
  }

  test("kmeansppSeed never re-selects a chosen seed under duplicate " +
    "embeddings (cos=1.0 ties)") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)), // exact duplicate of seed 1
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val seeds = Clustering.kmeansppSeed(vecs, 4)
      .orderBy("rank").as[(Int, Long)].collect()
    assert(seeds.map(_._2).distinct.length === 4, s"duplicate seeds: ${seeds.toSeq}")
    // seed 1 = min id; seed 2 = orthogonal vec 3; the duplicate (2) can
    // only appear once the candidate pool forces it
    assert(seeds(0)._2 === 1L)
    assert(seeds(1)._2 === 3L)
  }

  test("hardNegatives: per-partition heap pre-reduce returns the exact " +
    "global top-k (vs brute force) across many partitions") {
    val dims = 4
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(dims)(rnd.nextDouble())
    val cands = (0L until 200L).map(i => (i, if (i % 3 == 0) "a" else "b", vec()))
    val qs = Seq((1000L, "a", vec()), (1001L, "b", vec()))
    val qDf = qs.toDF("query_id", "label", "embedding")
    val cDf = cands.toDF("neighbor_id", "label", "embedding")
      .repartition(16) // force many partial heaps per query
    val got = Similarity.hardNegatives(qDf, cDf, 5)
      .select("query_id", "neighbor_id", "rn")
      .as[(Long, Long, Int)].collect().toSet
    // brute force in scala
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = qs.flatMap { case (qid, ql, qa) =>
      cands.filter(_._2 != ql)
        .map { case (nid, _, ca) => (nid, cos(qa, ca)) }
        .sortBy { case (nid, c) => (-c, nid) }
        .take(5).zipWithIndex
        .map { case ((nid, _), i) => (qid, nid, i + 1) }
    }.toSet
    assert(got === expected)
  }

  test("weightedSample matches an independent JVM reference of the " +
    "Efraimidis-Spirakis race (md5 fold, exact u, ln key)") {
    val docs = (1L to 400L).map(i => (i, 1L + (i % 13) * 37L)).toDF("id", "w")
      .repartition(16)
    val got = Pipeline.weightedSample(docs, col("id"), col("w"), 25)
      .as[(Long, Long)].collect().toSet

    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 12)
      val h = java.lang.Long.parseLong(hex, 16)
      math.log((h + 1).toDouble / 281474976710656.0) / w.toDouble
    }
    val expected = (1L to 400L).map(i => (i, 1L + (i % 13) * 37L))
      .sortBy { case (id, w) => -key(id, w) }.take(25).toSet
    assert(got === expected)
  }

  test("weightedSample favors heavy rows and plans as TakeOrdered " +
    "(no global sort exchange)") {
    // one row carries nearly all the mass: its key ln(u)/w is ~0^- and
    // must win every draw of a 1-row sample
    val docs = ((1L to 200L).map(i => (i, 1L)) :+ (999L, 1000000000L))
      .toDF("id", "w").repartition(8)
    val ids = Pipeline.weightedSample(docs, col("id"), col("w"), 1)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(ids === Set(999L))
    val plan = Pipeline.weightedSample(docs, col("id"), col("w"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("graft_mg is exact when capacity covers the vocabulary, across " +
    "many partitions (merge path exercised)") {
    graft.functions.GraftFunctions.register(spark)
    val terms = (1 to 3000).map(i => s"w${i % 17}").toDF("term").repartition(16)
    val got = terms.agg(expr("graft_mg(term, 32)").as("hh"))
      .selectExpr("explode(hh) AS e").selectExpr("e.term", "e.cnt")
      .as[(String, Long)].collect().toMap
    val exact = terms.groupBy("term").count().as[(String, Long)].collect().toMap
    assert(got === exact)
  }

  test("graft_mg approximation regime honors the n/(m+1) undercount " +
    "bound and never loses a majority item") {
    graft.functions.GraftFunctions.register(spark)
    // 6000 copies of HEAVY + 600 each of 9 light terms, m = 4
    val n = 6000 + 9 * 600
    val rows = (Seq.fill(6000)("HEAVY") ++
      (1 to 9).flatMap(i => Seq.fill(600)(s"light$i")))
    val terms = rows.toDF("term").repartition(8)
    val got = terms.agg(expr("graft_mg(term, 4)").as("hh"))
      .selectExpr("explode(hh) AS e").selectExpr("e.term", "e.cnt")
      .as[(String, Long)].collect().toMap
    assert(got.size <= 4)
    assert(got.contains("HEAVY"), s"majority item evicted: $got")
    val bound = n / 5 // n/(m+1)
    got.foreach { case (t, c) =>
      val truth = if (t == "HEAVY") 6000L else 600L
      assert(c <= truth, s"$t overcounted: $c > $truth")
      assert(truth - c <= bound, s"$t undercounted past n/(m+1): $c vs $truth")
    }
  }

  test("chunkByStride emits clamped spans with exact overlap and plans " +
    "shuffle-free") {
    // chunk=10, stride=7: 24 tokens -> ceil((24-10)/7)+1 = 3 chunks,
    // last clamped to 24; 10 tokens -> exactly 1; 11 -> 2
    val docs = Seq(
      (1L, (1 to 24).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (3L, (1 to 11).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = Pipeline.chunkByStride(docs, col("doc_id"),
      split(col("text"), " "), 10, 7)
    val got = out.as[(Long, Int, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 0, 0L, 10L), (1L, 1, 7L, 17L), (1L, 2, 14L, 24L),
      (2L, 0, 0L, 10L),
      (3L, 0, 0L, 10L), (3L, 1, 7L, 11L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}

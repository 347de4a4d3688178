package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch-19 specs (q60 Markov transitions, q61 RFM segments,
  * c09 Davies–Bouldin validity, s18 MMR diversified rerank).
  */
class RoundEightBatchNineteenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ------------------------------------------------------------- q60

  test("q60 counts a hand-built event log's transitions exactly") {
    val s = spark; import s.implicits._
    // user 1: x y x y  -> (x,y) (y,x) (x,y); user 2: x z -> (x,z)
    val rows = Seq(
      (1L, 1L, "x", 0L), (2L, 1L, "y", 1000L),
      (3L, 1L, "x", 2000L), (4L, 1L, "y", 3000L),
      (5L, 2L, "x", 0L), (6L, 2L, "z", 1000L))
      .toDF("event_id", "user_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
      .select("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val dir = TempDirs.create("graft-q60-fix")
    rows.coalesce(1).write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(dir, "events.parquet").toString)
    val got = SparkEntry.queries("q60_markov_transitions")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      ("x", "y") -> ((2L, 666666L)),
      ("x", "z") -> ((1L, 333333L)),
      ("y", "x") -> ((1L, 1000000L))))
  }

  test("q60 on the real table: transition mass is events minus users, " +
    "and each source row's probabilities sum to one (floor-rounded)") {
    val rows = run("q60_markov_transitions").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val e = Catalog.t(spark, sf, "events")
    val nEvents = e.count()
    val nUsers = e.select("user_id").distinct().count()
    assert(rows.map(_._3).sum === nEvents - nUsers)
    // per-source probability mass: sum of floor-rounded shares lands in
    // (1e6 - |targets|, 1e6]
    rows.groupBy(_._1).foreach { case (_, g) =>
      val mass = g.map(_._4).sum
      assert(mass <= 1000000L && mass > 1000000L - g.size, g.toSeq)
    }
    rows.foreach(r => assert(r._4 >= 0 && r._4 <= 1000000L))
  }

  // ------------------------------------------------------------- q61

  test("q61 partitions every customer exactly once into balanced " +
    "quartiles and conserves the monetary total") {
    val rows = run("q61_rfm_segments").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    val o = Catalog.t(spark, sf, "orders")
    val nCust = o.select("o_custkey").distinct().count()
    assert(rows.map(_._4).sum === nCust)
    rows.foreach { r =>
      assert(r._1 >= 1 && r._1 <= 4)
      assert(r._2 >= 1 && r._2 <= 4)
      assert(r._3 >= 1 && r._3 <= 4)
      assert(r._4 > 0)
    }
    // exact cents conservation against an independent aggregation
    val totalCents = o.agg(
      sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("c"))
      .collect()(0).getLong(0)
    assert(rows.map(_._5).sum === totalCents)
    // ntile guarantee: each marginal quartile holds n/4 customers +-1
    for (dim <- 0 to 2) {
      val marginal = rows.groupBy(d => dim match {
        case 0 => d._1; case 1 => d._2; case 2 => d._3
      }).view.mapValues(_.map(_._4).sum).toMap
      assert(marginal.keySet === Set(1, 2, 3, 4))
      assert(marginal.values.max - marginal.values.min <= 1, marginal)
    }
  }

  // ------------------------------------------------------------- c09

  /** Plain-Scala Davies–Bouldin with the operator's exact fixed-point
    * contract: cosine assignment (tie -> lowest cid), per-row
    * round(L2 * 1e7) scatter, integer mean, (s_i+s_j)*1e6 / m_ij max.
    */
  private def dbReference(
      vecs: Seq[(Long, Array[Double])],
      cents: Seq[(Long, Array[Double])]): Map[Long, (Long, Long, Long)] = {
    val Fx = 10000000L
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def nrm(a: Array[Double]) = math.sqrt(dot(a, a))
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      math.sqrt(s)
    }
    val asg = vecs.map { case (id, v) =>
      val best = cents.map { case (cid, c) =>
        (cid, dot(v, c) / (nrm(v) * nrm(c)))
      }.minBy { case (cid, cos) => (-cos, cid) }
      (id, v, best._1)
    }
    val scat = asg.groupBy(_._3).map { case (cid, members) =>
      val cv = cents.find(_._1 == cid).get._2
      val fxs = members.map(m => math.round(l2(m._2, cv) * Fx))
      cid -> ((members.size.toLong, fxs.sum / members.size))
    }
    scat.map { case (i, (n, si)) =>
      val db = (for {
        (j, (_, sj)) <- scat if j != i
        mfx = math.round(l2(cents.find(_._1 == i).get._2,
          cents.find(_._1 == j).get._2) * Fx) if mfx > 0
      } yield (si + sj) * 1000000L / mfx).max
      i -> ((n, si, db))
    }
  }

  test("daviesBouldin matches a plain-Scala reference on planted " +
    "two-cluster geometry") {
    val s = spark; import s.implicits._
    val vecs = Seq(
      (1L, Array(10.0, 0.1)), (2L, Array(10.0, -0.1)),
      (3L, Array(9.9, 0.0)), (4L, Array(0.1, 10.0)),
      (5L, Array(-0.1, 10.0)), (6L, Array(0.0, 9.9)))
    val cents = Seq((0L, Array(10.0, 0.0)), (1L, Array(0.0, 10.0)))
    val got = graft.llm.Clustering.daviesBouldin(
      vecs.toDF("vec_id", "embedding"),
      cents.toDF("cid", "embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === dbReference(vecs, cents))
    // tight clusters, far apart: the index is well under 1.0 (1e6 fx)
    got.values.foreach { case (_, _, db) => assert(db < 1000000L) }
  }

  test("c09 on the real table: every reported cluster has members, " +
    "non-negative scatter, and a positive separation ratio") {
    val rows = run("c09_davies_bouldin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.foreach { r =>
      assert(r._2 > 0); assert(r._3 >= 0); assert(r._4 > 0)
    }
    // member conservation: assigned members cannot exceed the corpus
    val n = Catalog.t(spark, sf, "embeddings").count()
    assert(rows.map(_._2).sum <= n)
  }

  // ------------------------------------------------------------- s18

  /** Plain-Scala greedy MMR with the operator's exact integer scoring. */
  private def mmrReference(
      q: Array[Double], cands: Seq[(Long, Array[Double])],
      k: Int, shortlistN: Int): Seq[(Long, Int, Long)] = {
    val Fx = 10000000L
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def nrm(a: Array[Double]) = math.sqrt(dot(a, a))
    def fx(a: Array[Double], b: Array[Double]): Long =
      math.round(dot(a, b) / (nrm(a) * nrm(b)) * Fx)
    val rel = cands.map { case (id, v) => (id, v, fx(q, v)) }
    val short = rel.sortBy { case (id, _, r) => (-r, id) }.take(shortlistN)
    var sel = Vector.empty[(Long, Int, Long)]
    var remaining = short
    for (r <- 1 to k if remaining.nonEmpty) {
      val scored = remaining.map { case (id, v, relFx) =>
        val msim = if (sel.isEmpty) 0L
        else sel.map(p => fx(short.find(_._1 == p._1).get._2, v)).max
        val score = if (r == 1) 7 * relFx else 7 * relFx - 3 * msim
        (id, v, score)
      }
      val pick = scored.minBy { case (id, _, sc) => (-sc, id) }
      sel = sel :+ ((pick._1, r, pick._3))
      remaining = remaining.filterNot(_._1 == pick._1)
    }
    sel
  }

  test("mmrRerank demotes a near-duplicate in favor of a diverse " +
    "candidate and matches the greedy reference exactly") {
    val s = spark; import s.implicits._
    val q = Array(1.0, 0.0)
    val cands = Seq(
      (1L, Array(1.0, 0.3)), // top relevance
      (2L, Array(1.0, 0.31)), // near-duplicate of 1
      (3L, Array(1.0, -0.3)), // as relevant, diverse direction
      (4L, Array(0.2, 1.0)), // weak
      (5L, Array(-1.0, 0.1))) // anti-relevant
    val got = graft.llm.Similarity.mmrRerank(
      Seq((100L, q)).toDF("query_id", "embedding"),
      cands.toDF("neighbor_id", "embedding"),
      3, 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._2)
    val want = mmrReference(q, cands, 3, 4)
      .map { case (id, rank, score) => (100L, rank, id, score) }
    assert(got.toSeq === want)
    // the designed demotion: rank 2 is the diverse 3, not duplicate 2
    assert(got(0)._3 === 1L)
    assert(got(1)._3 === 3L)
  }

  test("s18 on the real table: five distinct picks per query, rank 1 " +
    "is the relevance argmax, winner scores never increase") {
    val rows = run("s18_mmr_rerank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size === 16)
    val top1 = run("s01_cosine_topk").filter(col("rn") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byQ.foreach { case (q, g) =>
      assert(g.map(_._2).sorted.toSeq === Seq(1, 2, 3, 4, 5), s"query $q")
      assert(g.map(_._3).distinct.length === 5, s"query $q repeats a pick")
      // greedy round 1 is pure relevance — must agree with s01's top-1
      assert(g.find(_._2 == 1).get._3 === top1(q), s"query $q rank-1")
      // from rank 2 on, each winner maximized over a smaller set with
      // penalties over a nested (growing) selected set: the winning
      // score is monotone non-increasing. (Rank 1 -> 2 is exempt: a
      // NEGATIVE similarity to the first pick can raise a score above
      // the pure-relevance round-1 scale.)
      val scores = g.sortBy(_._2).map(_._4).drop(1)
      scores.sliding(2).foreach(p => assert(p(0) >= p(1), s"query $q"))
    }
  }
}

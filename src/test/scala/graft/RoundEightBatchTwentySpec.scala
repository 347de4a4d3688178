package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch-20 specs (g10 two-hop reach, t34 TextRank keywords,
  * p22 preference pairs, m09 caption alignment).
  */
class RoundEightBatchTwentySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ------------------------------------------------------------- g10

  test("twoHopReach counts exactly the distance-2 shell on a path plus " +
    "a clique (hand-computed fixture)") {
    val s = spark; import s.implicits._
    // path 1-2-3-4-5: shell(1)={3} shell(2)={4} shell(3)={1,5} ...
    // triangle 6-7-8: every two-hop candidate is already adjacent
    val nodes = (1L to 8L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L), (7L, 8L), (6L, 8L)).toDF("src", "dst")
    val got = graft.llm.GraphAlgs.twoHopReach(nodes, edges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === Map(
      1L -> ((1L, 1L)), 2L -> ((2L, 1L)), 3L -> ((2L, 2L)),
      4L -> ((2L, 1L)), 5L -> ((1L, 1L)),
      6L -> ((2L, 0L)), 7L -> ((2L, 0L)), 8L -> ((2L, 0L))))
  }

  test("g10 on the real table: isolated docs have an empty shell and " +
    "the shell never contains direct neighbors (count bound)") {
    val rows = run("g10_two_hop").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === Catalog.t(spark, sf, "documents").count())
    rows.foreach { case (_, deg, th) =>
      assert(th >= 0)
      if (deg == 0) assert(th === 0)
    }
    // at least one doc in the near-dup graph has a non-trivial shell
    // OR the tight graph is pure cliques — both legal; pin only that
    // some doc has edges at all (the d04 simhash families exist)
    assert(rows.exists(_._2 > 0))
  }

  // ------------------------------------------------------------- t34

  /** Plain-Scala weighted PageRank with the operator's exact integer
    * recursion (floor divisions, 15/85 damping in percent).
    */
  private def textRankReference(docs: Seq[(String, String)], iters: Int)
      : Map[(String, String), Long] = {
    val scale = 1000000000L
    val bigrams = docs.flatMap { case (lang, text) =>
      text.split(" ").sliding(2).collect {
        case Array(a, b) if a != b => (lang, a, b)
      }
    }
    val bp = bigrams.groupBy(identity).view.mapValues(_.size.toLong)
    val e = (bp.toSeq.map { case ((l, a, b), c) => ((l, a, b), c) } ++
      bp.toSeq.map { case ((l, a, b), c) => ((l, b, a), c) })
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val wdeg = e.groupBy { case ((l, u, _), _) => (l, u) }.view
      .mapValues(_.values.sum).toMap
    val nv = wdeg.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = wdeg.keys.map(k => k -> scale / nv(k._1)).toMap
    for (_ <- 1 to iters) {
      val contrib = e.toSeq
        .map { case ((l, u, v), w) =>
          ((l, v), rank((l, u)) * w / wdeg((l, u)))
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      rank = rank.keys.map { k =>
        val base = 15L * (scale / nv(k._1)) / 100L
        k -> (base + 85L * contrib.getOrElse(k, 0L) / 100L)
      }.toMap
    }
    rank
  }

  test("textRankKeywords matches a plain-Scala integer reference and " +
    "promotes the hub word of a star over a higher-count rim pair") {
    val s = spark; import s.implicits._
    // 'hub' touches 4 distinct words once each; 'x'/'y' co-occur 3
    // times but only with each other — TextRank ranks hub first
    val docs = Seq(
      ("en", "hub a hub b hub c hub d"),
      ("en", "x y x y x y"))
    val df = docs.zipWithIndex
      .map { case ((l, t), i) => (i.toLong, t, l) }
      .toDF("doc_id", "text", "lang")
    val got = graft.llm.TextAnalysis.textRankKeywords(df, 3, 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getInt(3)))).toMap
    val ref = textRankReference(docs, 3)
    got.foreach { case ((l, w), (fx, _)) =>
      assert(fx === ref((l, w)), s"rank of '$w'")
    }
    val order = got.toSeq.sortBy { case (_, (_, rn)) => rn }.map(_._1._2)
    assert(order.head === "hub", order.toString)
  }

  test("t34 on the real table: ten keywords per language, ranks dense, " +
    "scores positive and non-increasing") {
    val rows = run("t34_textrank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val byLang = rows.groupBy(_._1)
    assert(byLang.size === 5)
    byLang.foreach { case (lang, g) =>
      assert(g.map(_._4).sorted.toSeq === (1 to 10), s"lang $lang")
      val ordered = g.sortBy(_._4).map(_._3)
      ordered.foreach(fx => assert(fx > 0))
      ordered.sliding(2).foreach(p => assert(p(0) >= p(1), s"lang $lang"))
    }
  }

  // ------------------------------------------------------------- p22

  test("p22 pairs best against worst within a stratum, never reuses a " +
    "doc on the same side, and margins are strictly positive") {
    val rows = run("p22_preference_pairs").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, k, c, rj, m) =>
      assert(m > 0); assert(c !== rj); assert(k >= 1)
    }
    // one appearance per side per doc
    assert(rows.map(_._4).distinct.length === rows.length)
    assert(rows.map(_._5).distinct.length === rows.length)
    // chosen and rejected sides are disjoint doc sets
    assert(rows.map(_._4).toSet.intersect(rows.map(_._5).toSet).isEmpty)
    // pair count per stratum <= half the stratum's docs
    val docs = Catalog.t(spark, sf, "documents")
      .select(col("lang"),
        expr("cast(length(bin(greatest(size(split(text, ' ')), 1))) - 1 " +
          "as int)").as("bucket"))
      .groupBy("lang", "bucket").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    rows.groupBy(r => (r._1, r._2)).foreach { case (k, g) =>
      assert(g.length <= docs(k) / 2, s"stratum $k")
    }
  }

  test("p22 on a hand fixture pairs the extreme docs and drops the " +
    "tied middle") {
    val s = spark; import s.implicits._
    // TTR: d1 = 1.0 (4/4), d2 = 0.75 (3/4), d3 = 0.5 (2/4), d4 = 0.25
    // (1/4) — same lang, same 4-token bucket
    val docs = Seq(
      (1L, "a b c d", "en"), (2L, "a a b c", "en"),
      (3L, "a a b b", "en"), (4L, "a a a a", "en"))
      .toDF("doc_id", "text", "lang")
    val got = graft.llm.Pipeline.preferencePairs(docs).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 1L, 4L, 750000L), // best (1.0) vs worst (0.25)
      (2L, 2L, 3L, 250000L))) // 2nd best (0.75) vs 2nd worst (0.5)
  }

  // ------------------------------------------------------------- m09

  test("captionAlign lands each frame on the latest segment at or " +
    "before it (hand-computed fixture)") {
    val s = spark; import s.implicits._
    // 10 words of 1 char: dur 210 each; segments of 8 words ->
    // seg 0 starts 0, seg 1 starts 8*210 = 1680
    val docs = Seq((3L, Array.fill(10)("a").mkString(" "))).toDF("doc_id", "text")
    val frames = Seq((3L, 0), (3L, 8), (3L, 40), (3L, 44))
      .toDF("doc_id", "frame_idx")
    val got = graft.llm.Multimodal.captionAlign(frames, docs).collect()
      .map(r => r.getInt(1) -> ((r.getInt(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === Map(
      0 -> ((0, 0L, 0L)), // 0 ms -> seg 0
      8 -> ((0, 0L, 320L)), // 320 ms -> seg 0
      40 -> ((0, 0L, 1600L)), // 1600 ms < 1680 -> still seg 0
      44 -> ((1, 1680L, 80L)))) // 1760 ms -> seg 1
  }

  test("m09 on the real table: exactly m03's frames, non-negative lag, " +
    "segment index monotone in frame time per doc") {
    val rows = run("m09_caption_align").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    val m03 = run("m03_frame_sample").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows.map(r => (r._1, r._2)).toSet === m03)
    assert(rows.length === m03.size)
    rows.foreach { case (_, fi, _, segStart, lag) =>
      assert(lag >= 0)
      assert(segStart <= fi.toLong * 40)
    }
    rows.groupBy(_._1).foreach { case (doc, g) =>
      val ordered = g.sortBy(_._2).map(_._3)
      ordered.sliding(2).foreach(p =>
        if (p.length == 2) assert(p(0) <= p(1), s"doc $doc"))
    }
  }
}

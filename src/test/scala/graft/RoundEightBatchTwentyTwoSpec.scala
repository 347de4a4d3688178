package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch-22 specs (j06 incident overlap join, c10 Rand-index
  * stability, t36 held-out KN perplexity, m10 keyframe selection).
  */
class RoundEightBatchTwentyTwoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ------------------------------------------------------------- j06

  test("j06 overlap durations are positive, hour-bounded, and within " +
    "the session's own span") {
    val rows = run("j06_incident_overlap").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val sess = run("q47_batch_sessions").collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    rows.foreach { case (u, sid, nWin, ov) =>
      assert(nWin >= 1)
      assert(ov >= 1, s"session ($u,$sid)")
      // each disjoint hour window contributes at most one hour
      assert(ov <= nWin * 3600000L)
      // total overlap can never exceed the (half-open) session length
      val (st, en) = sess((u, sid))
      assert(ov <= en - st + 1)
    }
  }

  test("j06 on a hand fixture: a session spanning two incident hours " +
    "splits its overlap across them") {
    val s = spark; import s.implicits._
    // user 1 session: [30min, 60min] (gap exactly 30min = one session)
    // spans hours 0 and 1. errors: 3 in hour 0, 3 in hour 1, 1 in hour
    // 5 (mean = 7/3 -> 3*3=9 > 7 makes hours 0,1 incidents; 1*3=3 < 7
    // keeps hour 5 out).
    val h = 3600000L
    val events =
      Seq((1L, 1L, "view", h / 2), (2L, 1L, "view", h)) ++
        (3L to 5L).map(i => (i, 9L, "error", 10L * i)) ++
        (6L to 8L).map(i => (i, 9L, "error", h + 10L * i)) ++
        Seq((9L, 9L, "error", 5 * h))
    val dir = TempDirs.create("graft-j06-fix")
    events.toDF("event_id", "user_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
      .select("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(dir, "events.parquet").toString)
    val got = SparkEntry.queries("j06_incident_overlap")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // user 1's session [1800000, 3600000]: overlap with hour 0 =
    // 3600000 - 1800000 = 1800000; with hour 1 = 3600001 - 3600000 = 1
    // (half-open end); total 1800001 over 2 windows
    assert(got((1L, 1)) === ((2L, 1800001L)))
    // the error-burst user's own sessions overlap their hours too
    assert(got.contains((9L, 1)))
  }

  // ------------------------------------------------------------- c10

  test("c10 Rand index: identical seed sets agree on every pair " +
    "(RI = 1 exactly)") {
    val s = spark; import s.implicits._
    val vecs = (0L until 8L).map(i =>
      (i, Array(math.cos(i * 0.7), math.sin(i * 0.7)))).toDF("vec_id", "embedding")
    val centA = (0L until 8L by 4L).map(i =>
      (i, Array(math.cos(i * 0.7), math.sin(i * 0.7)))).toDF("cid", "embedding")
    val same = graft.llm.Clustering.randIndex(vecs, centA, centA)
      .collect()(0)
    assert(same.getAs[Long]("ri_fx") === 1000000L)
    assert(same.getAs[Long]("n_points") === 8L)
    assert(same.getAs[Long]("sum_ai2") === same.getAs[Long]("sum_bj2"))
  }

  test("c10 on the real table: bookkeeping identities of the pair " +
    "counts hold and RI is a valid fraction") {
    val r = run("c10_rand_index").collect()(0)
    val n = r.getAs[Long]("n_points")
    assert(n === Catalog.t(spark, sf, "embeddings").count())
    val pairs = n * (n - 1) / 2
    val sab = r.getAs[Long]("sum_nij2")
    val sa = r.getAs[Long]("sum_ai2")
    val sb = r.getAs[Long]("sum_bj2")
    // pairs together in BOTH <= pairs together in either clustering
    assert(sab <= sa && sab <= sb)
    assert(sa <= pairs && sb <= pairs)
    val ri = r.getAs[Long]("ri_fx")
    assert(ri >= 0 && ri <= 1000000L)
    assert(ri === (pairs + 2 * sab - sa - sb) * 1000000L / pairs)
  }

  // ------------------------------------------------------------- t36

  test("t36 matches a plain-Scala KN held-out scorer on a fixture " +
    "with seen, backoff-only, and unseen eval bigrams") {
    val s = spark; import s.implicits._
    // train: docs 0-8 pattern; eval: doc 9 exercises all three paths
    val docs = Seq(
      (0L, "a b a c d b", "en"),
      (1L, "c d c b", "en"),
      (9L, "a b q b zz q", "en")) // (a,b) seen; (q,b)/(b,zz) backoff; (zz,q) w1-unseen
      .toDF("doc_id", "text", "lang")
    val dir = TempDirs.create("graft-t36-fix")
    docs.withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(dir, "documents.parquet").toString)
    val got = SparkEntry.queries("t36_kn_heldout")(spark, dir).collect()
    assert(got.length === 1)
    val row = got(0)
    // plain-Scala replay
    val train = Seq("a b a c d b", "c d c b")
      .flatMap(_.split(" ").sliding(2).map(p => (p(0), p(1))))
    val c = train.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = c.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val rt = c.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val lt = c.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val tty = c.size.toLong
    val evalBg = "a b q b zz q".split(" ").sliding(2).map(p => (p(0), p(1))).toSeq
    val ps = evalBg.map { case (w1, w2) =>
      if (!tot.contains(w1)) None
      else if (!lt.contains(w2) && !c.contains((w1, w2))) None
      else Some(
        math.max(c.getOrElse((w1, w2), 0L).toDouble - 0.75, 0) / tot(w1) +
          (0.75 * rt(w1) / tot(w1)) * (lt.getOrElse(w2, 0L).toDouble / tty))
    }
    val scored = ps.flatten.map(p => math.round(-math.log(p) * 1000000))
    assert(row.getAs[Long]("n_bigrams") === scored.length.toLong)
    assert(row.getAs[Long]("n_unseen") === ps.count(_.isEmpty).toLong)
    assert(row.getAs[Long]("mean_nll_fx") === scored.sum / scored.length)
  }

  test("t36 on the real table: all five languages scored, NLL " +
    "positive, unseen share bounded") {
    val rows = run("t36_kn_heldout").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 5)
    rows.foreach { case (_, nb, nu, nll) =>
      assert(nb > 0)
      assert(nll > 0)
      assert(nu >= 0 && nu < nb) // synthetic vocab: unseen is the tail
    }
  }

  // ------------------------------------------------------------- m10

  test("m10 keyframes: first frame always kept, ranks dense, every " +
    "kept jump clears the threshold against the PREVIOUS SAMPLED frame") {
    val rows = run("m10_keyframes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val frames = run("m03_frame_sample").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val feats = run("m02_multimodal_decode").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("checksum")).toMap
    val byDoc = rows.groupBy(_._1)
    // every video doc keeps at least its first sampled frame
    assert(byDoc.keySet === frames.map(_._1).toSet)
    byDoc.foreach { case (doc, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.head._2 === 0, s"doc $doc first frame")
      assert(sorted.map(_._4).toSeq === (1 to g.length), s"doc $doc ranks")
      // recompute the jump decision from m03's full sample sequence
      val all = frames.filter(_._1 == doc).map(_._2).sorted
      val hash = all.map(i => i -> (feats(doc) * (i + 1)) % 1000003L).toMap
      val expected = all.zipWithIndex.filter { case (i, pos) =>
        pos == 0 || math.abs(hash(i) - hash(all(pos - 1))) >= 500000L
      }.map(_._1)
      assert(sorted.map(_._2).toSeq === expected, s"doc $doc")
      sorted.foreach { case (_, i, fh, _) => assert(fh === hash(i)) }
    }
  }
}

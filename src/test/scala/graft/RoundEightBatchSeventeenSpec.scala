package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch-17 specs (t32 BM25, s17 truncated-dim recall,
  * c08 elbow curve, i11 SCD2 merge).
  */
class RoundEightBatchSeventeenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ------------------------------------------------------------- t32

  /** Plain-Scala BM25 (k1 = 1.2, b = 0.75) with the operator's exact
    * expression order, so doubles compare bit-for-bit.
    */
  private def bm25Ref(docs: Seq[(Long, String)], terms: Seq[String])
      : Map[Long, (Map[String, Double], Double)] = {
    val words = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = docs.size.toLong
    val sumDl = words.values.map(_.size.toLong).sum
    val avgdl = sumDl.toDouble / n.toDouble
    val df = terms.map(t =>
      t -> words.values.count(_.contains(t)).toLong).toMap
    docs.flatMap { case (id, _) =>
      val w = words(id)
      val dl = w.size.toLong
      val perTerm = terms.flatMap { t =>
        val tf = w.count(_ == t).toLong
        if (tf == 0) None
        else {
          val idf = math.log(1 + ((n - df(t)).toDouble + 0.5)
            / (df(t).toDouble + 0.5))
          Some(t -> (idf * (tf.toDouble * 2.2)
            / (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl)))))
        }
      }.toMap
      if (perTerm.isEmpty) None
      else Some(id -> ((perTerm, terms.map(t => perTerm.getOrElse(t, 0.0)).sum)))
    }.toMap
  }

  test("bm25TopK matches a plain-Scala BM25 reference on a hand fixture") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "spark window spark merge extra"),
      (2L, "spark other words here"),
      (3L, "nothing relevant at all"),
      (4L, "window window window merge window pad pad pad"))
    val terms = Seq("spark", "window", "merge")
    val got = graft.llm.TextAnalysis.bm25TopK(
        docs.toDF("doc_id", "text"), terms, 10)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getDouble(4), r.getInt(5)))).toMap
    val ref = bm25Ref(docs, terms)
    assert(got.keySet === ref.keySet) // doc 3 matches no term -> absent
    ref.foreach { case (id, (perTerm, score)) =>
      val (sSpark, sWin, sMerge, gscore, _) = got(id)
      assert(math.abs(gscore - score) < 1e-12, s"doc $id score")
      assert(sSpark.map(_.asInstanceOf[Double]).getOrElse(0.0)
        === perTerm.getOrElse("spark", 0.0))
      assert(sWin.map(_.asInstanceOf[Double]).getOrElse(0.0)
        === perTerm.getOrElse("window", 0.0))
      assert(sMerge.map(_.asInstanceOf[Double]).getOrElse(0.0)
        === perTerm.getOrElse("merge", 0.0))
    }
    // ranks follow (score desc, doc_id asc)
    val byRank = got.toSeq.sortBy(_._2._5)
    assert(byRank.map(_._2._4).sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true
    })
  }

  test("t32 on the real table: ranks are 1..10, scores nonincreasing, " +
    "every scored doc matches at least one query term") {
    val rows = run("t32_bm25").orderBy(col("rank")).collect()
    assert(rows.map(_.getInt(5)).toSeq === (1 to rows.length))
    val scores = rows.map(_.getDouble(4)).toSeq
    assert(scores.sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true
    })
    rows.foreach { r =>
      assert(!(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3)))
      assert(r.getDouble(4) > 0)
    }
  }

  // ------------------------------------------------------------- s17

  /** Exact brute-force truncated-recall reference with the operator's
    * fold order and (cosine desc, id asc) tie-break.
    */
  private def truncRecallRef(vecs: Seq[(Long, Seq[Float])], dims: Seq[Int],
      k: Int, numQueries: Int): Map[Int, Long] = {
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble }
    def nrm(a: Seq[Float]): Double = {
      val d = dot(a, a); if (d == 0) 1.0 else math.sqrt(d)
    }
    def topk(dim: Option[Int]): Map[Long, Seq[Long]] = {
      val sl = dim.map(dm => vecs.map { case (id, v) => id -> v.take(dm) })
        .getOrElse(vecs)
      val byId = sl.toMap
      sl.collect { case (qid, qv) if qid < numQueries =>
        qid -> sl.filter(_._1 != qid)
          .map { case (cid, cv) =>
            (cid, dot(qv, cv) / (nrm(qv) * nrm(cv))) }
          .sortBy { case (cid, cos) => (-cos, cid) }.take(k).map(_._1)
      }.toMap
    }
    val exact = topk(None)
    dims.map { dm =>
      val t = topk(Some(dm))
      dm -> exact.map { case (q, ids) =>
        ids.toSet.intersect(t(q).toSet).size.toLong }.sum
    }.toMap
  }

  test("truncatedRecall matches the brute-force reference on a fixture " +
    "where the prefix misleads the ranking") {
    val s = spark; import s.implicits._
    // deterministic pseudo-random 6-dim vectors; 2 queries, 12 candidates
    val vecs = (0L until 14L).map { i =>
      val id = if (i < 2) i else i + 14 // candidates get ids >= 16
      id -> (0 until 6).map(j =>
        math.sin(i * 7.0 + j * 3.1).toFloat).toSeq
    }
    val df = vecs.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = graft.llm.Similarity.truncatedRecall(df, Seq(2, 4), 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ref = truncRecallRef(vecs, Seq(2, 4), 3, numQueries = 16)
    assert(got === ref)
  }

  test("s17 on the real table: three dims, recall bounded by 1, matches " +
    "bounded by nq*k") {
    val rows = run("s17_truncated_recall").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet === Set(8, 16, 32))
    rows.values.foreach { case (n, fx) =>
      assert(n >= 0 && n <= 16L * 5)
      assert(fx >= 0 && fx <= 1000000L)
    }
  }

  // ------------------------------------------------------------- c08

  test("elbowCurve matches a plain-Scala reference on a two-cluster " +
    "fixture and nested seeds make inertia monotone") {
    val s = spark; import s.implicits._
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.1f, 0.95f)),
      (4L, Seq(0.8f, 0.2f)), (5L, Seq(0.2f, 0.9f)),
      (6L, Seq(0.7f, 0.3f)), (7L, Seq(0.3f, 0.85f)))
    val df = vecs.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble }
    def nrm(a: Seq[Float]): Double = {
      val d = dot(a, a); if (d == 0) 1.0 else math.sqrt(d)
    }
    val ref = Seq(2, 4).map { k =>
      val cents = vecs.filter(_._1 < k)
      k -> vecs.map { case (_, v) =>
        val best = cents.map { case (_, c) =>
          dot(v, c) / (nrm(v) * nrm(c)) }.max
        math.round((1 - best) * 10000000L.toDouble)
      }.sum
    }.toMap
    val got = graft.llm.Clustering.elbowCurve(df, Seq(2, 4)).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(2)._1 === 8L && got(4)._1 === 8L)
    assert(got(2)._2 === ref(2))
    assert(got(4)._2 === ref(4))
    assert(got(4)._2 <= got(2)._2)
  }

  test("c08 on the real table: inertia nonincreasing in k (nested " +
    "seeds), deltas nonnegative, every vector priced") {
    val rows = run("c08_elbow").orderBy(col("k")).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(2, 4, 8, 16))
    val n = Catalog.t(spark, sf, "embeddings").count()
    rows.foreach(r => assert(r.getLong(1) === n))
    val inertias = rows.map(_.getLong(2)).toSeq
    assert(inertias.sliding(2).forall {
      case Seq(a, b) => b <= a; case _ => true
    }, inertias.toString)
    assert(rows.head.isNullAt(3))
    rows.tail.foreach(r => assert(r.getLong(3) >= 0))
  }

  // ------------------------------------------------------------- i11

  test("i11 SCD2 laws: one current row per key, close/open pair per " +
    "changed key, validity chain covers the full horizon") {
    val rows = run("i11_scd2_merge").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getTimestamp(3),
        r.getBoolean(4), r.getString(5)))
    val byKey = rows.groupBy(_._1)
    // independently derive the changed-key set from the source tables
    val cust = Catalog.t(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val tiers = Catalog.t(spark, sf, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("n"))
      .select(col("c_custkey"),
        when(col("n") >= 10, "BULK").otherwise("ACTIVE").as("seg"))
    val changed = cust.join(tiers, "c_custkey")
      .filter(col("seg") =!= col("c_mktsegment"))
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(rows.length === cust.count() + changed.size)
    byKey.foreach { case (key, vs) =>
      assert(vs.count(_._5) === 1, s"key $key current rows")
      if (changed(key)) {
        assert(vs.length === 2)
        val close = vs.find(_._6 == "close").get
        val open = vs.find(_._6 == "open").get
        assert(close._4 === open._3) // no gap, no overlap
        assert(!close._5 && open._5)
      } else {
        assert(vs.length === 1 && vs.head._6 === "carry")
      }
    }
    assert(rows.count(_._6 == "close") === rows.count(_._6 == "open"))
  }
}

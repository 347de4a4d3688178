package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch-9 specs (j04 / g07 / t30 / p20 / s15): each operator
  * cross-checked against an independent reference — hand-computed graph
  * and ANN fixtures where the expected value is derivable on paper,
  * plain-Scala recomputations over the collected sf0.001 tables for the
  * temporal/text/pipeline queries.
  */
class RoundEightBatchNineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ------------------------------------------------ j04 time-weighted avg

  test("j04 time-weighted average matches a plain-Scala step-function " +
    "integral over the collected events") {
    val events = Catalog.t(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_millis(col("ts")).as("ms"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // reference: per (user, type) sort by (ms, event_id); each reading
    // holds until the next; integrate cents x held-ms
    val exp = events.groupBy(e => (e._1, e._2)).toSeq
      .flatMap { case (_, rows) =>
        val sorted = rows.sortBy(e => (e._4, e._3))
        sorted.zip(sorted.tail).map { case (a, b) =>
          (a._2, a._5 * (b._4 - a._4), b._4 - a._4)
        }
      }
      .groupBy(_._1)
      .map { case (tpe, holds) =>
        val wsum = holds.map(_._2).sum
        val dur = holds.map(_._3).sum
        tpe -> ((holds.size.toLong, dur,
          wsum.toDouble / (100.0 * dur.toDouble)))
      }
    val got = run("j04_time_weighted_avg").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got === exp)
  }

  // ---------------------------------------------------- g07 degree profile

  test("degreeProfile on a star is perfectly disassortative (r = -1)") {
    val s = spark; import s.implicits._
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val r = graft.llm.GraphAlgs.degreeProfile(edges).collect().head
    assert(r.getLong(0) === 4L)         // n_nodes
    assert(r.getLong(1) === 3L)         // n_edges
    assert(r.getLong(2) === 3L)         // max_degree
    assert(r.getDouble(3) === 1.5)      // mean degree 6/4
    assert(r.getDouble(4) === -1.0)     // hub-and-spoke
  }

  test("degreeProfile on a regular graph reports assortativity 0 " +
    "by convention (zero degree variance)") {
    val s = spark; import s.implicits._
    // 4-cycle: every degree 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val r = graft.llm.GraphAlgs.degreeProfile(edges).collect().head
    assert(r.getLong(0) === 4L && r.getLong(1) === 4L)
    assert(r.getLong(2) === 2L && r.getDouble(3) === 2.0)
    assert(r.getDouble(4) === 0.0)
  }

  test("degreeProfile assortativity matches the hand-computed Pearson " +
    "value on a path graph") {
    val s = spark; import s.implicits._
    // P3 1-2-3: directed endpoint-degree pairs (1,2),(2,1),(2,1),(1,2)
    // => r = -1 exactly
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = graft.llm.GraphAlgs.degreeProfile(edges).collect().head
    assert(r.getDouble(4) === -1.0)
  }

  // ---------------------------------------------------- t30 feature hashing

  test("t30 feature hashing matches a plain-Scala fold with the shared " +
    "polyhash (bucket + sign-bit)") {
    val docs = Catalog.t(spark, sf, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val exp = docs.flatMap { case (lang, text) =>
        text.split(" ", -1).map { w =>
          val h = graft.functions.PolyHash32.hash(w)
          ((lang, (h % 64).toInt), if ((h / 64) % 2 == 0) 1L else -1L)
        }
      }
      .groupBy(_._1)
      .map { case (k, vs) => k -> ((vs.length.toLong, vs.map(_._2).sum)) }
    val got = run("t30_feature_hashing").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === exp)
  }

  // ------------------------------------------------- p20 padding efficiency

  test("p20 padding report matches a plain-Scala next-pow2 bucketing") {
    val lens = Catalog.t(spark, sf, "documents")
      .select(size(split(col("text"), " ")).cast("long")).collect()
      .map(_.getLong(0))
    val exp = lens.groupBy { n =>
        math.max(16L, java.lang.Long.highestOneBit(math.max(n - 1, 1)) * 2)
      }
      .map { case (cap, ns) =>
        val nDocs = ns.length.toLong
        val tok = ns.sum
        val nBatches = (nDocs + 31) / 32
        val padded = nBatches * 32 * cap
        cap -> ((nDocs, tok, nBatches, padded, tok * 1000000L / padded))
      }
    val got = run("p20_padding_efficiency").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got === exp)
    // every bucket cap is a power of two >= 16
    assert(got.keySet.forall(c => c >= 16 && java.lang.Long.bitCount(c) == 1))
  }

  // ------------------------------------------------------- s15 binary ANN

  test("binaryAnn shortlists by sign-hamming then reranks by exact cosine") {
    val s = spark; import s.implicits._
    val vecs = Seq(
      (0L, Seq(1.0f, 1.0f, 1.0f, 1.0f)),    // query
      (1L, Seq(1.0f, 1.0f, 1.0f, -1.0f)),   // hamming 1
      (2L, Seq(2.0f, 2.0f, 2.0f, 2.0f)),    // hamming 0, cosine 1
      (3L, Seq(-1.0f, -1.0f, -1.0f, -1.0f)) // hamming 4 — outside shortlist
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = graft.llm.Similarity.binaryAnn(
        vecs.filter(col("vec_id") === 0L)
          .select(col("vec_id").as("query_id"), col("embedding")),
        vecs.select(col("vec_id").as("neighbor_id"), col("embedding")),
        k = 2, shortlist = 2)
      .select("neighbor_id", "hamming", "rn")
      .as[(Long, Int, Int)].collect().toList.sortBy(_._3)
    // shortlist of 2 keeps {2 (h=0), 1 (h=1)}; rerank puts exact-cosine
    // 1.0 (vec 2) first, 0.5 (vec 1) second; vec 3 never scores
    assert(got === List((2L, 0, 1), (1L, 1, 2)))
  }

  test("binaryAnn hamming equals popcount over packed sign codes on the " +
    "real 64-dim table (cross-check vs unpacked sign disagreement)") {
    val e = Catalog.t(spark, sf, "embeddings").filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def codeOf(a: Array[Float]): Long =
      a.take(64).zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
        if (v > 0) acc | (1L << i) else acc
      }
    val q = e.filter(_._1 < 4)
    val exp = (for { (qi, qa) <- q; (ci, ca) <- e if qi != ci } yield
      ((qi, ci), java.lang.Long.bitCount(codeOf(qa) ^ codeOf(ca)))).toMap
    val got = graft.llm.Similarity.binaryAnn(
        spark.createDataFrame(spark.sparkContext.parallelize(
            q.toSeq.map(p => org.apache.spark.sql.Row(p._1, p._2.toSeq))),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("query_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("embedding",
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.FloatType))))),
        Catalog.t(spark, sf, "embeddings").filter(col("vec_id") < 50)
          .select(col("vec_id").as("neighbor_id"), col("embedding")),
        k = 50, shortlist = 50)
      .select("query_id", "neighbor_id", "hamming").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
    // every surfaced pair's hamming agrees with the reference popcount
    got.foreach { case (k2, h) => assert(exp(k2) === h, s"pair $k2") }
    assert(got.nonEmpty)
  }
}

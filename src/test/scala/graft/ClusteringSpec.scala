package graft

import graft.llm.Clustering

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed cases for the clustering / compressed-search ops. */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kmeansStep: cosine assignment and fixed-point member means") {
    // centroids along the two axes; vectors cluster by dominant axis
    val cent = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f))
    ).toDF("cid", "embedding")
    val vecs = Seq(
      (10L, Array(0.9f, 0.1f)),   // -> cid 0
      (11L, Array(0.8f, -0.2f)),  // -> cid 0
      (12L, Array(0.1f, 0.7f))    // -> cid 1
    ).toDF("vec_id", "embedding")
    val got = Clustering.kmeansStep(vecs, cent)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    def fx(x: Double): Long = math.round(x.toFloat.toDouble * 1e7)
    // cid 0 dim 0: (fx(0.9)+fx(0.8)) div 2; dim 1: (fx(0.1)+fx(-0.2)) div 2
    assert(got((0L, 0L)) === (2L, (fx(0.9) + fx(0.8)) / 2))
    assert(got((0L, 1L)) === (2L, (fx(0.1) + fx(-0.2)) / 2))
    assert(got((1L, 0L)) === (1L, fx(0.1)))
    assert(got((1L, 1L)) === (1L, fx(0.7)))
  }

  test("kmeansTrain above MaxInlineCentroids trains via the distributed " +
    "fallback and matches the driver-path means") {
    // 4 well-separated true clusters; vectors = centroid +- tiny jitter
    val dim = 4
    def base(c: Int): Array[Float] =
      Array.tabulate(dim)(i => if (i == c % dim) 1.0f else 0.0f)
    val vecs = (0 until 64).map { v =>
      val c = v % 4
      (v.toLong, base(c).zipWithIndex.map { case (x, i) =>
        x + (if (i == (v / 4) % dim) 0.01f * (1 + v % 3) else 0.0f) })
    }.toDF("vec_id", "embedding")
    // small init (driver path) vs the SAME 4 centroids buried in a
    // >1024 init (fallback path): extra centroids sit far away with a
    // negative component so nothing re-assigns to them
    val smallInit = (0 until 4).map(c => (c.toLong, base(c))).toDF("cid", "embedding")
    val got = Clustering.kmeansTrain(vecs, smallInit, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val bigInit = ((0 until 4).map(c => (c.toLong, base(c))) ++
      (4 until 1100).map { c =>
        (c.toLong, Array.tabulate(dim)(i => if (i == c % dim) -5.0f else -1.0f))
      }).toDF("cid", "embedding")
    val gotBig = Clustering.kmeansTrain(vecs, bigInit, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // empty far-away clusters drop out; surviving means identical
    assert(gotBig === got)
    assert(got.keys.map(_._1).toSet === Set(0L, 1L, 2L, 3L))
  }

  test("pqAdcTopK: a query equal to codewords has ADC distance 0") {
    // dim 4, m 2, sub 2: codebook {0: [1,0|0,1], 1: [0,1|1,0]};
    // candidate 5 IS codeword 0 in both subspaces, candidate 6 is
    // codeword 1; query equals candidate 5's reconstruction
    val cb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Array(0.0f, 1.0f, 1.0f, 0.0f))
    ).toDF("cid", "embedding")
    val cands = Seq(
      (5L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
      (6L, Array(0.0f, 1.0f, 1.0f, 0.0f))
    ).toDF("neighbor_id", "embedding")
    val q = Seq((99L, Array(1.0f, 0.0f, 0.0f, 1.0f)))
      .toDF("query_id", "embedding")
    val got = Clustering.pqAdcTopK(q, cands, cb, m = 2, k = 2,
      excludeSelf = false)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._3)
    assert(got(0) === ((5L, 0.0, 1)))     // exact codeword match
    assert(got(1)._1 === 6L)
    assert(got(1)._2 === 4.0)             // (1-0)^2 x4 across both subspaces
  }

  test("adcRerank: exact cosine reorders an ADC-distance tie") {
    graft.functions.GraftFunctions.register(spark)
    // codebook = axis vectors, so every candidate encodes losslessly and
    // adc_dist is the exact squared L2. Candidates 10 and 12 tie at
    // 0.25; the exact-cosine re-rank puts 12 first.
    val cb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f))
    ).toDF("cid", "embedding")
    val cands = Seq(
      (10L, Array(1.0f, 0.0f)),
      (11L, Array(0.0f, 1.0f)),
      (12L, Array(1.0f, 1.0f))
    ).toDF("neighbor_id", "embedding")
    val q = Seq((99L, Array(1.0f, 0.5f))).toDF("query_id", "embedding")
    val got = Clustering.adcRerank(q, cands, cb, m = 2, shortlist = 2, k = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getInt(4)))
      .sortBy(_._4)
    val qn = math.sqrt(1.25)
    assert(got(0) === ((12L, 0.25, 1.5 / (qn * math.sqrt(2.0)), 1)))
    assert(got(1) === ((10L, 0.25, 1.0 / (qn * 1.0), 2)))
  }
}

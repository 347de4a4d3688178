package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 batch-4 laws: s21 reciprocal-rank-fusion arithmetic, c11
  * DBSCAN role classification on a planted geometry, p25 retention-
  * sweep conservation.
  */
class RoundNineBatchFourSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("s21 emits exactly top-5 fused rows per query with valid RRF " +
    "scores") {
    val rows = SparkEntry.queries("s21_rank_fusion")(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.values.forall(_.map(_.getAs[Int]("rn")).sorted.toSeq ==
      (1 to 5)))
    // max possible = both retrievers rank it #1: 2 * (1e9 div 61);
    // min possible > 0 = one retriever at rank 10: 1e9 div 70
    val maxFx = 2L * (1000000000L / 61)
    val minFx = 1000000000L / 70
    assert(rows.forall { r =>
      val fx = r.getAs[Long]("rrf_fx"); fx >= minFx && fx <= maxFx })
    // within a query, ranks follow (rrf_fx desc, neighbor_id asc)
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rn"))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        val (fa, fb) = (a.getAs[Long]("rrf_fx"), b.getAs[Long]("rrf_fx"))
        assert(fa > fb || (fa == fb &&
          a.getAs[Long]("neighbor_id") < b.getAs[Long]("neighbor_id")))
      }
    }
  }

  test("s21 a neighbor both retrievers agree on outranks single-" +
    "retriever neighbors at the same rank") {
    // pure arithmetic law of the fusion formula: 1e9 div (60+r) summed
    // over both lists strictly exceeds either term alone
    (1 to 10).foreach { r =>
      assert(2L * (1000000000L / (60 + r)) > 1000000000L / (60 + r)) }
  }

  test("c11 classifies a planted hub/satellite/noise geometry exactly, " +
    "and the LSH epsilon graph loses no edge of the exact one here") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-c11-fixture")
    // 64-dim vectors: c11's epsilon graph goes through banded sign-LSH
    // (64-dim deterministic planes) under c11's OWN low-threshold
    // 16×4 family (round 11: ~91% pair recall at eps 0.35 vs ~2% under
    // d06's 8×12), so the fixture must be plane-dimensioned AND its
    // required pairs must actually collide in >= 1 of the 16 four-bit
    // bands — verified by the exact-vs-LSH edge-set equality below,
    // which re-runs on every build against the deterministic planes.
    import TestVectors.axes
    // panel = vec_id % 5 == 0. Geometry (eps = cos >= 0.35, minPts 3):
    //   0  hub  e26              — neighbors 5, 10 (cos 0.8)   -> core
    //   5  sat  .8·e26 + .6·e14  — neighbor 0 only             -> border
    //  10  sat  .8·e26 − .6·e14  — neighbor 0 only (5·10 cos =
    //       0.64 − 0.36 = 0.28 < eps: a COLLIDING candidate the exact
    //       cosine filter must reject)                         -> border
    //  20  e63 orthogonal        — no neighbors                -> noise
    //   3  non-panel row: must be ignored by the panel filter
    Seq(
      (0L, axes(26 -> 1.0), 0),
      (5L, axes(26 -> 0.8, 14 -> 0.6), 0),
      (10L, axes(26 -> 0.8, 14 -> -0.6), 0),
      (20L, axes(63 -> 1.0), 1),
      (3L, axes(22 -> 1.0), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = SparkEntry.queries("c11_dbscan_core")(s, dir).collect()
      .map(x => x.getAs[Long]("vec_id") ->
        (x.getAs[Long]("n_nb"), x.getAs[String]("role"))).toMap
    assert(r == Map(
      0L -> (2L, "core"), 5L -> (1L, "border"), 10L -> (1L, "border"),
      20L -> (0L, "noise")))
    // all-pairs exact baseline (the opt-in verification path): on this
    // fixture the LSH-blocked epsilon graph must equal the exact one —
    // any bucket miss on a required pair shows up as a diff here
    val panel = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("embedding"))
    def edges(exact: Boolean) =
      graft.llm.Similarity.embeddingNearDups(panel, 0.35, exact = exact,
          bands = graft.llm.Clustering.DbscanBands,
          rowBits = graft.llm.Clustering.DbscanRowBits)
        .select("vec_a", "vec_b").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(edges(exact = false) === edges(exact = true))
  }

  test("p25 sweep conserves totals and is monotone in the threshold") {
    val s = spark
    val rows = SparkEntry.queries("p25_quality_prune_sweep")(s, sf)
      .orderBy("threshold_fx").collect()
    assert(rows.length == 11)
    assert(rows.map(_.getAs[Long]("threshold_fx")).toSeq ==
      (0 to 10).map(_ * 100000L))
    // threshold 0 keeps the whole corpus
    assert(rows.head.getAs[Long]("doc_share_ppm") == 1000000L)
    assert(rows.head.getAs[Long]("n_docs_kept") ==
      Catalog.t(s, sf, "documents").count())
    // retention can only fall as the cutoff rises
    val docs = rows.map(_.getAs[Long]("n_docs_kept"))
    val toks = rows.map(_.getAs[Long]("n_tokens_kept"))
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b })
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b })
  }

  test("p25 scores a hand-computed two-doc corpus into the right buckets") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-p25-fixture")
    // "a b": n_words 2, n_alpha 2 -> 500000 + 5000 = 505000 (bucket 5)
    // "1 2 3": n_alpha 0 -> 0 + 7500 = 7500 (bucket 0)
    Seq((1L, "a b"), (2L, "1 2 3")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("p25_quality_prune_sweep")(s, dir)
      .orderBy("threshold_fx").collect()
    assert(r(0).getAs[Long]("n_docs_kept") == 2L)   // tau = 0
    assert(r(0).getAs[Long]("n_tokens_kept") == 5L)
    assert(r(1).getAs[Long]("n_docs_kept") == 1L)   // tau = 100000
    assert(r(5).getAs[Long]("n_docs_kept") == 1L)   // tau = 500000
    assert(r(6).getAs[Long]("n_docs_kept") == 0L)   // tau = 600000
    assert(r(1).getAs[Long]("token_share_ppm") == 400000L) // 2 of 5
  }
}

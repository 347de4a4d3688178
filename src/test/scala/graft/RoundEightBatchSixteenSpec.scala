package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch-16 specs (c07 cluster purity, p21 loader shards). */
class RoundEightBatchSixteenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("clusterPurity finds the planted majority on a hand fixture") {
    val s = spark; import s.implicits._
    // cell 0 (x-axis): labels 1,1,2 -> majority 1, purity 2/3;
    // cell 1 (y-axis): labels 3,3 -> purity 1
    val vecs = Seq(
      (1L, 1, Seq(1.0f, 0.0f)), (2L, 1, Seq(0.9f, 0.1f)),
      (3L, 2, Seq(0.95f, 0.05f)),
      (10L, 3, Seq(0.0f, 1.0f)), (11L, 3, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "label", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cents = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("cid", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = graft.llm.Clustering.clusterPurity(vecs, cents).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got(0L) === ((3L, 1, 2L, 666666L)))
    assert(got(1L) === ((2L, 3, 2L, 1000000L)))
  }

  test("c07 purity bookkeeping holds on the real table: majority <= " +
    "members, members sum to the corpus") {
    val rows = run("c07_cluster_purity").collect()
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1))
      assert(r.getLong(4) > 0 && r.getLong(4) <= 1000000L)
    }
    val total = rows.map(_.getLong(1)).sum
    assert(total === Catalog.t(spark, sf, "embeddings").count())
  }

  test("p21 deals p19's interleave round-robin: worker doc counts " +
    "differ by at most one and every doc lands exactly once") {
    val rows = run("p21_loader_shards").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))).toMap
    assert(rows.keySet === (0 until 8).toSet)
    val counts = rows.values.map(_._1)
    assert(counts.max - counts.min <= 1, counts.toString)
    assert(counts.sum === Catalog.t(spark, sf, "documents").count())
    // the token recomputation: per-worker totals add to the corpus mass
    val tokTotal = Catalog.t(spark, sf, "documents")
      .select(size(split(col("text"), " ")).cast("long")).collect()
      .map(_.getLong(0)).sum
    assert(rows.values.map(_._2).sum === tokTotal)
  }
}

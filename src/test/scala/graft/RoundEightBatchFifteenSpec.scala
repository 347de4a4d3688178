package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch-15 specs (s16 recall curve, sp32 cross-operator join). */
class RoundEightBatchFifteenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("s16 recall curve is monotone in matches and agrees with s04 at " +
    "k = 3") {
    val got = run("s16_recall_curve").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === Set(1, 3, 5))
    // the match set at larger k is a superset
    assert(got(1)._1 <= got(3)._1 && got(3)._1 <= got(5)._1)
    got.values.foreach { case (_, fx) => assert(fx >= 0 && fx <= 1000000) }
    // cross-operator consistency: s04 reports per-query matches of the
    // same exact-vs-LSH comparison at k = 3
    val s04 = run("s04_ann_recall").agg(sum(col("n_match"))).head.getLong(0)
    assert(got(3)._1 === s04)
  }

  test("sp32 joined cross-operator state equals the source-table join") {
    val counts = Catalog.t(spark, sf, "orders")
      .groupBy(col("o_custkey")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cents = Catalog.t(spark, sf, "customer")
      .select(col("c_custkey"),
        expr("cast(round(c_acctbal * 100) as bigint)")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = counts.keySet.intersect(cents.keySet)
      .map(k => k -> ((counts(k), cents(k)))).toMap
    val got = run("sp32_cross_operator_join").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === exp)
    assert(got.nonEmpty)
  }
}

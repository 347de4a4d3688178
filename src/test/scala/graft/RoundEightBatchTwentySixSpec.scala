package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch-26 specs (d27 template extraction, q65 supplier HHI).
  */
class RoundEightBatchTwentySixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ------------------------------------------------------------- d27

  test("templateSignatures finds the exact shared prefix/suffix of a " +
    "planted template family via the set-LCP identity") {
    val s = spark; import s.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("doc_id", "cluster_id")
    val docs = Seq(
      (1L, "HEADER alpha body one FOOTER"),
      (2L, "HEADER beta body two xx FOOTER"),
      (3L, "HEADER gamma other FOOTER"),
      (9L, "singleton"))
      .toDF("doc_id", "text")
    val got = graft.llm.Dedup.templateSignatures(labels, docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // shared prefix "HEADER " = 7 chars; shared suffix " FOOTER" = 7;
    // the singleton family (size 1) is absent
    assert(got === Map(1L -> ((3L, 7L, 7L))))
  }

  test("templateSignatures edge cases: identical members share " +
    "everything; disjoint members share nothing") {
    val s = spark; import s.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val docs = Seq(
      (1L, "same text"), (2L, "same text"),
      (5L, "aaaa"), (6L, "bbbb"))
      .toDF("doc_id", "text")
    val got = graft.llm.Dedup.templateSignatures(labels, docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((9L, 9L)))
    assert(got(5L) === ((0L, 0L)))
  }

  test("d27 on the real table: every family has >= 2 members and " +
    "signatures are bounded by the shortest member") {
    val rows = run("d27_template_extraction").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val sizes = run("d08_conn_components").groupBy(col("cluster_id"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (cid, n, pre, suf) =>
      assert(n === sizes(cid))
      assert(n >= 2)
      assert(pre >= 0 && suf >= 0)
    }
    // exactly the multi-member families are reported
    assert(rows.map(_._1).toSet === sizes.filter(_._2 >= 2).keySet)
  }

  // ------------------------------------------------------------- q65

  test("q65 HHI: shares and concentration reproduce from the raw " +
    "supplier revenue, and bounds hold") {
    val rows = run("q65_supplier_hhi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val sup = Catalog.t(spark, sf, "supplier")
      .join(Catalog.t(spark, sf, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rev = Catalog.t(spark, sf, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byNation = rev.groupBy(x => sup(x._1))
    rows.foreach { case (nation, nSupp, cents, hhi, top) =>
      val g = byNation(nation)
      assert(nSupp === g.length.toLong)
      val total = g.map(_._2).sum
      assert(cents === total)
      val shares = g.map(_._2 * 1000000L / total)
      assert(top === shares.max)
      assert(hhi === shares.map(s => s * s).sum / 1000000L)
      // HHI is between the uniform floor and the top-share ceiling
      assert(hhi <= 1000000L)
      assert(hhi >= top * top / 1000000L)
    }
  }
}

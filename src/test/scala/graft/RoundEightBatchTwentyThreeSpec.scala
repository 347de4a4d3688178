package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch-23 specs (s19 centroid drift, g12 incremental
  * components, t37 tokenizer fertility, i14 partition evolution).
  */
class RoundEightBatchTwentyThreeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ------------------------------------------------------------- s19

  test("centroidDrift is zero when centroids already sit at their " +
    "cluster means, and detects a planted displacement exactly") {
    val s = spark; import s.implicits._
    // two tight clusters whose means ARE the centroids -> drift 0
    val vecs = Seq(
      (1L, Array(1.0, 1.0)), (2L, Array(1.0, 1.0)),
      (3L, Array(-1.0, 5.0)), (4L, Array(-1.0, 5.0)))
      .toDF("vec_id", "embedding")
    val exact = Seq((0L, Array(1.0, 1.0)), (1L, Array(-1.0, 5.0)))
      .toDF("cid", "embedding")
    val zero = graft.llm.Clustering.centroidDrift(vecs, exact)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(zero === Map(0L -> 0L, 1L -> 0L))
    // displace centroid 0 by (0.3, 0.4): cosine still assigns the
    // first cluster to it; drift = 0.5 * 1e7, max shift = 0.4 * 1e7
    val off = Seq((0L, Array(0.7, 0.6)), (1L, Array(-1.0, 5.0)))
      .toDF("cid", "embedding")
    val got = graft.llm.Clustering.centroidDrift(vecs, off)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) === ((2L, 5000000L, 4000000L)))
    assert(got(1L) === ((2L, 0L, 0L)))
  }

  test("s19 on the real table: every centroid reports full dimensions " +
    "and drift respects the max-shift sandwich") {
    val rows = run("s19_centroid_drift").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nMembers, nDims, drift, maxShift) =>
      assert(nMembers > 0)
      assert(nDims === 64L)
      // L2 over 64 dims: maxShift <= drift <= maxShift * 8
      assert(drift >= maxShift)
      assert(drift <= maxShift * 8)
    }
  }

  // ------------------------------------------------------------- g12

  test("g12 on the real table: arrivals report only base components, " +
    "links are real edges, and merge counts are consistent") {
    val rows = run("g12_incremental_components").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (docId, nLinks, nComps, mergedInto) =>
      assert(docId % 10 === 0, s"non-arrival $docId in report")
      assert(nLinks >= 1)
      assert(nComps >= 1 && nComps <= nLinks)
      assert(mergedInto % 10 !== 0, "component label must be a base doc")
    }
    // at least one arrival merges two existing families on this corpus
    // (simhash template families straddle the 1-in-10 split)
    assert(rows.exists(_._3 >= 2), "no merging arrival found")
  }

  test("g12 merge counts agree with full-graph components: any two " +
    "base components an arrival links must share its full-graph label") {
    val inc = run("g12_incremental_components").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val full = run("d08_conn_components").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // every reported arrival is connected in the FULL graph to the
    // component it merged into — sanity: the arrival's full label
    // exists and is <= its own id (labels are min ids)
    inc.foreach { case (docId, _) =>
      assert(full.contains(docId))
      assert(full(docId) <= docId)
    }
  }

  // ------------------------------------------------------------- t37

  test("t37 fertility: every language covered, fertility >= 1 token " +
    "per word, totals reconcile with t18's per-doc encoding") {
    val rows = run("t37_tokenizer_fertility").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 5)
    rows.foreach { case (_, nWords, nTokens, fert) =>
      assert(nTokens >= nWords) // a word is at least one BPE token
      assert(fert >= 1000000L)
      assert(fert === nTokens * 1000000L / nWords)
    }
    val t18 = run("t18_bpe_encode").agg(
      sum(col("n_words")), sum(col("n_bpe_tokens"))).collect()(0)
    assert(rows.map(_._2).sum === t18.getLong(0))
    assert(rows.map(_._3).sum === t18.getLong(1))
  }

  // ------------------------------------------------------------- i14

  test("i14 evolution conserves rows and cents through both layout " +
    "rewrites and the monthly lake is really month-partitioned") {
    val rows = run("i14_partition_evolution").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = Catalog.t(spark, sf, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM").as("m"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100) as bigint)")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.sortBy(_._1).toSeq === expect.sortBy(_._1).toSeq)
    // the monthly lake on disk has month= partition directories
    import scala.jdk.CollectionConverters._
    val tmpRoot = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val d = java.nio.file.Files.list(tmpRoot).iterator().asScala
      .filter(_.getFileName.toString.startsWith("graft-i14-monthly"))
      .toSeq.sortBy(p =>
        java.nio.file.Files.getLastModifiedTime(p).toMillis).lastOption
    assert(d.isDefined)
    val parts = java.nio.file.Files.list(d.get).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("month=")).toSeq
    assert(parts.nonEmpty, "no month= partition dirs")
    assert(parts.map(_.stripPrefix("month=")).sorted ===
      rows.map(_._1).sorted.toSeq)
  }
}

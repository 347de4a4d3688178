package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 batch-2 operator laws: q69 decile lift conservation, d23
  * boilerplate-prefix dedup fixture, t41 cross-source vocabulary
  * overlap exactness.
  */
class RoundNineBatchTwoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q69 deciles partition every customer and conserve revenue") {
    val s = spark
    val rows = SparkEntry.queries("q69_decile_lift")(s, sf)
      .orderBy("decile").collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    val orders = Catalog.t(s, sf, "orders")
    val nCust = orders.select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    val totalCents = orders
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")))
      .collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("revenue_cents")).sum == totalCents)
    // the gain curve is a cumulative share: nondecreasing, ends at 1e6,
    // and the top decile out-earns the bottom one (sorted-by-value cut)
    val ppm = rows.map(_.getAs[Long]("cum_revenue_ppm"))
    assert(ppm.zip(ppm.tail).forall { case (a, b) => a <= b })
    assert(ppm.last == 1000000L)
    assert(rows.head.getAs[Long]("revenue_cents") >=
      rows.last.getAs[Long]("revenue_cents"))
  }

  test("d23 catches shared openings across whitespace variants and " +
    "ignores singletons") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-d23-fixture")
    val header = Seq.fill(20)("shared boilerplate header").mkString(" ")
    Seq(
      (1L, header + " alpha body one", "srcA"),
      // same opening, tab/newline whitespace + case variants: must fold
      (2L, header.toUpperCase.replace(" ", "\t") + "\nbeta body two", "srcB"),
      (3L, "a unique document with its own opening line", "srcA"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("d23_prefix_dup")(s, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_docs") == 2L)
    assert(r.head.getAs[Long]("canonical_id") == 1L)
    assert(r.head.getAs[Long]("n_sources") == 2L)
    assert(r.head.getAs[String]("prefix").length == 80)
  }

  test("t41 computes exact pairwise vocabulary jaccard and emits only " +
    "overlapping ordered pairs") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-t41-fixture")
    Seq(
      (1L, "a b c", "srcA"), (2L, "c b", "srcA"),   // vocab {a,b,c}
      (3L, "b c d", "srcB"),                        // vocab {b,c,d}
      (4L, "x y z", "srcC"))                        // disjoint vocab
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("t41_source_vocab_overlap")(s, dir).collect()
    assert(r.length == 1) // srcC shares nothing -> no pair rows
    val row = r.head
    assert(row.getAs[String]("src_a") == "srcA")
    assert(row.getAs[String]("src_b") == "srcB")
    assert(row.getAs[Long]("n_shared") == 2L)     // {b, c}
    assert(row.getAs[Long]("jaccard_ppm") == 500000L) // 2 / 4
  }

  test("t41 jaccard stays within [0, 1e6] on the sf corpus") {
    val r = SparkEntry.queries("t41_source_vocab_overlap")(spark, sf)
      .collect()
    assert(r.nonEmpty)
    assert(r.forall { x =>
      val p = x.getAs[Long]("jaccard_ppm"); p >= 0L && p <= 1000000L })
    assert(r.forall(x =>
      x.getAs[String]("src_a") < x.getAs[String]("src_b")))
  }
}

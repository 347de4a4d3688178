package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operator specs (q68 referential-integrity audit). The
  * sf corpora are referentially CLEAN, so the oracle row only proves
  * the zero-defect path — this fixture plants one of each defect class
  * and asserts the audit counts them exactly.
  */
class RoundNineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q68 integrity audit counts each planted defect class exactly") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-q68-fixture")
    // customer 99 is missing (dangling FK from order 12); order 11 has
    // zero lineitems; order key 999 has lineitems but no order (orphans)
    Seq(1L, 2L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 1L), (11L, 2L), (12L, 99L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    (Seq.fill(3)(10L) ++ Seq.fill(2)(12L) ++ Seq.fill(4)(999L))
      .toDF("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val r = SparkEntry.queries("q68_integrity_audit")(s, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_orders") == 3L)
    assert(row.getAs[Long]("n_lineitems") == 9L)
    assert(row.getAs[Long]("n_orphan_lines") == 4L)
    assert(row.getAs[Long]("n_empty_orders") == 1L)
    assert(row.getAs[Long]("max_lines_per_order") == 4L)
    assert(row.getAs[Long]("n_dangling_cust") == 1L)
  }

  test("q68 conserves against direct table counts on the sf corpus") {
    val sf = "/root/testdata/sf0.001"
    val row = SparkEntry.queries("q68_integrity_audit")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_orders") ==
      Catalog.t(spark, sf, "orders").count())
    assert(row.getAs[Long]("n_lineitems") ==
      Catalog.t(spark, sf, "lineitem").count())
    // the driver corpus is referentially clean: the audit must say so
    assert(row.getAs[Long]("n_orphan_lines") == 0L)
    assert(row.getAs[Long]("n_dangling_cust") == 0L)
  }
}

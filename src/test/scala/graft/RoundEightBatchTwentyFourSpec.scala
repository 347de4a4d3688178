package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch-24 specs (d26 dedup-method agreement, q62 ABC/Pareto
  * classes, q63 basket affinity).
  */
class RoundEightBatchTwentyFourSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ------------------------------------------------------------- d26

  test("d26 agreement counts reconcile exactly with the d02 and d05 " +
    "pair relations") {
    val r = run("d26_method_agreement").collect()(0)
    val both = r.getAs[Long]("n_both")
    val mOnly = r.getAs[Long]("n_minhash_only")
    val sOnly = r.getAs[Long]("n_simhash_only")
    val mh = run("d02_minhash_lsh").select("doc_a", "doc_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val sh = run("d05_simhash_pairs").select("doc_a", "doc_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(both === mh.intersect(sh).size.toLong)
    assert(mOnly === mh.diff(sh).size.toLong)
    assert(sOnly === sh.diff(mh).size.toLong)
    val union = (both + mOnly + sOnly)
    assert(r.getAs[Long]("jaccard_fx") === both * 1000000L / union)
  }

  // ------------------------------------------------------------- q62

  test("q62 classes partition all parts, conserve the revenue total, " +
    "and respect the 70/90 cumulative boundaries") {
    val rows = run("q62_abc_analysis").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.keySet === Set("A", "B", "C"))
    val li = Catalog.t(spark, sf, "lineitem")
    val nParts = li.select("l_partkey").distinct().count()
    assert(rows.values.map(_._1).sum === nParts)
    val total = li.agg(
      sum(expr("cast(round(l_extendedprice * 100) as bigint)")))
      .collect()(0).getLong(0)
    assert(rows.values.map(_._2).sum === total)
    // A holds at most 70% + one part's worth; A+B at most 90% + one
    assert(rows("A")._2 * 10 <= total * 7 + rows.values.map(_._2).max * 10)
    // per-class share_fx is the exact integer ratio
    rows.values.foreach { case (_, cents, share) =>
      assert(share === cents * 1000000L / total)
    }
    // Pareto shape: A parts are fewer than C parts on this corpus
    assert(rows("A")._1 < rows("C")._1 ||
      rows("A")._2 > rows("C")._2)
  }

  // ------------------------------------------------------------- q63

  test("q63 pairs are real co-orders with exact supports and lift") {
    val rows = run("q63_basket_affinity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_._7).sorted.toSeq === (1 to rows.length))
    val op = Catalog.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byPart = op.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byOrder = op.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nOrders = byOrder.size.toLong
    rows.foreach { case (a, b, sAb, sA, sB, lift, _) =>
      assert(a < b)
      assert(sA === byPart(a)); assert(sB === byPart(b))
      val co = byOrder.values.count(s => s.contains(a) && s.contains(b))
      assert(sAb === co.toLong)
      assert(sAb >= 2)
      assert(lift === nOrders * sAb * 1000000L / (sA * sB))
    }
    // support ordering is respected
    rows.sortBy(_._7).map(_._3).sliding(2)
      .foreach(p => if (p.length == 2) assert(p(0) >= p(1)))
  }
}

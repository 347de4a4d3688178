package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch-28 specs (t40 OOV rate, q66 activity gaps). */
class RoundEightBatchTwentyEightSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ------------------------------------------------------------- t40

  test("t40 OOV mass replays exactly from the raw train/eval token " +
    "streams") {
    val rows = run("t40_oov_rate").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val docs = Catalog.t(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val trainVocab = docs.filter(_._1 % 10 != 9)
      .flatMap(_._3.split(" ")).toSet
    val evalToks = docs.filter(_._1 % 10 == 9)
      .flatMap(d => d._3.split(" ").map(w => (d._2, w)))
    val expect = evalToks.groupBy(_._1).map { case (l, ts) =>
      val oov = ts.count(t => !trainVocab.contains(t._2)).toLong
      l -> ((ts.length.toLong, oov, oov * 1000000L / ts.length))
    }
    assert(rows === expect)
    rows.values.foreach { case (n, oov, fx) =>
      assert(oov <= n); assert(fx <= 1000000L)
    }
  }

  test("t40 on a fixture where the eval split introduces a new word") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma", "en"),
      (1L, "alpha beta", "en"),
      (9L, "alpha NOVEL beta NOVEL", "en")) // 2 of 4 eval tokens OOV
      .toDF("doc_id", "text", "lang")
    val dir = TempDirs.create("graft-t40-fix")
    docs.withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(dir, "documents.parquet").toString)
    val got = SparkEntry.queries("t40_oov_rate")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("en", 4L, 2L, 500000L)))
  }

  // ------------------------------------------------------------- q66

  test("q66 gaps reconcile with the raw per-user event times") {
    val rows = run("q66_activity_gaps").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val byUser = Catalog.t(spark, sf, "events")
      .select(col("user_id"), unix_millis(col("ts")).as("ms")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    assert(rows.keySet === byUser.keySet)
    byUser.foreach { case (u, evs) =>
      val ms = evs.map(_._2).sorted
      val gaps = ms.sliding(2).collect { case Array(a, b) => b - a }.toSeq
      val (n, maxGap, nLong) = rows(u)
      assert(n === ms.length.toLong)
      assert(maxGap === (if (gaps.isEmpty) 0L else gaps.max))
      assert(nLong === gaps.count(_ > 3600000L).toLong)
    }
  }
}

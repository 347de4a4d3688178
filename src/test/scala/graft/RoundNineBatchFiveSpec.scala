package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 batch-5 laws: q70 path mining, t42 RAKE arithmetic, sp36
  * compaction conservation.
  */
class RoundNineBatchFiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q70 paths partition users, cap at 12 steps, and use only " +
    "event-type initials") {
    val s = spark
    val rows = SparkEntry.queries("q70_event_paths")(s, sf).collect()
    val nUsers = Catalog.t(s, sf, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers)
    val initials = Set('s', 'e', 'c', 'v', 'p')
    assert(rows.forall { r =>
      val p = r.getAs[String]("path")
      p.length <= 12 && p.forall(initials.contains) })
  }

  test("q70 mines a hand-built journey with the funnel flag set right") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-q70-fixture")
    // user 1: view, click, purchase (converts); user 2: error, signup
    Seq(
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "click"),
      (3L, 3000L, 1L, "purchase"),
      (4L, 1000L, 2L, "error"), (5L, 2000L, 2L, "signup"))
      .map { case (id, ms, u, t) =>
        (id, new java.sql.Timestamp(ms), u, t, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q70_event_paths")(s, dir).collect()
      .map(x => x.getAs[String]("path") ->
        (x.getAs[Long]("n_users"), x.getAs[Boolean]("matches_funnel")))
      .toMap
    assert(r == Map("vcp" -> (1L, true), "es" -> (1L, false)))
  }

  test("t42 scores the classic RAKE example exactly") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-t42-fixture")
    // "of" is an en stopword: phrases are "deep learning" and
    // "deep models". freq(deep)=2 deg(deep)=4 -> wscore 2e6; the
    // singletons score deg 2 freq 1 -> 2e6. Both phrases sum 4e6.
    Seq((1L, "deep learning of deep models"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("t42_rake_keywords")(s, dir)
      .orderBy("rank").collect()
    assert(r.length == 2)
    assert(r.map(_.getAs[String]("phrase")).toSeq ==
      Seq("deep learning", "deep models")) // equal scores, lexicographic
    assert(r.forall(_.getAs[Long]("score_fx") == 4000000L))
    assert(r.forall(_.getAs[Long]("n_words") == 2L))
    assert(r.forall(_.getAs[Long]("freq") == 1L))
  }

  test("t42 caps at 20 ranked phrases in strict score order on the " +
    "sf corpus") {
    val rows = SparkEntry.queries("t42_rake_keywords")(spark, sf)
      .orderBy("rank").collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 20))
    val fx = rows.map(_.getAs[Long]("score_fx"))
    assert(fx.zip(fx.tail).forall { case (a, b) => a >= b })
  }

  test("sp36 compaction preserves the chain's net state exactly") {
    val s = spark
    val got = SparkEntry.queries("sp36_checkpoint_compaction")(s, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = Catalog.t(s, sf, "orders").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = base.collect {
      case (k, v) if k < 60 => k -> v * 4
      case (k, v) if k < 120 => k -> v * 2
      case (k, v) if k < 300 || k >= 400 => k -> v
    }
    assert(got == want)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch-18 specs (g09 k-core peel, t33 Kneser-Ney bigram LM,
  * q59 first-touch attribution, i12 gzip JSONL ingest).
  */
class RoundEightBatchEighteenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ------------------------------------------------------------- g09

  test("kCorePeelProfile peels a path in two rounds and never touches " +
    "a clique (hand-computed fixture)") {
    val s = spark; import s.implicits._
    // path 1-2-3-4 (peels from the ends inward at k=2) + 4-clique 5..8
    val nodes = (1L to 8L).toDF("id")
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L))
      .toDF("src", "dst")
    val got = graft.llm.GraphAlgs.kCorePeelProfile(nodes, edges, 2, 3)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      1 -> ((2L, 6L)), // endpoints 1, 4 fall
      2 -> ((2L, 4L)), // 2, 3 follow once the ends are gone
      3 -> ((0L, 4L)))) // the clique is a 2-core: stable
  }

  test("g09 on the real table: counts chain exactly (removed + " +
    "remaining = previous remaining, starting at the corpus)") {
    val rows = run("g09_kcore_peel").orderBy(col("round")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === Seq(1, 2, 3))
    val n = Catalog.t(spark, sf, "documents").count()
    var prev = n
    rows.foreach { case (_, removed, remaining) =>
      assert(removed + remaining === prev)
      assert(removed >= 0 && remaining >= 0)
      prev = remaining
    }
    // peeling is monotone: each round removes no more than the last
    assert(rows(1)._2 <= rows(0)._2 + rows(0)._3)
  }

  // ------------------------------------------------------------- t33

  test("t33 matches a plain-Scala Kneser-Ney reference on a fixture " +
    "where backoff flips the argmax away from raw counts") {
    val s = spark; import s.implicits._
    // after 'a': 'b' twice, 'c' twice (tie on counts) — but 'c' follows
    // more distinct contexts, so continuation backoff breaks the tie
    val docs = Seq(
      (1L, "a b x a b y"),
      (2L, "a c z a c w"),
      (3L, "d c e f c g"))
      .toDF("doc_id", "text")
    // plain-Scala KN with the operator's formula
    val bigrams = Seq(
      "a b x a b y", "a c z a c w", "d c e f c g")
      .flatMap(t => t.split(" ").sliding(2).map(p => (p(0), p(1))))
    val c = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = c.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val rtypes = c.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val ltypes = c.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val ttypes = c.size.toLong
    def pkn(w1: String, w2: String): Double = {
      val cnt = c((w1, w2)).toDouble
      math.max(cnt - 0.75, 0) / tot(w1).toDouble +
        (0.75 * rtypes(w1).toDouble / tot(w1).toDouble) *
          (ltypes(w2).toDouble / ttypes.toDouble)
    }
    val expected = c.keys.groupBy(_._1).map { case (w1, ks) =>
      val best = ks.map { case (_, w2) => (w2, pkn(w1, w2)) }
        .minBy { case (w2, p) => (-p, w2) }
      w1 -> best
    }
    val byName = SparkEntry.queries("t33_kneser_ney")
    // run the operator body over the fixture through a temp dir
    val dir = TempDirs.create("graft-t33-fix")
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(dir, "documents.parquet").toString)
    val res = byName(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getDouble(3)))).toMap
    assert(res.keySet === expected.keySet)
    expected.foreach { case (w1, (w2, p)) =>
      assert(res(w1)._1 === w2, s"argmax after '$w1'")
      assert(math.abs(res(w1)._2 - p) < 1e-12)
    }
    // the designed tie-flip: after 'a', counts tie (b:2, c:2) but KN
    // prefers 'c' (3 left contexts vs 1)
    assert(res("a")._1 === "c")
  }

  // ------------------------------------------------------------- q59

  test("q59 attributes a hand-built session log to the right entry " +
    "channels") {
    // user 1: [view, click, purchase] one session -> entry view, conv
    // user 1: later [click] second session -> entry click, no conv
    // user 2: [purchase] -> entry purchase, conv
    val s = spark; import s.implicits._
    val h = 3600000L // > 30-min gap
    val rows = Seq(
      (1L, 1L, "view", 0L), (2L, 1L, "click", 60000L),
      (3L, 1L, "purchase", 120000L),
      (4L, 1L, "click", 120000L + 2 * h),
      (5L, 2L, "purchase", 50L))
      .toDF("event_id", "user_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
      .select("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val dir = TempDirs.create("graft-q59-fix")
    rows.coalesce(1).write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(dir, "events.parquet").toString)
    val got = SparkEntry.queries("q59_attribution")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      "view" -> ((1L, 1L)), "click" -> ((1L, 0L)),
      "purchase" -> ((1L, 1L))))
  }

  test("q59 on the real table: session mass equals q47's inventory and " +
    "conversion is a valid rate") {
    val q59 = run("q59_attribution").collect()
    val nSessions = run("q47_batch_sessions").count()
    assert(q59.map(_.getLong(1)).sum === nSessions)
    q59.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
    }
  }

  // ------------------------------------------------------------- i12

  test("i12 writes actual .gz parts and the compressed roundtrip " +
    "preserves the corpus exactly") {
    val got = run("i12_gzip_jsonl").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expect = Catalog.t(spark, sf, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("n_chars").as("c"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expect)
    // the write really was gzip: at least one .json.gz part on disk
    val tmpRoot = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"))
    // the temp dir prefix is graft-i12; look inside the newest one
    import scala.jdk.CollectionConverters._
    val d = java.nio.file.Files.list(tmpRoot).iterator().asScala
      .filter(_.getFileName.toString.startsWith("graft-i12"))
      .toSeq.sortBy(p =>
        java.nio.file.Files.getLastModifiedTime(p).toMillis).lastOption
    assert(d.isDefined, "i12 temp dir missing")
    val parts = java.nio.file.Files.list(d.get).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(parts.exists(_.endsWith(".json.gz")), parts.toString)
  }
}

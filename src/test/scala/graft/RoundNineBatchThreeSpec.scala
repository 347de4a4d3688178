package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 batch-3 laws: st24 upsert-sink merge algebra (batching
  * insensitivity + replay idempotency), i17 fixed-width layout
  * invariants, i18 JSON-array shard fidelity.
  */
class RoundNineBatchThreeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def eventRows(n: Int) = {
    val s = spark; import s.implicits._
    (1 to n).map(i => (i.toLong % 7, i.toLong, s"t${i % 3}",
      (i * 101L) % 9999, 1000L + (i * 37L) % 500))
      .toDF("user_id", "event_id", "event_type", "cents", "ms")
  }

  private def snapshot(base: String, v: Long) =
    spark.read.parquet(s"$base/v$v")
      .select(col("user_id"), col("n_events"),
        col("last.event_type").as("last_type"),
        col("last.cents").as("last_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getLong(3))).toSet

  test("st24 merge is batching-insensitive: one batch of 40 == " +
    "batches of 25 + 15") {
    val all = eventRows(40)
    val oneShot = TempDirs.create("graft-st24-one")
    val split = TempDirs.create("graft-st24-split")
    val w1 = graft.streaming.StreamingQueries.upsertSnapshotWriter(oneShot)
    w1(all, 0L)
    val w2 = graft.streaming.StreamingQueries.upsertSnapshotWriter(split)
    w2(all.filter(col("event_id") <= 25), 0L)
    w2(all.filter(col("event_id") > 25), 1L)
    assert(snapshot(oneShot, 0L) == snapshot(split, 1L))
  }

  test("st24 replayed batch rebuilds the identical snapshot version " +
    "(exactly-once without a transactional sink)") {
    val base = TempDirs.create("graft-st24-replay")
    val w = graft.streaming.StreamingQueries.upsertSnapshotWriter(base)
    val all = eventRows(30)
    w(all.filter(col("event_id") <= 20), 0L)
    w(all.filter(col("event_id") > 20), 1L)
    val before = snapshot(base, 1L)
    w(all.filter(col("event_id") > 20), 1L) // replay of batch 1
    assert(snapshot(base, 1L) == before)
  }

  test("st24 last-row pick is the true (ts, event_id)-argmax per user") {
    val rows = SparkEntry.queries("st24_stream_upsert_sink")(spark, sf)
      .collect()
    val events = Catalog.t(spark, sf, "events")
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id"), col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .collect()
      .groupBy(_.getLong(0))
    assert(rows.length == events.size)
    rows.foreach { r =>
      val grp = events(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") == grp.length)
      val last = grp.maxBy(e => (e.getLong(1), e.getLong(2)))
      assert(r.getAs[String]("last_type") == last.getString(3))
      assert(r.getAs[Long]("last_cents") == last.getLong(4))
    }
  }

  test("i17 fixed-width lines are constant-length byte ranges") {
    val s = spark
    // the writer's layout: 12 + 12 + 1 + 14 + 10 = 49 chars per record
    val line = Catalog.t(s, sf, "orders").limit(50)
      .select(format_string("%012d%012d%s%014d%s",
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        expr("cast(round(o_totalprice * 100) as bigint)"),
        date_format(col("o_orderdate"), "yyyy-MM-dd")).as("v"))
      .collect().map(_.getString(0))
    assert(line.forall(_.length == 49))
    // zero-padded numerics parse back exactly
    assert(line.forall(l => l.take(12).forall(_.isDigit)))
  }

  test("i18 JSON-array shards preserve every row and hostile text") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-i18-fixture")
    Seq(
      (1L, "plain text", "en", "srcA", 10L),
      (2L, "quotes \" and \\ backslash", "en", "srcA", 24L),
      (3L, "newline\nand\ttab", "fr", "srcB", 15L),
      (4L, "unicode é中😀 brackets []{}", "fr", "srcB", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("i18_json_array_roundtrip")(s, dir)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("en" -> 2L, "fr" -> 2L))
  }
}

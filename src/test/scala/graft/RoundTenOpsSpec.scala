package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 operator laws: st25 snapshot-vacuum retention semantics on
  * a hand-computed fixture, replay determinism of the version chain,
  * and the prefix-correctness of every priced version.
  */
class RoundTenOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("st25 prices a hand-computed chain and vacuums exactly v0/v1") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-st25-fixture")
    val baseUs = 1704067200000000L // 2024-01-01T00:00Z in micros
    // event_id % 4 = batch: b0 = {0, 4}, b1 = {1}, b2 = {2}, b3 = {3}
    //   users: u1 sends events 0, 1, 2 — present from v0 on
    //          u2 sends events 4 (b0) and 3 (b3)
    // version stats (cumulative over batches 0..b):
    //   v0: events {0, 4}       -> 2 keys, 2 events
    //   v1: events {0, 4, 1}    -> 2 keys, 3 events
    //   v2: + {2}               -> 2 keys, 4 events
    //   v3: + {3}               -> 2 keys, 5 events
    Seq(
      (0L, baseUs, 1L, "click", 1.0, "{}"),
      (1L, baseUs + 1000000L, 1L, "view", 2.0, "{}"),
      (2L, baseUs + 2000000L, 1L, "click", 3.0, "{}"),
      (3L, baseUs + 3000000L, 2L, "buy", 4.0, "{}"),
      (4L, baseUs + 4000000L, 2L, "view", 5.0, "{}"))
      .toDF("event_id", "tsu", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("timestamp_micros(tsu)")).drop("tsu")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("st25_snapshot_vacuum")(s, dir)
      .orderBy("version").collect()
      .map(r => (r.getAs[Long]("version"), r.getAs[Long]("n_keys"),
        r.getAs[Long]("total_events"), r.getAs[String]("status")))
    assert(rows.toSeq == Seq(
      (0L, 2L, 2L, "vacuumed"), (1L, 2L, 3L, "vacuumed"),
      (2L, 2L, 4L, "retained"), (3L, 2L, 5L, "retained")))
  }

  test("st25 version chain is replay-deterministic: a second build " +
    "prices identically") {
    val s = spark
    def run() = SparkEntry.queries("st25_snapshot_vacuum")(s, sf)
      .orderBy("version").collect().map(_.toSeq).toSeq
    assert(run() == run())
  }

  test("st25 report is a correct cumulative prefix at every version") {
    val s = spark
    val ev = Catalog.t(s, sf, "events")
    val rows = SparkEntry.queries("st25_snapshot_vacuum")(s, sf)
      .orderBy("version").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val v = r.getAs[Long]("version")
      val prefix = ev.filter(col("event_id") % 4 <= v)
      assert(r.getAs[Long]("total_events") == prefix.count(),
        s"v$v total_events")
      assert(r.getAs[Long]("n_keys") ==
        prefix.select("user_id").distinct().count(), s"v$v n_keys")
    }
    // monotone: versions only accumulate
    val tot = rows.map(_.getAs[Long]("total_events"))
    assert(tot.zip(tot.tail).forall { case (a, b) => a <= b })
  }
}

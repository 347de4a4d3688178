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
    // pmod(event_id, 4) = batch: b0 = {0, 4}, b1 = {1, -3}, b2 = {2},
    // b3 = {3} — the NEGATIVE id lands in slice 1 on BOTH sides
    // (pmod in Spark, ((x%4)+4)%4 in the oracle); with Spark's plain %
    // it would fall out of every slice and vanish from the chain.
    //   users: u1 sends events 0, 1, 2; u2 sends 4 and 3; u3 sends -3
    // version stats (cumulative over batches 0..b):
    //   v0: events {0, 4}         -> 2 keys, 2 events
    //   v1: events {0, 4, 1, -3}  -> 3 keys, 4 events
    //   v2: + {2}                 -> 3 keys, 5 events
    //   v3: + {3}                 -> 3 keys, 6 events
    Seq(
      (0L, baseUs, 1L, "click", 1.0, "{}"),
      (1L, baseUs + 1000000L, 1L, "view", 2.0, "{}"),
      (2L, baseUs + 2000000L, 1L, "click", 3.0, "{}"),
      (3L, baseUs + 3000000L, 2L, "buy", 4.0, "{}"),
      (4L, baseUs + 4000000L, 2L, "view", 5.0, "{}"),
      (-3L, baseUs + 5000000L, 3L, "view", 6.0, "{}"))
      .toDF("event_id", "tsu", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("timestamp_micros(tsu)")).drop("tsu")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("st25_snapshot_vacuum")(s, dir)
      .orderBy("version").collect()
      .map(r => (r.getAs[Long]("version"), r.getAs[Long]("n_keys"),
        r.getAs[Long]("total_events"), r.getAs[String]("status")))
    assert(rows.toSeq == Seq(
      (0L, 2L, 2L, "vacuumed"), (1L, 3L, 4L, "vacuumed"),
      (2L, 3L, 5L, "retained"), (3L, 3L, 6L, "retained")))
  }

  test("st25 version chain is replay-deterministic: a second build " +
    "prices identically") {
    val s = spark
    def run() = SparkEntry.queries("st25_snapshot_vacuum")(s, sf)
      .orderBy("version").collect().map(_.toSeq).toSeq
    assert(run() == run())
  }

  test("d28 flags a planted benchmark leak and tie-breaks by id") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-d28-fixture")
    import TestVectors.axes
    // probes = vec_id % 97 == 0 → {0, 97}. Corpus:
    //   1: EXACT copy of probe 0 (cos 1.0)        → probe 0 contaminated
    //   2: same direction as probe 0, scaled      → cos 1.0 TIE with 1;
    //      best_match must pick the LOWER id (1)
    //   3: orthogonal to everything probe-visible
    //   probe 97 is axis e7: nearest is 3 at cos 0 < 0.5 → clean
    Seq(
      (0L, axes(5 -> 1.0)), (97L, axes(7 -> 1.0)),
      (1L, axes(5 -> 1.0)), (2L, axes(5 -> 2.0)), (3L, axes(9 -> 1.0)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = SparkEntry.queries("d28_semantic_contamination")(s, dir)
      .collect().map(x => x.getAs[Long]("probe_id") ->
        (x.getAs[Long]("best_match_id"), x.getAs[Boolean]("contaminated")))
      .toMap
    assert(r.keySet == Set(0L, 97L))
    assert(r(0L) == (1L, true), s"planted leak missed: ${r(0L)}")
    assert(!r(97L)._2, s"clean probe flagged: ${r(97L)}")
  }

  test("d28 drops zero- and NaN-norm corpus vectors instead of letting " +
    "them steal every probe's rank-1 slot") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-d28-poison")
    import TestVectors.axes
    // Corpus poison: vec 2 is the all-zeros vector (norm 0 → guard
    // cosine 0), vec 3 carries a NaN component (norm NaN → cosine NaN;
    // both engines rank NaN ABOVE every real number, so an unfiltered
    // NaN vector becomes EVERY probe's best match and flags the whole
    // probe set). The corpus-side finite-positive-norm filter must
    // leave only {1, 4}: probe 0 matches its planted dup 1 (cos 1.0,
    // contaminated), probe 97 sees two cos-0 candidates and stays
    // clean on the lower-id tiebreak.
    val nanVec = {
      val a = Array.fill(64)(0f); a(11) = Float.NaN; a
    }
    Seq(
      (0L, axes(5 -> 1.0)), (97L, axes(7 -> 1.0)),
      (1L, axes(5 -> 1.0)), (2L, Array.fill(64)(0f)),
      (3L, nanVec), (4L, axes(9 -> 1.0)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = SparkEntry.queries("d28_semantic_contamination")(s, dir)
      .collect().map(x => x.getAs[Long]("probe_id") ->
        (x.getAs[Long]("best_match_id"), x.getAs[Boolean]("contaminated")))
      .toMap
    assert(r.keySet == Set(0L, 97L))
    assert(r(0L) == (1L, true), s"planted leak missed: ${r(0L)}")
    assert(r(97L) == (1L, false),
      s"zero/NaN vector leaked into the ranking: ${r(97L)}")
  }

  test("i19 restart ingests exactly the unlanded shards, once") {
    val s = spark
    val rows = SparkEntry.queries("i19_resumable_ingest")(s, sf)
      .orderBy("shard_id").collect()
    // 8 shards, each exactly once, session split at shard 4
    assert(rows.map(_.getAs[Long]("shard_id")).toSeq == (0L to 7L))
    rows.foreach { r =>
      val sid = r.getAs[Long]("shard_id")
      assert(r.getAs[Int]("session") == (if (sid < 4) 0 else 1))
    }
    // manifest row counts reconcile with the source table
    val expect = Catalog.t(s, sf, "documents")
      .groupBy((org.apache.spark.sql.functions.col("doc_id") % 8)
        .as("shard_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") ==
        expect(r.getAs[Long]("shard_id")), s"shard ${r.getAs[Long]("shard_id")}")
    }
  }

  test("p26 classifies a hand-computed four-way diff exactly") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-p26-fixture")
    // ids picked to hit every status class:
    //   1: in both, text identical                 -> unchanged
    //   2: 2 % 13 == 2 -> v_new revises the text   -> changed
    //   3: 3 % 17 == 3 -> absent from v_old        -> added
    //   7: 7 % 17 == 7 -> absent from v_new        -> removed
    //  54: 54 % 17 == 3 AND 54 % 13 == 2 -> added (the revision applies
    //      to a doc v_old never had: still 'added', never 'changed')
    Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (7L, "delta"),
      (54L, "epsilon"))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("p26_corpus_version_diff")(s, dir)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        x.getAs[String]("status")).toMap
    assert(r == Map(1L -> "unchanged", 2L -> "changed", 3L -> "added",
      7L -> "removed", 54L -> "added"))
    // the changed doc's hashes differ; the unchanged doc's agree
    val rows = SparkEntry.queries("p26_corpus_version_diff")(s, dir)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(rows(2L).getAs[Long]("old_hash") != rows(2L).getAs[Long]("new_hash"))
    assert(rows(1L).getAs[Long]("old_hash") == rows(1L).getAs[Long]("new_hash"))
  }

  test("q71 sketch quantiles land in the bucket holding the exact " +
    "order statistic") {
    val s = spark
    import org.apache.spark.sql.functions._
    val ev = Catalog.t(s, sf, "events")
      .select(col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
    val rows = SparkEntry.queries("q71_sketch_quantiles")(s, sf).collect()
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val vals = ev.filter(col("event_type") === et)
        .orderBy("cents").collect().map(_.getLong(1))
      Seq(50 -> "p50_bucket", 95 -> "p95_bucket", 99 -> "p99_bucket")
        .foreach { case (p, c) =>
          val k = (vals.length * p + 99) / 100 // ceil rank, 1-based
          val exact = vals(k - 1)
          assert(r.getAs[Long](c) == exact / 100,
            s"$et $c: bucket ${r.getAs[Long](c)} vs exact unit ${exact / 100}")
        }
      assert(r.getAs[Long]("n_events") == vals.length)
    }
  }

  test("q71 prices a hand-computed distribution into the right buckets") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-q71-fixture")
    val baseUs = 1704067200000000L
    // one type, values 1.00..10.00: n=10, ceil-ranks 5/10/10 → the
    // 5th/10th/10th order statistics sit in units 5 and 10
    (1 to 10).map(i => (i.toLong, baseUs + i * 1000000L, i.toLong % 3,
        "click", i.toDouble, "{}"))
      .toDF("event_id", "tsu", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(tsu)")).drop("tsu")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q71_sketch_quantiles")(s, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_events") == 10L)
    assert(r.head.getAs[Long]("p50_bucket") == 5L)
    assert(r.head.getAs[Long]("p95_bucket") == 10L)
    assert(r.head.getAs[Long]("p99_bucket") == 10L)
  }

  test("st26 streaming sketch agrees with the batch q71 sketch exactly") {
    // same corpus, same bucket grid, same ceil-rank math: the streaming
    // complete-mode histogram must reach the identical quantile report
    // the batch path computes — the kappa-architecture equivalence for
    // this monitor
    val s = spark
    def rep(name: String) = SparkEntry.queries(name)(s, sf)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(rep("st26_stream_quantiles") == rep("q71_sketch_quantiles"))
  }

  test("t43 prices a hand-computed reliability diagram exactly") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-t43-fixture")
    // scores use p25's exact quality_fx formula:
    //   "a b"  (en): (2/2 ratio -> 1e6)/2 + 2*2500 = 505000 -> bucket 5
    //   "x y"  (fr): same score, bucket 5, negative label
    //   "1 2 3"(fr): 0/3 alpha -> 0/2 + 3*2500 = 7500 -> bucket 0
    // bucket 5: n=2 pos=1 rate=500000 avg=505000 gap=5000
    // bucket 0: n=1 pos=0 rate=0      avg=7500   gap=7500
    Seq((1L, "a b", "en"), (2L, "x y", "fr"), (3L, "1 2 3", "fr"))
      .map { case (id, t, l) => (id, t, l, "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("t43_score_calibration")(s, dir)
      .collect().map(x => x.getAs[Long]("bucket") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("n_pos"),
          x.getAs[Long]("pos_rate_ppm"), x.getAs[Long]("avg_score_fx"),
          x.getAs[Long]("gap_fx"))).toMap
    assert(r == Map(
      5L -> (2L, 1L, 500000L, 505000L, 5000L),
      0L -> (1L, 0L, 0L, 7500L, 7500L)))
  }

  test("sp37 head decodes both compounded updates after the chain sweep") {
    val s = spark
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("sp37_checkpoint_retention")(s, sf)
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[Long]("cnt")).toMap
    val want = Catalog.t(s, sf, "orders")
      .groupBy(col("o_custkey")).count().collect()
      .map { r =>
        val k = r.getLong(0); val n = r.getLong(1)
        k -> (if (k < 50) 3 * n else if (k < 100) 5 * n else n)
      }.toMap
    assert(got == want,
      "post-sweep head state diverges from the compounded chain")
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

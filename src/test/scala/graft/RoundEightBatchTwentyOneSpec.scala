package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch-21 specs (st22 sliding windows, sp33 key migration,
  * i13 CDC changelog apply, t35 lexical-density profile).
  */
class RoundEightBatchTwentyOneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ------------------------------------------------------------ st22

  test("st22 sliding windows carry exactly 4x the tumbling event mass " +
    "and every start is slide-aligned") {
    val rows = run("st22_sliding_windows").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val nEvents = Catalog.t(spark, sf, "events").count()
    assert(rows.map(_._3).sum === 4L * nEvents)
    rows.foreach { case (ws, _, n) =>
      assert(ws % 1800000L === 0L)
      assert(n > 0)
    }
    // the 4 windows covering one event are start-consecutive: for each
    // (type, start) with events at start+90m..start+120m, the window one
    // slide later exists too unless it is beyond the last event — spot
    // check the global window span covers [min, max] event times
    val e = Catalog.t(spark, sf, "events")
      .select(unix_millis(col("ts")).as("ms")).agg(
        min(col("ms")).as("lo"), max(col("ms")).as("hi")).collect()(0)
    val starts = rows.map(_._1)
    assert(starts.min <= e.getLong(0) && starts.max <= e.getLong(1))
    assert(starts.max + 7200000L > e.getLong(1))
  }

  // ------------------------------------------------------------ sp33

  test("key migration re-keys every row, survives the rescale, and the " +
    "new savepoint carries the new key layout") {
    val s = spark; import s.implicits._
    import graft.core.codec.Codecs.{LongCodec, StringCodec}
    val src = Seq((1L, 10L), (2L, 20L), (777L, 30L)).toDS()
    val m1 = state.Savepoints
      .writer(s, state.Savepoints.bootstrap("km-op", 2, 128), "km-op")
      .withKeyCodec(LongCodec)
      .createNewValueState("S", src, LongCodec)
      .writeAll(TempDirs.create("graft-km1"))
    val migrated = state.Savepoints
      .reader(s, state.Savepoints.load(m1.basePath), "km-op")
      .readValueStates[Long, Long]("S")
      .map { case (k, v) => (f"u:$k%08d", v) }
    val m2 = state.Savepoints
      .writer(s, state.Savepoints.bootstrap("km-op", 8, 256), "km-op")
      .withKeyCodec(StringCodec)
      .createNewValueState("S", migrated, LongCodec)
      .writeAll(TempDirs.create("graft-km2"))
    val back = state.Savepoints
      .reader(s, state.Savepoints.load(m2.basePath), "km-op")
      .readValueStates[String, Long]("S")
      .collect().toMap
    assert(back === Map("u:00000001" -> 10L, "u:00000002" -> 20L,
      "u:00000777" -> 30L))
    val op = state.Savepoints.load(m2.basePath).operator("km-op")
    assert(op.maxParallelism === 256)
    assert(op.parallelism === 8)
  }

  test("sp33 on the real table: one row per customer, every key is the " +
    "zero-padded uid form of its source key") {
    val rows = run("sp33_key_migration").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val src = Catalog.t(spark, sf, "orders")
      .groupBy(col("o_custkey")).count().collect()
      .map(r => (f"u:${r.getLong(0)}%08d", r.getLong(1))).toMap
    assert(rows.length === src.size)
    rows.foreach { case (k, v) =>
      assert(k.matches("u:\\d{8}"), k)
      assert(src(k) === v)
    }
  }

  // ------------------------------------------------------------- i13

  test("i13 applies the changelog with delete precedence: tombstoned " +
    "keys vanish, upserts stamp their version, untouched keys carry") {
    val rows = run("i13_cdc_apply").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byKey = rows.map(r => r._1 -> r).toMap
    assert(byKey.size === rows.length)
    val customers = Catalog.t(spark, sf, "customer")
      .select(col("c_custkey"),
        expr("cast(round(c_acctbal * 100) as bigint)").as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val orders = Catalog.t(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    customers.keys.foreach { k =>
      val ordered = orders.get(k)
      if (ordered.isDefined && k % 7 == 0) {
        assert(!byKey.contains(k), s"tombstoned $k survived")
      } else if (ordered.isDefined) {
        assert(byKey(k) === ((k, ordered.get._1, ordered.get._2, "updated")))
      } else {
        assert(byKey(k) === ((k, 0L, customers(k), "kept")))
      }
    }
  }

  // ------------------------------------------------------------- t35

  test("t35 computes hapax share and mean word length exactly on a " +
    "hand fixture") {
    val s = spark; import s.implicits._
    // stratum (en, web): tokens = a a b ccc -> vocab 3, hapax 2 (b,
    // ccc), chars = 1+1+1+3 = 6 over 4 tokens
    val docs = Seq(
      (1L, "a a b", "en", "web"),
      (2L, "ccc", "en", "web"),
      (3L, "x y", "fr", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = TempDirs.create("graft-t35-fix")
    docs.withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(dir, "documents.parquet").toString)
    val got = SparkEntry.queries("t35_lexical_profile")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(got === Map(
      ("en", "web") -> ((4L, 3L, 2L, 666666L, 1500000L)),
      ("fr", "web") -> ((2L, 2L, 2L, 1000000L, 1000000L))))
  }

  test("t35 on the real table: bookkeeping inequalities hold in every " +
    "stratum and token mass reconciles with the corpus") {
    val rows = run("t35_lexical_profile").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, nTok, vocab, hapax, share, wlen) =>
      assert(vocab <= nTok)
      assert(hapax <= vocab)
      assert(share >= 0 && share <= 1000000L)
      assert(wlen > 0)
    }
    val totalTokens = Catalog.t(spark, sf, "documents")
      .select(expr("size(split(text, ' '))").as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(rows.map(_._3).sum === totalTokens)
  }
}

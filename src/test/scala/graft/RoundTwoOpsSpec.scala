package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark-side semantic checks for the round-2 operators, independent of
  * the DuckDB oracle gate: each scalable formulation (union-merge as-of,
  * banded range join, label propagation) is compared against a direct
  * (non-scalable) reference implementation on sf0.001.
  */
class RoundTwoOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("j01 union-merge as-of equals per-event greatest-order join") {
    val got = run("j01_asof_join")
    // reference: plain (quadratic) formulation — join every event to all
    // earlier reps, keep the latest (max order_ms, then max order_key)
    val reps = Catalog.t(spark, sf, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("order_key"))
      .select(col("o_custkey"),
        expr("unix_millis(cast(o_orderdate as timestamp))").as("order_ms"),
        col("order_key"))
    val ev = Catalog.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id")).orderBy(col("order_ms").desc)
    val ref = ev.join(reps,
        col("user_id") === col("o_custkey") && col("order_ms") <= col("ts_ms"),
        "left")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("event_id", "user_id", "ts_ms", "order_key", "order_ms")
    assert(got.count() === ev.count())
    assert(got.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(got).count() === 0)
  }

  test("j02 banded range join equals unbanded range join") {
    val got = run("j02_range_join")
    val ev = Catalog.t(spark, sf, "events").select(col("event_id"),
      col("user_id"), col("event_type"), col("value"),
      unix_millis(col("ts")).as("ms"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("pu"), col("ms").as("pms"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"),
        expr("cast(round(value * 100) as bigint)").as("v100"), col("ms").as("cms"))
    val ref = p.join(c, col("cu") === col("pu") &&
        col("cms") >= col("pms") - 3600000L && col("cms") < col("pms"), "left")
      .groupBy(col("event_id"), col("pu"))
      .agg(count(col("cid")).as("n_clicks"),
        (coalesce(sum(col("v100")), lit(0L)).cast("double") / 100).as("click_value"))
      .select(col("event_id"), col("pu").as("user_id"), col("n_clicks"),
        col("click_value"))
    assert(got.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(got).count() === 0)
  }

  test("d08 components: edge endpoints share a cluster, ids are canonical") {
    val labels = run("d08_conn_components").cache()
    try {
      // canonical: cluster id is the min doc_id of its members
      assert(labels.filter(col("cluster_id") > col("doc_id")).count() === 0)
      val mins = labels.groupBy("cluster_id").agg(min("doc_id").as("m"))
      assert(mins.filter(col("m") =!= col("cluster_id")).count() === 0)
      // consistency: both endpoints of every near-dup edge agree
      val pairs = run("d05_simhash_pairs").select("doc_a", "doc_b")
      val la = labels.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca"))
      val lb = labels.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb"))
      assert(pairs.join(la, "doc_a").join(lb, "doc_b")
        .filter(col("ca") =!= col("cb")).count() === 0)
    } finally labels.unpersist()
  }

  test("g01 pagerank: full coverage, positive ranks, isolated docs at base") {
    val pr = run("g01_pagerank").cache()
    try {
      val docs = Catalog.t(spark, sf, "documents").select("doc_id")
      assert(pr.count() === docs.count())
      assert(pr.filter(col("pr") <= 0).count() === 0)
      // docs with no near-dup edges keep exactly the base rank
      val pairs = run("d05_simhash_pairs").select("doc_a", "doc_b")
      val inGraph = pairs.select(col("doc_a").as("doc_id"))
        .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
      val isolated = pr.join(inGraph, Seq("doc_id"), "left_anti")
      val n = docs.count()
      val base = (15L * (1000000000000L / n)) / 100L
      assert(isolated.filter(col("pr") =!= base).count() === 0)
    } finally pr.unpersist()
  }

  test("q32 hash sampling is deterministic and stratified") {
    val a = run("q32_hash_sample")
    val b = run("q32_hash_sample")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    val total = Catalog.t(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    val sampled = a.groupBy("l_returnflag").agg(count(lit(1)).as("s"))
    val rates = total.join(sampled, "l_returnflag")
      .select(col("l_returnflag"), (col("s").cast("double") / col("n")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // hash-mod rates concentrate near the configured per-stratum targets
    assert(math.abs(rates("A") - 0.10) < 0.05, rates.toString)
    assert(math.abs(rates("N") - 0.05) < 0.04, rates.toString)
    assert(math.abs(rates("R") - 0.20) < 0.06, rates.toString)
  }

  test("q35 gap fill: dense grid, zero-fill and forward-fill invariants") {
    val f = run("q35_time_fill").cache()
    try {
      // dense: every user covers the same full day range
      val span = f.agg((max("day") - min("day") + 1).as("days")).collect()(0).getLong(0)
      val perUser = f.groupBy("user_id").agg(count(lit(1)).as("c"))
        .filter(col("c") =!= span)
      assert(perUser.count() === 0)
      // observed days: ffill equals that day's count
      assert(f.filter(col("n") > 0 && col("ffill") =!= col("n")).count() === 0)
    } finally f.unpersist()
  }

  test("corpus is pure ASCII (m02/d02/d04 char-fold == byte-fold precondition)") {
    // the hash oracles fold over CHARACTERS while the Spark kernels fold
    // over utf-8 BYTES; these agree only on ASCII text — assert it at
    // EVERY scale factor the gates/bench touch, so a corpus regen with
    // multi-byte text fails loudly in CI instead of as an opaque oracle
    // hash mismatch
    for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = Catalog.t(spark, s"/root/testdata/$dir", "documents")
      assert(docs.filter(expr(
        "text IS NULL OR length(text) != octet_length(text)")).count() === 0,
        s"non-ASCII or NULL text in $dir")
    }
  }

  test("public API guards: fuzzyPairs requires blocking; excludeSelf=false keeps collisions") {
    import graft.llm.{Dedup, Similarity}
    // unblocked edit-distance verify must fail fast, not cross-join
    val parts = Catalog.t(spark, sf, "part")
    intercept[IllegalArgumentException] {
      Dedup.fuzzyPairs(parts, "p_partkey", "p_name", Seq.empty)
    }
    // independent id spaces: id collisions are real neighbors
    val e = Catalog.t(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") === 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding"))
    val withSelf = Similarity.cosineTopK(q, c, k = 1, excludeSelf = false)
      .collect()(0)
    // the identical vector is its own nearest neighbor at cosine ~1
    // (dot/(n*n) rounds to 1 ± 1 ulp)
    assert(withSelf.getLong(1) === 3L && math.abs(withSelf.getDouble(2) - 1.0) < 1e-12)
    val without = Similarity.cosineTopK(q, c, k = 1).collect()(0)
    assert(without.getLong(1) !== 3L)
  }

  test("st05 streaming dedup emits exactly the batch-distinct key set") {
    val got = run("st05_stream_dedup")
    val ref = Catalog.t(spark, sf, "events").select("user_id", "event_type").distinct()
    assert(got.exceptAll(ref).count() === 0 && ref.exceptAll(got).count() === 0)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11 laws: the asymmetries named by the round-10 advisory,
  * each pinned by value so the class cannot ship again.
  *  - q71/st26 bucket math must FLOOR on BOTH sides (Spark `div` and
  *    DuckDB integer `//` both truncate toward zero — measured — so
  *    each side carries the same pmod floor rewrite; truncation would
  *    also make the zero bucket double-width): a negative cents value
  *    is the discriminating case.
  *  - p26's content hash must fold UTF-8 BYTES, not UTF-16 chars:
  *    supplementary-plane text is the discriminating case.
  */
class RoundElevenOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def writeSingleFile(df: org.apache.spark.sql.DataFrame,
      dir: String, table: String): Unit =
    TestIo.writeSingleFile(df, dir, table)

  test("q71 buckets negative values by FLOOR division, the same pmod " +
    "identity the oracle carries") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-q71-neg")
    val baseUs = 1704067200000000L
    // cents −150, −50, 50, 150 → floor buckets −2, −1, 0, 1.
    // Truncating `div` would put −150 in −1 and −50 in 0 and report
    // p50 = 0; floor reports p50 = −1 (ceil-rank 2 of n = 4).
    val ev = Seq((1L, -1.5), (2L, -0.5), (3L, 0.5), (4L, 1.5))
      .map { case (i, v) => (i, baseUs + i * 1000000L, i % 2, "click", v, "{}") }
      .toDF("event_id", "tsu", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(tsu)")).drop("tsu")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    writeSingleFile(ev, dir, "events")
    val r = SparkEntry.queries("q71_sketch_quantiles")(s, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_events") == 4L)
    assert(r.head.getAs[Long]("p50_bucket") == -1L,
      "negative cents must floor to the lower bucket")
    assert(r.head.getAs[Long]("p95_bucket") == 1L)
    assert(r.head.getAs[Long]("p99_bucket") == 1L)
    // kappa equivalence holds on the hostile-sign corpus too: the
    // streaming sketch floors identically
    val st = SparkEntry.queries("st26_stream_quantiles")(s, dir).collect()
    assert(st.map(_.toSeq).toSeq == r.map(_.toSeq).toSeq)
  }

  test("graft_bytehash32 folds UTF-8 bytes — astral-plane text hashes " +
    "byte-exactly, where the char fold diverges") {
    val s = spark
    graft.functions.GraftFunctions.register(s)
    import org.apache.spark.sql.functions._
    // U+1F680 ROCKET: UTF-8 bytes F0 9F 9A 80 → hand-computed fold
    // ((240·31+159)·31+154)·31+128 = 7307541; UTF-16 is the surrogate
    // pair D83D DE80 → char fold 55357·31+56960 = 1773027. p26 hashes
    // whole documents, so it must use the byte fold the oracle can
    // mirror from hex(encode(text)).
    val row = s.range(1).select(
      expr("graft_bytehash32('🚀')").as("bh"),
      expr("graft_polyhash32('🚀')").as("ch")).head
    assert(row.getAs[Long]("bh") == 7307541L)
    assert(row.getAs[Long]("ch") == 1773027L)
    // interpreted (non-codegen) path agrees with the kernel
    assert(graft.functions.ByteHash32.hash(
      "🚀".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      == 7307541L)
    // ASCII text: byte fold == char fold (the documented equivalence)
    val ascii = s.range(1).select(
      expr("graft_bytehash32('hello world')").as("bh"),
      expr("graft_polyhash32('hello world')").as("ch")).head
    assert(ascii.getAs[Long]("bh") == ascii.getAs[Long]("ch"))
  }

  test("t44 counts within-word symbol pairs and ranks merges " +
    "deterministically") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-t44")
    // words: aaa (aa, aa), bb (bb), ab (ab), aaa (aa, aa)
    // pair freq: aa = 4, ab = 1, bb = 1 → merge winner is 'aa';
    // the ab/bb tie breaks lexicographically
    Seq((1L, "aaa bb"), (2L, "ab aaa"))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("t44_bpe_merge_step")(s, dir)
      .orderBy("rank").collect()
      .map(x => (x.getAs[String]("pair"), x.getAs[Long]("freq"),
        x.getAs[Long]("rank")))
    assert(r.toSeq == Seq(("aa", 4L, 1L), ("ab", 1L, 2L), ("bb", 1L, 3L)))
  }

  test("t44 pairs slice by CODEPOINT: astral-plane words form emoji " +
    "pairs, not surrogate shards") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-t44-astral")
    // one word of three supplementary-plane codepoints → exactly the
    // two adjacent emoji pairs; a UTF-16 slicer would emit 5 broken
    // surrogate windows instead
    Seq((1L, "🚀🎉🚀"))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("t44_bpe_merge_step")(s, dir)
      .orderBy("rank").collect()
      .map(x => (x.getAs[String]("pair"), x.getAs[Long]("freq")))
    assert(r.toSeq == Seq(("🎉🚀", 1L), ("🚀🎉", 1L)) ||
      r.toSeq == Seq(("🚀🎉", 1L), ("🎉🚀", 1L)),
      s"unexpected pair slicing: ${r.toSeq}")
    assert(r.forall(_._1.codePointCount(0, r.head._1.length) == 2))
  }

  test("g13 prices clique, triangle, and bridge edges by triangle " +
    "support") {
    val s = spark; import s.implicits._
    // K4 on {1,2,3,4}: every edge closes 2 triangles → in the 4-truss.
    // Lone triangle {5,6,7}: support 1 → below the bar. Bridge 4–5:
    // support 0 — the edge transitive closure over-merges through.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 6L), (5L, 7L), (6L, 7L), (4L, 5L))
      .toDF("src", "dst")
    val r = graft.llm.GraphAlgs.edgeTriangleSupport(edges, 2)
      .collect()
      .map(x => (x.getAs[Long]("src"), x.getAs[Long]("dst")) ->
        (x.getAs[Long]("support"), x.getAs[Boolean]("in_truss")))
      .toMap
    assert(r.size == 10)
    Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .foreach(e => assert(r(e) == (2L, true), s"K4 edge $e: ${r(e)}"))
    Seq((5L, 6L), (5L, 7L), (6L, 7L))
      .foreach(e => assert(r(e) == (1L, false), s"triangle edge $e: ${r(e)}"))
    assert(r((4L, 5L)) == (0L, false), s"bridge: ${r((4L, 5L))}")
  }

  test("q72 sketch estimates are EXACT below the sketch width, and " +
    "honest above it on the sf corpus") {
    val s = spark; import s.implicits._
    // hand fixture: populations view={1,2,3}, click={2,3,4,5},
    // purchase={6} — all < k=64, so the KMV sketches are exhaustive
    // and every estimate must EQUAL its exact counterpart
    val dir = TempDirs.create("graft-q72")
    val baseUs = 1704067200000000L
    val rows = Seq(
      (1L, "view"), (2L, "view"), (3L, "view"),
      (2L, "click"), (3L, "click"), (4L, "click"), (5L, "click"),
      (6L, "purchase"))
    val ev = rows.zipWithIndex.map { case ((u, et), i) =>
      (i.toLong, baseUs + i * 1000000L, u, et, 1.0, "{}") }
      .toDF("event_id", "tsu", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(tsu)")).drop("tsu")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    writeSingleFile(ev, dir, "events")
    val r = SparkEntry.queries("q72_kmv_set_ops")(s, dir).collect()
      .map(x => (x.getAs[String]("type_a"), x.getAs[String]("type_b")) ->
        (x.getAs[Long]("est_union"), x.getAs[Long]("exact_union"),
          x.getAs[Long]("est_inter"), x.getAs[Long]("exact_inter")))
      .toMap
    assert(r.size == 3)
    assert(r(("click", "view")) == (5L, 5L, 2L, 2L), r(("click", "view")))
    assert(r(("click", "purchase")) == (5L, 5L, 0L, 0L))
    assert(r(("purchase", "view")) == (4L, 4L, 0L, 0L))
    // sf corpus: populations exceed k, so the estimator engages —
    // the union estimate must land within 4 standard errors
    // (se ≈ 1/sqrt(k−2) ≈ 12.7% at k = 64)
    val sfRows = SparkEntry.queries("q72_kmv_set_ops")(s, sf).collect()
    assert(sfRows.nonEmpty)
    sfRows.foreach { x =>
      val err = x.getAs[Long]("union_err_ppm")
      assert(err < 510000,
        s"${x.getAs[String]("type_a")}/${x.getAs[String]("type_b")}: " +
          s"union estimate off by $err ppm (> 4 se)")
    }
  }

  test("st27 streaming KMV cardinality is exact below the sketch " +
    "width and matches the batch estimator above it") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-st27")
    val baseUs = 1704067200000000L
    // populations below k=64: the streamed sketch is exhaustive, so
    // est_ndv == exact_ndv and err_ppm == 0 for every type
    val rows = Seq(
      (1L, "view"), (2L, "view"), (3L, "view"), (1L, "view"), // dup user
      (2L, "click"), (3L, "click"), (4L, "click"), (5L, "click"),
      (6L, "purchase"))
    val ev = rows.zipWithIndex.map { case ((u, et), i) =>
      (i.toLong, baseUs + i * 1000000L, u, et, 1.0, "{}") }
      .toDF("event_id", "tsu", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(tsu)")).drop("tsu")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    writeSingleFile(ev, dir, "events")
    val r = SparkEntry.queries("st27_stream_kmv_ndv")(s, dir).collect()
      .map(x => x.getAs[String]("event_type") ->
        (x.getAs[Long]("est_ndv"), x.getAs[Long]("exact_ndv"),
          x.getAs[Long]("err_ppm"))).toMap
    assert(r == Map("view" -> (3L, 3L, 0L), "click" -> (4L, 4L, 0L),
      "purchase" -> (1L, 1L, 0L)), r)
    // sf corpus engages the estimator: within 4 se of exact, per type
    SparkEntry.queries("st27_stream_kmv_ndv")(s, sf).collect().foreach {
      x => assert(x.getAs[Long]("err_ppm") < 510000,
        s"${x.getAs[String]("event_type")}: ${x.getAs[Long]("err_ppm")} ppm")
    }
  }

  test("c12 prices a planted stable/unstable/one-sided geometry " +
    "exactly") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-c12")
    import TestVectors.axes
    // centroids (vec_id % 100 == 0): 0 → e5, 100 → e7, 200 → e9.
    // cid 0 is STABLE: members 2 (even half) and 3 (odd half) both
    // exactly e5 — and centroid 0 itself rides the even half — so the
    // two half-means agree bit-exactly: drift 0.
    // cid 100 is UNSTABLE: even half gets the centroid (e7) + vec 4
    // (.9 e7 + .3 e8), odd half only vec 5 (.9 e7 − .3 e8): the halves
    // disagree by 500 000 fx in dim 7 and 4 500 000 fx in dim 8.
    // cid 200 is ONE-SIDED: its only member (vec 6) is even — the
    // documented contract reports it by absence from the inner join.
    Seq(
      (0L, axes(5 -> 1.0)), (100L, axes(7 -> 1.0)), (200L, axes(9 -> 1.0)),
      (2L, axes(5 -> 1.0)), (3L, axes(5 -> 1.0)),
      (4L, axes(7 -> 0.9, 8 -> 0.3)), (5L, axes(7 -> 0.9, 8 -> -0.3)),
      (6L, axes(9 -> 1.0)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = SparkEntry.queries("c12_split_stability")(s, dir)
      .collect().map(x => x.getAs[Long]("cid") ->
        (x.getAs[Long]("n_a"), x.getAs[Long]("n_b"),
          x.getAs[Long]("drift_l1_fx"), x.getAs[Long]("max_dim_gap_fx")))
      .toMap
    assert(r.keySet == Set(0L, 100L),
      s"one-sided cid 200 must be absent: ${r.keySet}")
    assert(r(0L) == (2L, 1L, 0L, 0L), s"stable cluster drifted: ${r(0L)}")
    // even half mean: dim7 (1e7 + 9e6)/2 = 9 500 000, dim8 1 500 000;
    // odd half: dim7 9 000 000, dim8 −3 000 000 → L1 = 5 000 000
    assert(r(100L) == (2L, 1L, 5000000L, 4500000L),
      s"unstable cluster mispriced: ${r(100L)}")
  }

  test("m11 collapses identical payloads per format and prices the " +
    "dup share exactly") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-m11")
    // png (ids 0, 4): identical payload bytes → 2 items, 1 distinct,
    // dup share 500000 ppm; jpeg (1, 5): distinct payloads → 0 dup;
    // wav (2): singleton; mp4 absent (no id ≡ 3 mod 4) → no row
    Seq((0L, "aaa"), (4L, "aaa"), (1L, "x"), (5L, "y"), (2L, "z"))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("m11_media_dedup")(s, dir).collect()
      .map(x => x.getAs[String]("format") ->
        (x.getAs[Long]("n_items"), x.getAs[Long]("n_distinct"),
          x.getAs[Long]("n_dup_items"), x.getAs[Long]("dup_ppm")))
      .toMap
    assert(r == Map(
      "png" -> (2L, 1L, 1L, 500000L),
      "jpeg" -> (2L, 2L, 0L, 0L),
      "wav" -> (1L, 1L, 0L, 0L)), r)
  }

  test("p26 diff classes survive astral-plane text (the round-10 " +
    "advisory's discriminating corpus)") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-p26-astral")
    // doc 1 unchanged with emoji text; doc 2 (2 % 13 == 2) revised —
    // the unchanged doc's old/new hashes must AGREE even though the
    // text is pure supplementary-plane content
    Seq((1L, "🚀🎉 rocket party"),
      (2L, "🚀 launch notes"))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("p26_corpus_version_diff")(s, dir)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        x.getAs[String]("status")).toMap
    assert(r == Map(1L -> "unchanged", 2L -> "changed"))
  }
}

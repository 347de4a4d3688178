package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Adversarial-content robustness: the document/embedding/event query
  * surface runs END-TO-END against a fixture built from the inputs a
  * real crawl actually delivers — empty strings, single characters,
  * unicode (CJK, emoji, combining marks, RTL), punctuation-only and
  * whitespace-only docs, a pathological 20k-word repetition doc, zero
  * and near-zero embedding vectors, and a single-event user. The
  * assertion is the operator CONTRACT, not specific values (the oracle
  * gates values on driver data): every query must complete without
  * throwing and produce a well-formed result. This is the guard that a
  * 100 TB run doesn't die at task 41,237 of 50,000 on the one shard
  * with a malformed document.
  */
class RobustnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeSingleFile(df: DataFrame, dir: String, table: String): Unit =
    TestIo.writeSingleFile(df, dir, table)

  private lazy val dir: String = {
    val s = spark
    import s.implicits._
    val d = TempDirs.create("graft-robust")
    val nasty = Seq(
      (1L, "", "en", "srcA"),                       // empty text
      (2L, "x", "en", "srcA"),                      // single char
      (3L, "   ", "de", "srcA"),                    // whitespace only
      (4L, "!!! ??? ... ;;; ---", "de", "srcB"),    // punctuation only
      (5L, "日本語のテキスト 中文文本 한국어", "ja", "srcB"), // CJK
      (6L, "emoji 🚀🎉 and é combining", "en", "srcB"), // emoji + combining
      (7L, "\u202Eright to left\u202C text", "ar", "srcC"), // RTL controls
      (8L, Seq.fill(20000)("spam").mkString(" "), "en", "srcC"), // 20k-token repeat
      (9L, "normal words appear here with the usual shapes", "en", "srcC"),
      (10L, "tab\tand\nnewline\rcarriage", "en", "srcC"))
      .map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    writeSingleFile(nasty, d, "documents")
    // embeddings: a zero vector, a tiny-norm vector, duplicates, and
    // id 0 / id 100 so the % 100 centroid rule still yields centroids
    val dim = 64
    def vec(f: Int => Float) = (0 until dim).map(f).toArray
    val emb = Seq(
      (0L, vec(i => if (i == 0) 1f else 0f), 0),
      (1L, vec(_ => 0f), 0),                         // ZERO vector
      (2L, vec(i => if (i == 1) 1e-30f else 0f), 0), // denormal norm
      (3L, vec(i => if (i == 0) 1f else 0f), 0),     // exact dup of 0
      (4L, vec(i => (i % 7).toFloat - 3f), 1),
      (100L, vec(i => if (i == 2) 1f else 0f), 1))
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    writeSingleFile(emb, d, "embeddings")
    // orders: the adversarial shapes the o_custkey-grain statistics
    // (q78 survival, q82 rank-sum) must survive — Long.MinValue and
    // negative custkeys (abs(k % 2): MinValue % 2 = 0; negative odd
    // keys land in arm 1 in BOTH engines' truncated modulo), order
    // counts TIED across both parity arms (q82's doubled-average-rank
    // tie machinery: count 1 appears in each arm, count 2 in both),
    // same-day repeat orders (q78's zero-duration ties under the
    // (day, o_orderkey) window), and a censored-only single-order
    // customer at the horizon.
    val day0 = 1704067200000000L // 2024-01-01 UTC, micros
    val us = 86400000000L
    val ord = Seq(
      (101L, Long.MinValue, day0),         // arm 0: 2 orders, SAME day
      (102L, Long.MinValue, day0),
      (103L, 0L, day0 + 2 * us),           // arm 0: 1 order
      (104L, 2L, day0),                    // arm 0: 2 orders, 3 days apart
      (105L, 2L, day0 + 3 * us),
      (106L, -3L, day0 + us),              // arm 1: 2 orders, 1 day apart
      (107L, -3L, day0 + 2 * us),
      (108L, -1L, day0 + 3 * us))          // arm 1: 1 order AT the horizon
      .toDF("o_orderkey", "o_custkey", "o_us")
      .withColumn("o_orderdate",
        expr("cast(timestamp_micros(o_us) as timestamp_ntz)"))
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_totalprice", lit(0.0))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    writeSingleFile(ord, d, "orders")
    val baseUs = 1704067200000000L
    val ev = Seq(
      (1L, baseUs, 1L, "view", 0.0),
      (2L, baseUs + 60000000L, 1L, "view", -1.5),   // negative value
      (3L, baseUs, 2L, "click", 1e12),              // huge value
      (4L, baseUs + 1L, 2L, "click", 1e12))         // 1-microsecond gap
      .toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", expr("cast(timestamp_micros(us) as timestamp_ntz)"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    writeSingleFile(ev, d, "events")
    d
  }

  /** Queries whose ONLY inputs are documents/embeddings/events — the
    * adversarial tables above. (TPC-H-table and savepoint queries keep
    * their own fixtures.)
    */
  private val surface = Seq(
    // text analysis
    "t01_lang_id", "t02_quality_score", "t03_token_stats", "t04_fingerprint",
    "t05_rolling_fingerprint", "t06_repetition", "t07_scrub", "t08_vocab_topk",
    "t10_tfidf", "t12_char_ngrams", "t13_shingle_novelty", "t14_hash_classifier",
    "t16_heaps_law", "t19_repetition", "t21_pmi_collocations",
    "t22_classifier_eval", "t25_char_entropy", "t26_readability",
    "t27_code_prose", "t28_unicode_profile", "t29_zipf_slope",
    // dedup
    "d01_dedup_exact", "d02_minhash_lsh", "d03_ngram_jaccard", "d04_simhash",
    "d05_simhash_pairs", "d09_dedup_keep_best", "d11_contamination",
    "d12_dup_spans", "d16_containment", "d18_dup_rate_by_source",
    "d19_dup_span_ranges", "d20_ingest_report",
    // similarity / clustering (zero vector stresses every cosine)
    "s01_cosine_topk", "s03_ann_ivf", "s05_quantize_int8", "s13_range_search",
    "s14_ivf_stats", "c01_kmeans_step", "c03_cluster_eval", "c05_silhouette",
    // pipeline
    "p02_lang_balanced", "p04_shard_manifest", "p10_leakage_safe_split",
    "p16_length_profile", "p17_dataset_card", "p18_decontaminated_mix",
    "p19_interleave_order",
    // multimodal (payload = utf-8 of text, incl. empty payload)
    "m01_multimodal_meta", "m02_multimodal_decode", "m05_media_shards",
    "m07_shard_integrity",
    // events surface
    "q20_events_agg", "q53_window_distinct", "q54_streaks",
    // streaming ingest gates (stream the same adversarial tables)
    "st16_stream_minhash_ingest", "st17_stream_semantic_ingest",
    "st18_stream_simhash_ingest", "st19_stream_quality_gate",
    "st20_stream_anomaly_gate",
    // round-8 batch 19-27 additions over the same adversarial tables:
    // empty/unicode/20k-token docs through TextRank, lexical density,
    // KN held-out, fertility, confusion, preference pairs, post-dedup
    // mix, templates, method agreement, two-hop, events through the
    // Markov/overlap/conversion reports, embeddings (zero vectors!)
    // through MMR, DB-index, Rand, drift, nprobe sweep
    "t34_textrank", "t35_lexical_profile", "t36_kn_heldout",
    "t37_tokenizer_fertility", "t39_lang_confusion",
    "p22_preference_pairs", "p24_post_dedup_mix",
    "d26_method_agreement", "d27_template_extraction", "g10_two_hop",
    "q60_markov_transitions", "j06_incident_overlap",
    "q64_conversion_time",
    // (c10 is absent: this fixture has no vec_id ≡ 50 (mod 100), so
    // its PERTURBED seed set is empty and the documented non-empty-
    // centroid refusal fires — the contract, not a crash; EmptyInputSpec
    // pins that message.)
    "s18_mmr_rerank", "s20_nprobe_sweep", "c09_davies_bouldin",
    "s19_centroid_drift",
    "m09_caption_align", "m10_keyframes",
    // round 9: the avro/xml interchange roundtrips over the adversarial
    // corpus — escaping (& < > ]]> quotes) must preserve the text hash —
    // and the drift gate's integer-ppm histograms over hostile lengths
    "i15_avro_roundtrip", "i16_xml_roundtrip", "st23_stream_dist_drift",
    // round-9 batch 2: hostile unicode/whitespace through the prefix
    // normalizer and the token-vocabulary self-join
    "d23_prefix_dup", "t41_source_vocab_overlap",
    // round-9 batch 3: hostile text through the JSON-array escaper;
    // the adversarial events table through the streaming upsert merge
    "i18_json_array_roundtrip", "st24_stream_upsert_sink",
    // round-9 batch 4: zero vectors through the fused retrievers and
    // the eps-graph (the shared zero-norm guard), hostile text through
    // the quality sweep
    "s21_rank_fusion", "c11_dbscan_core", "p25_quality_prune_sweep",
    // round-9 batch 5: adversarial events through the path miner,
    // hostile unicode/20k-token docs through the RAKE segmentation
    "q70_event_paths", "t42_rake_keywords",
    // round 10: the adversarial events table through the versioned-sink
    // vacuum (far-future/ancient timestamps ride the snapshot merge);
    // zero/denormal vectors through the exact contamination audit (the
    // zero-norm division yields NaN cosine, which must not flag)
    "st25_snapshot_vacuum", "d28_semantic_contamination",
    // hostile text (quotes/newlines/unicode) through the sharded lake
    // roundtrip + manifest reconciliation
    "i19_resumable_ingest",
    // hostile text through the content-hash version diff; adversarial
    // events (extreme values) through the histogram sketch, batch and
    // streaming alike
    "p26_corpus_version_diff", "q71_sketch_quantiles",
    "st26_stream_quantiles",
    // hostile text through the quality-score calibration buckets
    "t43_score_calibration",
    // round 11: hostile text (surrogates, 20k-token repeat) through the
    // BPE pair counter and the simhash truss graph; the zero vector
    // through the split-half Lloyd audit
    "t44_bpe_merge_step", "g13_truss_support", "c12_split_stability",
    // adversarial events (single-event user, negative values) through
    // the KMV audience-overlap algebra, batch and streaming
    "q72_kmv_set_ops", "st27_stream_kmv_ndv",
    // hostile payloads (empty, astral-plane, 20k-token) through the
    // byte-checksum dedup ledger
    "m11_media_dedup",
    // round 12 (back-filled r13): hostile text through the truss
    // decomposition and loop detector; the zero/denormal vectors
    // through the adaptive-family report and occupancy monitor; the
    // single-event user through the funnel
    "g14_truss_decomposition", "t45_repetition_loops",
    "p27_leakage_safe_split", "d29_adaptive_family_report",
    "st28_stream_band_occupancy", "q73_funnel_conversion",
    // round 13: adversarial events (negative values -> clamped
    // intervals, single-event users) through the rolling-distinct,
    // CUSUM, coalesce and decay ops; hostile text through the pack
    // sweep, vocab drift and the streaming contamination firewall;
    // the zero vector + duplicate labels through the cross-label
    // audit; a probe-less fixture through harmonic centrality
    "q74_rolling_distinct", "q75_cusum_drift", "j07_interval_coalesce",
    "q76_decayed_engagement", "p28_pack_budget_sweep",
    "g15_harmonic_centrality", "d30_cross_label_neardup",
    "t46_source_vocab_drift", "st29_stream_contamination_gate",
    // round-13 batch 2: adversarial events (two users, huge values)
    // through the count-min grid batch and streaming; hostile text
    // (empty, CJK, RTL, 20k-token) through the seeded restart walk and
    // the char-code VAD framing
    "q77_countmin_sketch", "st30_stream_countmin",
    "g16_personalized_pagerank", "m12_audio_vad",
    // the two-user holdout (one converting arm) and the hostile-text
    // capped mix (one source dominating by the 20k-token repeat doc);
    // the 2-day adversarial event panel through the pairwise-slope
    // trend (single-day types emit NULL trend, not a crash)
    "q80_holdout_lift", "p29_capped_mix", "q81_theilsen_trend",
    // round 14: the adversarial panels through source Gini (one
    // dominating doc) and the 2-day Kendall/autocorrelation series
    // (one pair, zero variance)
    "q83_gini_concentration", "q84_kendall_corr", "q85_autocorr_lag1",
    // round 15: the adversarial ORDERS table (Long.MinValue/negative
    // custkeys, cross-arm tied counts, same-day repeat orders, a
    // censored-only horizon customer) through the survival hazard and
    // the rank-sum test; the 2-day adversarial event series through
    // the Spearman signed square (one pair, tied ranks) and the runs
    // test (all-below-median degenerate arms)
    "q78_survival_hazard", "q82_ranksum_test",
    "q86_spearman_corr", "q87_runs_test")

  test("the document/embedding/event query surface survives adversarial " +
    "content end-to-end (no-throw, well-formed results)") {
    val failures = surface.flatMap { name =>
      try {
        val out = SparkEntry.queries(name)(spark, dir)
        out.collect() // full materialization, not just planning
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${
          Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    assert(failures.isEmpty, s"queries died on adversarial content:\n  ${
      failures.mkString("\n  ")}")
  }

  test("adversarial invariants hold where the contract pins them") {
    // unicode census still partitions every doc exactly (BMP + surrogate
    // text: the emoji doc exercises UTF-16 surrogate pairs)
    val t28 = SparkEntry.queries("t28_unicode_profile")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5)))
      .toMap
    val lens = SparkEntry.queries("t03_token_stats")(spark, dir) // just for ids
    assert(t28.nonEmpty && lens.count() > 0)
    // zero-vector cosine must not poison the index stats: every vector
    // still lands in exactly one cell (NaN cosine never drops a row)
    val occ = SparkEntry.queries("s14_ivf_stats")(spark, dir).collect()
    assert(occ.map(_.getLong(1)).sum === 6L,
      "all 6 vectors (incl. the zero vector) must be assigned to a cell")
    // the interleave order stays a collision-free permutation
    val pos = SparkEntry.queries("p19_interleave_order")(spark, dir).collect()
      .map(_.getLong(2))
    assert(pos.distinct.length === pos.length)
    // q82 over the adversarial orders, recomputed by hand: arm 0
    // (MinValue, 0, 2) has counts {2,1,2}, arm 1 (-3, -1) has {1,2};
    // value grain → val 1: c=2,c1=1,m=0; val 2: c=3,c1=1,m=2; so
    // r1_2 = 3 + 8 = 11, u1_2 = 11 − 2·3 = 5, diff2 = 5 − 6 = −1,
    // tie_term = 6 + 24 = 30, cubic = 125 − 5 − 30 = 90, and
    // z² = 1·3·5·4·1e6 / (6·90) = 111111 fx (truncated), biserial =
    // −1e6/6 = −166666 fx (toward zero). Long.MinValue % 2 must land
    // in arm 0 without abs() overflow for these to hold.
    val q82 = SparkEntry.queries("q82_ranksum_test")(spark, dir).head()
    assert(q82.getLong(0) === 3L, "n_control (MinValue, 0, 2)")
    assert(q82.getLong(1) === 2L, "n_treatment (-3, -1)")
    assert(q82.getLong(2) === 5L, "u1_doubled")
    assert(q82.getLong(3) === 6L, "mean_u_doubled")
    assert(q82.getLong(4) === 30L, "tie_term")
    assert(q82.getLong(5) === -166666L, "rank_biserial_fx")
    assert(q82.getLong(6) === 111111L, "z2_fx")
  }

  test("event-horizon timestamps survive the engine's parquet sink") {
    // The SCD2 "open-ended" sentinel TIMESTAMP '9999-12-31' cost
    // i11_scd2_merge its oracle hash in round 8: Spark's deprecated
    // INT96 parquet encoding stores Julian-day + nanos-of-day (so Spark
    // itself roundtrips it fine), but every arrow-based reader — the
    // driver's pandas compare included — converts INT96 to int64
    // NANOSECONDS, and 9999-12-31 wraps to 1816-03-29. Law: under
    // Catalog.sessionConfs the engine writes INT64 TIMESTAMP(MICROS)
    // parquet (checked in the physical footer, not just the conf), and
    // far-future/far-past values roundtrip exactly.
    assert(Catalog.sessionConfs.get("spark.sql.parquet.outputTimestampType")
      .contains("TIMESTAMP_MICROS"),
      "engine sessions must pin INT64-microsecond parquet timestamps")
    val s = spark
    import s.implicits._
    val horizon = Seq(
      (1L, java.sql.Timestamp.valueOf("9999-12-31 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("9999-12-31 23:59:59.999999")),
      (3L, java.sql.Timestamp.valueOf("0001-01-01 00:00:00")),
      (4L, java.sql.Timestamp.valueOf("2026-01-01 12:34:56.789012")))
      .toDF("k", "valid_to")
    val out = TempDirs.create("graft-horizon")
    // Dump through the SAME boundary Verify uses: dumpNormalize casts
    // TimestampType → TimestampNTZType (value-identical under the UTC
    // session) so the footer is UNADJUSTED micros. A tz-adjusted footer
    // reads back datetime64[us, UTC] in the driver's pandas vs the
    // DuckDB oracle's tz-naive — the round-9 i11/st01/st03 failure.
    Catalog.dumpNormalize(horizon).write.mode("overwrite").parquet(out)
    // NTZ reads back as LocalDateTime; cast to TimestampType (UTC
    // session ⇒ same instant) so the roundtrip compare stays exact.
    val back = spark.read.parquet(out)
      .withColumn("valid_to", org.apache.spark.sql.functions
        .col("valid_to").cast("timestamp"))
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val want = horizon.collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(back === want,
      s"parquet sink wrapped a timestamp: wrote $want, read $back")
    // Pin the PHYSICAL encoding: any arrow reader sees INT64 micros,
    // which cannot ns-wrap until year 2262 reads, and pyarrow keeps
    // micros as timestamp[us] anyway. INT96 here = driver hash-fail.
    val file = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      spark.sessionState.newHadoopConf(),
      new org.apache.hadoop.fs.Path(file.getAbsolutePath))
    val col = footer.getFileMetaData.getSchema.getColumns.asScala
      .find(_.getPath.mkString(".") == "valid_to").get
    assert(col.getPrimitiveType.getPrimitiveTypeName.toString == "INT64",
      s"valid_to must be INT64, was ${col.getPrimitiveType}")
    val logical = col.getPrimitiveType.getLogicalTypeAnnotation.toString
    assert(logical.contains("MICROS"),
      s"valid_to must be TIMESTAMP(MICROS), was $logical")
    // tz law: the dumped footer must be UNADJUSTED (NTZ). parquet-mr
    // renders timestamp annotations as TIMESTAMP(<unit>,<adjustedToUTC>)
    // — the second field must be false or the driver's pandas read is
    // datetime64[us, UTC] vs the oracle's tz-naive (round-9 regression).
    assert(logical.contains("false"),
      s"valid_to must be NTZ (isAdjustedToUTC=false), was $logical")
  }

  test("dumpNormalize rewrites timestamps recursively and is value-exact") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df = Seq((1L, java.sql.Timestamp.valueOf("2026-08-14 01:02:03.000004")))
      .toDF("k", "t")
      .withColumn("st", struct(col("t").as("inner"), col("k")))
      .withColumn("arr", array(col("t"), col("t")))
      .withColumn("m", map(lit("a"), col("t")))
    val norm = Catalog.dumpNormalize(df)
    def noTz(dt: DataType): Boolean = dt match {
      case TimestampType  => false
      case st: StructType => st.fields.forall(f => noTz(f.dataType))
      case a: ArrayType   => noTz(a.elementType)
      case m: MapType     => noTz(m.keyType) && noTz(m.valueType)
      case _              => true
    }
    assert(norm.schema.fields.forall(f => noTz(f.dataType)),
      s"dumpNormalize left a TimestampType behind: ${norm.schema}")
    // value-exact under the UTC session: render everything to strings
    val a = df.select(col("t").cast("string"), col("st.inner").cast("string"),
      element_at(col("arr"), 1).cast("string"),
      element_at(col("m"), "a").cast("string")).head()
    val b = norm.select(col("t").cast("string"), col("st.inner").cast("string"),
      element_at(col("arr"), 1).cast("string"),
      element_at(col("m"), "a").cast("string")).head()
    assert(a === b, "NTZ normalization changed a rendered value")
    // timestamp-free plans must pass through untouched (same object)
    val plain = Seq((1L, "x")).toDF("k", "v")
    assert(Catalog.dumpNormalize(plain) eq plain)
  }
}

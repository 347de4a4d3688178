package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch-2 specs: the new operators are each cross-checked
  * against an INDEPENDENT reference — hand-computed fixtures for the
  * graph/ANN operators, plain-Scala recomputations over the collected
  * sf0.001 tables for the relational/text/pipeline queries (driver-side
  * loops are fine here: the reference is supposed to be the dumb
  * obviously-correct formulation, not a second Spark plan).
  */
class RoundEightOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ------------------------------------------------------ link prediction

  test("linkPrediction on a 4-cycle predicts exactly the two diagonals " +
    "with jaccard 1.0, and never an existing edge") {
    val s = spark; import s.implicits._
    // square 1-2-3-4-1: N(1)={2,4}, N(3)={2,4} — (1,3) and (2,4) are the
    // only non-adjacent pairs with >= 2 common neighbors; both neighbor
    // sets coincide so jaccard = 2 / (2 + 2 - 2) = 1.0
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val got = graft.llm.GraphAlgs.linkPrediction(edges, minCommon = 2)
      .select("u", "w", "common_neighbors", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 3L, 2L, 1.0), (2L, 4L, 2L, 1.0)))
  }

  test("linkPrediction minCommon filters the hub noise floor") {
    val s = spark; import s.implicits._
    // star around 0: every leaf pair shares exactly one neighbor (the
    // hub) — minCommon = 2 reports nothing
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    assert(graft.llm.GraphAlgs.linkPrediction(edges, minCommon = 2).count() === 0)
    // at minCommon = 1 all three leaf pairs surface with jaccard
    // 1 / (1 + 1 - 1) = 1.0 — neighbor sets are both just the hub
    val one = graft.llm.GraphAlgs.linkPrediction(edges, minCommon = 1)
      .select("u", "w", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(one === Set((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0)))
  }

  // ------------------------------------------------------ IVF range search

  test("ivfRangeSearch returns every candidate above the threshold in " +
    "probed cells — no k cap, no self pairs") {
    val s = spark; import s.implicits._
    // two orthogonal cells; query 0 sits on the x axis. nProbe=1 probes
    // only the x cell, so the y-cluster vectors are out of reach even
    // though 0.3-similar ones would qualify — the IVF recall trade the
    // caller opted into.
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.95f, 0.05f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.05f, 0.95f)), (4L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val queries = vecs.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val cands = vecs.select(col("vec_id").as("neighbor_id"), col("embedding"))
    val cents = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("cid", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = graft.llm.Similarity
      .ivfRangeSearch(queries, cands, cents, nProbe = 1, minCos = 0.3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(got === Set((0L, 1L), (0L, 2L)))
  }

  // -------------------------------------- relational q51–q55 references

  test("q51 ordered string_agg matches a plain-Scala recomputation") {
    val got = run("q51_string_agg").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val exp = Catalog.t(spark, sf, "orders")
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).distinct.sorted.mkString("|") }
    assert(got === exp)
  }

  test("q52 deterministic mode and discrete median match a plain-Scala " +
    "recomputation") {
    val got = run("q52_mode_quantile").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    val joined = Catalog.t(spark, sf, "orders")
      .join(Catalog.t(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "o_orderpriority", "o_totalprice", "o_orderkey")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        math.round(r.getDouble(2) * 100), r.getLong(3)))
    val exp = joined.groupBy(_._1).map { case (seg, rows) =>
      val mode = rows.groupBy(_._2).map { case (p, v) => (p, v.size) }
        .toSeq.sortBy { case (p, c) => (-c, p) }.head._1
      val ranked = rows.map(r => (r._3, r._4)).sortBy(identity)
      val med = ranked((ranked.size + 1) / 2 - 1)._1 / 100.0
      seg -> ((mode, med))
    }
    assert(got === exp)
  }

  test("q53 running distinct window matches a plain-Scala recomputation") {
    val got = run("q53_window_distinct").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ev = Catalog.t(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val exp = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
      sorted.zipWithIndex.map { case ((_, _, id, _), i) =>
        id -> sorted.take(i + 1).map(_._4).distinct.size
      }
    }.toMap
    assert(got === exp)
  }

  test("q54 gaps-and-islands streaks match a plain-Scala recomputation") {
    val got = run("q54_streaks").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val dayMs = 86400000L
    val ev = Catalog.t(spark, sf, "events")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / dayMs))
    val exp = ev.groupBy(_._1).map { case (u, rows) =>
      val days = rows.map(_._2).distinct.sorted
      val runs = days.foldLeft(List.empty[List[Long]]) {
        case (cur :: rest, d) if d == cur.head + 1 => (d :: cur) :: rest
        case (acc, d) => List(d) :: acc
      }
      u -> ((runs.size.toLong, runs.map(_.size).max.toLong))
    }
    assert(got === exp)
  }

  test("q55 MAD matches a plain-Scala recomputation") {
    val got = run("q55_mad").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val li = Catalog.t(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
      .collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100),
        r.getLong(2), r.getInt(3)))
    def disc(rows: Seq[(Long, Long, Int)]): Long = {
      val sorted = rows.sortBy(identity).map(_._1)
      sorted((sorted.size + 1) / 2 - 1)
    }
    val exp = li.groupBy(_._1).map { case (f, rows) =>
      val med = disc(rows.map(r => (r._2, r._3, r._4)))
      val mad = disc(rows.map(r => (math.abs(r._2 - med), r._3, r._4)))
      f -> mad / 100.0
    }
    assert(got === exp)
  }

  test("q56 IGNORE NULLS navigation matches a plain-Scala forward-fill") {
    val got = run("q56_ignore_nulls").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    val orders = Catalog.t(spark, sf, "orders")
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), // o_orderdate reads as TIMESTAMP_NTZ
        r.getAs[java.time.LocalDateTime](1)
          .toEpochSecond(java.time.ZoneOffset.UTC),
        r.getLong(2), r.getDouble(3)))
    val exp = orders.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
      sorted.zipWithIndex.map { case ((_, _, key, _), i) =>
        val bigsSoFar = sorted.take(i + 1)
          .filter(_._4 > 200000).map(_._3)
        key -> ((bigsSoFar.headOption, bigsSoFar.lastOption,
          bigsSoFar.drop(1).headOption))
      }
    }.toMap
    assert(got === exp)
  }

  // ----------------------------------------- text t26–t28 references

  test("t26 readability counts match java.util.regex references") {
    val got = run("t26_readability").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val docs = Catalog.t(spark, sf, "documents")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    def cnt(t: String, re: String): Long =
      java.util.regex.Pattern.compile(re).matcher(t).results().count()
    docs.foreach { case (id, t) =>
      val (w, se, sy) = got(id)
      assert(w === cnt(t, "\\S+"), s"doc $id words")
      assert(se === math.max(cnt(t, "[.!?]+"), 1L), s"doc $id sents")
      assert(sy === cnt(t, "[aeiouyAEIOUY]+"), s"doc $id syll")
    }
  }

  test("t27/t28 class censuses match java.util.regex references and " +
    "partition the text") {
    def cnt(t: String, re: String): Long =
      java.util.regex.Pattern.compile(re).matcher(t).results().count()
    val texts = Catalog.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val t27 = run("t27_code_prose").collect()
    t27.foreach { r =>
      val t = texts(r.getLong(0))
      val sym = cnt(t, "[{}();=<>\\[\\]#]")
      assert(r.getLong(1) === sym, s"doc ${r.getLong(0)} n_sym")
      assert(r.getLong(3) === sym * 1000 / math.max(t.length, 1), "sym_per_k")
      assert(r.getBoolean(4) === (sym * 1000 >= 15L * math.max(t.length, 1)),
        "is_code verdict")
    }
    val t28 = run("t28_unicode_profile").collect()
    val lens = Catalog.t(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    t28.foreach { r =>
      val total = r.getLong(1) + r.getLong(2) + r.getLong(3) +
        r.getLong(4) + r.getLong(5)
      assert(total === lens(r.getLong(0)),
        s"doc ${r.getLong(0)}: classes must partition the text exactly")
    }
  }

  // --------------------------------------------- p17 dataset card

  test("p17 dataset card matches a plain-Scala recomputation") {
    val got = run("p17_dataset_card").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getLong(5), r.getLong(6)))).toMap
    val docs = Catalog.t(spark, sf, "documents")
      .select("source", "lang", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3).split(" ", -1).length.toLong))
    val exp = docs.groupBy(_._1).map { case (src, rows) =>
      val nDocs = rows.size.toLong
      val nTok = rows.map(_._4).sum
      val nLangs = rows.map(_._2).distinct.size.toLong
      val top = rows.groupBy(_._2).map { case (l, v) => (l, v.size) }
        .toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      val ranked = rows.map(r => (r._4, r._3)).sortBy(identity)
      val med = ranked((ranked.size + 1) / 2 - 1)._1
      val short = rows.count(_._4 < 50).toLong * 1000000L / nDocs
      src -> ((nDocs, nTok, nLangs, top, med, short))
    }
    assert(got === exp)
  }

  // --------------------------------------------- i08 bucketed join

  test("i08 bucketed join equals the plain shuffled join and plans " +
    "exchange-free") {
    val got = run("i08_bucketed_join").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val plain = Catalog.t(spark, sf, "orders")
      .join(Catalog.t(spark, sf, "lineitem"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        (sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
          .cast("double") / 100).as("rev"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got === plain)
    // the join itself (pre-aggregate) needs NO shuffle: both sides come
    // from the bucketed layout written above by the query run
    val probe = sources.IngestQueries.bucketedJoinPlanProbe(spark, sf)
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("ShuffleExchange") && !p.contains("Exchange hashpartitioning"), p)
  }

  // --------------------------------------------- st19 quality gate

  test("st19 streaming quality gate equals its batch formulation") {
    val got = run("st19_stream_quality_gate").collect()
      .map(r => (r.getString(0), r.getBoolean(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    import graft.llm.TextExprs._
    val en = stopwords.toMap.apply("en")
    val batch = Catalog.t(spark, sf, "documents")
      .withColumn("w", split(col("text"), " "))
      .select(col("lang"),
        expr("cast(size(w) as bigint)").as("n_words"),
        expr(s"((cast(${sparkStopHits(en)} as double) / greatest(size(w), 1)) * 0.5" +
          " + least(cast(size(w) as double) / 100, 1.0) * 0.5 >= 0.35" +
          " AND size(w) >= 5 AND size(w) <= 2000)").as("kept"))
      .groupBy("lang", "kept")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_words"))
      .collect()
      .map(r => (r.getString(0), r.getBoolean(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === batch)
    // both verdicts must actually occur at sf0.001 — a gate that keeps
    // (or rejects) everything isn't gating
    assert(got.keys.map(_._2).toSet === Set(true, false))
  }

  // ------------------------------------------- batch-2 operator specs

  test("c05 silhouette matches a plain-Scala recomputation") {
    val got = run("c05_silhouette").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val vecs = Catalog.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val cents = vecs.filter(_._1 % 100 == 0)
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def sqd(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + (a(i) - b(i)) * (a(i) - b(i)))
    val perPoint = vecs.map { case (id, v) =>
      val vn = math.sqrt(dot(v, v))
      // assignment by cosine (ties -> lowest cid), exactly assignCells
      val cid = cents.map { case (c, cv) =>
        (c, dot(v, cv) / (vn * math.sqrt(dot(cv, cv))))
      }.maxBy { case (c, cos) => (cos, -c) }._1
      val a2 = sqd(v, cents.find(_._1 == cid).get._2)
      val b2 = cents.filter(_._1 != cid).map(c => sqd(v, c._2)).min
      val s0 = if (math.max(math.sqrt(a2), math.sqrt(b2)) == 0) 0.0
        else (math.sqrt(b2) - math.sqrt(a2)) /
          math.max(math.sqrt(a2), math.sqrt(b2))
      (cid, math.round(s0 * 1e7))
    }
    val exp = perPoint.groupBy(_._1).map { case (cid, xs) =>
      cid -> ((xs.length.toLong, xs.map(_._2).sum / xs.length))
    }
    assert(got === exp)
  }

  test("t29 zipf slope matches a plain-Scala recomputation and sits in " +
    "a sane power-law band") {
    val Array(row) = run("t29_zipf_slope").collect()
    val words = Catalog.t(spark, sf, "documents")
      .select("text").collect().flatMap(_.getString(0).split(" ", -1))
    val top = words.groupBy(identity).map { case (w, v) => (w, v.size.toLong) }
      .toSeq.sortBy { case (w, c) => (-c, w) }.take(256)
    val pts = top.zipWithIndex.map { case ((_, c), i) =>
      (math.round(math.log(i + 1.0) / math.log(2) * 1000),
        math.round(math.log(c.toDouble) / math.log(2) * 1000))
    }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum.toDouble, pts.map(_._2).sum.toDouble)
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(row.getLong(0) === top.size.toLong) // full vocab when < 256
    assert(math.abs(row.getDouble(1) - slope) < 1e-9, s"got ${row.getDouble(1)} exp $slope")
    assert(slope < 0, "zipf slope must be negative")
  }

  test("p18 decontaminated mix: allocations sum to the budget, dropped " +
    "docs are exactly the contaminated train docs") {
    val rows = run("p18_decontaminated_mix").collect()
    assert(rows.map(_.getLong(2)).sum === 100000L, "largest-remainder total")
    val docs = Catalog.t(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shingles(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val evalSh = docs.filter(_._1 % 97 == 0).flatMap(d => shingles(d._3)).toSet
    val expDropped = docs.filter(d => d._1 % 97 != 0)
      .filter(d => shingles(d._3).exists(evalSh))
      .groupBy(_._2).map { case (s0, v) => s0 -> v.length.toLong }
    val gotDropped = rows.map(r => r.getString(0) -> r.getLong(3))
      .filter(_._2 > 0).toMap
    assert(gotDropped === expDropped)
  }

  test("m07 shard integrity checksums match the stub codec replayed in " +
    "plain Scala") {
    val got = run("m07_shard_integrity").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val fmts = Array("png", "jpeg", "wav", "mp4")
    val docs = Catalog.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .map { case (id, t) =>
        val bytes = t.getBytes("UTF-8")
        val ck = bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 4294967291L)
        (fmts((id % 4).toInt), id, bytes.length.toLong, ck)
      }
    val exp = docs.groupBy(_._1).flatMap { case (fmt, items) =>
      var cum = 0L
      items.sortBy(_._2).map { case (_, _, nb, ck) =>
        val shard = (cum / 8000L).toInt
        cum += nb
        (fmt, shard, nb, ck)
      }.groupBy(x => (x._1, x._2)).map { case (k, v) =>
        k -> ((v.length.toLong, v.map(_._3).sum, v.map(_._4).sum))
      }
    }
    assert(got === exp)
  }

  test("p19 interleave order matches a plain-Scala recomputation and is " +
    "a collision-free round-robin") {
    val got = run("p19_interleave_order").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // positions are globally distinct and congruent to the source index
    val positions = got.values.map(_._2).toSeq
    assert(positions.distinct.size === positions.size)
    val docs = Catalog.t(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val srcIdx = docs.map(_._2).distinct.sorted.zipWithIndex.toMap
    val nSrc = srcIdx.size
    def md5hex(s0: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val exp = docs.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      rows.map(_._1).toSeq.sortBy(id => (md5hex(id.toString), id)).zipWithIndex
        .map { case (id, rk) =>
          id -> ((src, rk.toLong * nSrc + srcIdx(src)))
        }
    }.toMap
    assert(got === exp)
  }

  test("s14 IVF stats match the cosine-argmax occupancy recomputed in " +
    "plain Scala") {
    val got = run("s14_ivf_stats").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val vecs = Catalog.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val cents = vecs.filter(_._1 % 100 == 0)
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val occ = vecs.map { case (_, v) =>
      val vn = math.sqrt(dot(v, v))
      cents.map { case (c, cv) =>
        (c, dot(v, cv) / (vn * math.sqrt(dot(cv, cv))))
      }.maxBy { case (c, cos) => (cos, -c) }._1
    }.groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
    val total = occ.values.sum
    val maxN = occ.values.max
    val exp = occ.map { case (c, n) =>
      c -> ((n, n * 1000000L / total, maxN * occ.size * 1000000L / total))
    }
    assert(got === exp)
  }

  test("st20 streaming anomaly gate equals its batch formulation and " +
    "flags a nonzero, minority share") {
    val got = run("st20_stream_anomaly_gate").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val n = got.values.map(_._1).sum
    val anom = got.values.map(_._2).sum
    assert(n === Catalog.t(spark, sf, "events").count())
    assert(anom > 0 && anom < n / 2,
      s"anomaly share $anom/$n should be a nonzero minority")
  }
}

package graft

import graft.llm.Pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit checks for the training-pipeline assembly operators on crafted
  * inputs with hand-computed expectations.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packSequences: concatenate-and-chunk bins, offsets, straddles") {
    // one shard, budget 10, docs of 4/8/3/10 tokens in doc_id order:
    // cum(excl) = 0, 4, 12, 15
    val docs = Seq(
      (1L, "a", 4L), (2L, "a", 8L), (3L, "a", 3L), (4L, "a", 10L)
    ).toDF("doc_id", "lang", "n")
    val got = Pipeline.packSequences(docs, 10L, col("lang"), col("doc_id"),
      col("n"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got === Map(
      1L -> (0L, 0L, false), // [0,4) in bin 0
      2L -> (0L, 4L, true),  // [4,12) straddles bins 0/1
      3L -> (1L, 2L, false), // [12,15) in bin 1
      4L -> (1L, 5L, true))) // [15,25) straddles bins 1/2
  }

  test("packSequences: shards pack independently") {
    val docs = Seq((1L, "a", 9L), (2L, "b", 9L), (3L, "a", 9L))
      .toDF("doc_id", "lang", "n")
    val got = Pipeline.packSequences(docs, 10L, col("lang"), col("doc_id"),
      col("n")).collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 0L)) // b restarts at 0
  }

  test("contamination: only docs sharing a 3-gram with eval are flagged") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),     // shares "the quick brown"
      (2L, "completely novel text here now") // no overlap
    ).toDF("doc_id", "text")
    val eval0 = Seq((100L, "the quick brown cat")).toDF("doc_id", "text")
    val got = Pipeline.contamination(train, eval0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L))
  }

  test("dupSpans: only cross-doc duplicated windows count, ratio exact") {
    // W=3 windows; docs 1 and 2 share exactly "a b c" (doc 1 windows:
    // [a b c, b c d]; doc 2: [x y z, y z a, z a b, a b c]); doc 3 has
    // no 3-word window at all (2 words) and must not appear
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "x y z a b c"),
      (3L, "q r")
    ).toDF("doc_id", "text")
    val got = graft.llm.Dedup.dupSpans(docs, windowWords = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got === Map(
      1L -> (2L, 1L, 0.5),
      2L -> (4L, 1L, 0.25)))
  }

  test("shingleNovelty: first-occurrence attribution and exact ratio") {
    // doc 1 introduces "a b c" and "b c d"; doc 2 repeats "a b c" and
    // introduces "c d e" ("b c d" shared via its window too); doc 3 has
    // <3 words -> absent
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c d e"),
      (3L, "x y")
    ).toDF("doc_id", "text")
    val got = Pipeline.shingleNovelty(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 1: shingles {a b c, b c d}, both first here -> 2/2
    // doc 2: shingles {a b c, b c d, c d e}, only "c d e" new -> 1/3
    assert(got === Map(
      1L -> (2L, 2L, 1.0),
      2L -> (3L, 1L, 1.0 / 3.0)))
  }

  test("mixAllocation: largest-remainder apportionment sums to budget") {
    // toks: a=5, b=3, c=2 (total 10), budget 7:
    // base = 3, 2, 1 (quotas 3.5/2.1/1.4); leftover 1 goes to the
    // largest remainder: a (rem 5), not b (rem 1) or c (rem 4)
    val docs = Seq(
      ("a", 5L), ("b", 3L), ("c", 2L)
    ).toDF("source", "n").withColumn("doc_id", monotonically_increasing_id())
    val got = Pipeline.mixAllocation(docs, col("source"), col("n"), 7L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    assert(got.values.sum === 7L)
  }

  test("stratifiedSample: deterministic, and rate-0 stratum drops all") {
    val docs = (1L to 200L).map(i => (i, s"src${i % 2}"))
      .toDF("doc_id", "source")
    val idx = expr("cast(substring(source, 4) as int) % 2")
    val got = Pipeline.stratifiedSample(docs, col("source"), idx,
      Seq(0.0, 1.0)).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // stratum 0 (even src0) rate 0 -> none; stratum 1 rate 1.0 -> all 100
    assert(got.size === 100)
    assert(got.forall(_._2 == "src1"))
    val again = Pipeline.stratifiedSample(docs, col("source"), idx,
      Seq(0.0, 1.0)).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === again)
  }

  test("balancedSample: exactly k per group, deterministic across runs") {
    val docs = (1L to 100L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val a = Pipeline.balancedSample(docs, col("lang"), 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a.size === 20)
    assert(a.count(_._2 == "en") === 10)
    assert(a.count(_._2 == "de") === 10)
    assert(a.forall(_._3 <= 10))
    val b = Pipeline.balancedSample(docs, col("lang"), 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("curriculumOrder: per-source easy-to-hard ranks cut into equal stages") {
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "a", 40L),
      (5L, "b", 99L)
    ).toDF("doc_id", "source", "n_chars")
    val got = Pipeline.curriculumOrder(docs, col("source"), col("n_chars"), 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(got(1L) === ((1L, 0))) // shortest -> first stage
    assert(got(2L) === ((2L, 0)))
    assert(got(3L) === ((3L, 1)))
    assert(got(4L) === ((4L, 1)))
    assert(got(5L) === ((1L, 0))) // singleton source: rank 1, stage 0
  }

  test("repeatUpsample: floor(w) copies plus md5-thresholded extra") {
    // independent md5 mirror of the operator's hash
    def h32(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val thrHalf = (0.5 * 4294967296.0).toLong
    val docs = (0L to 9L).map(i => (i, "s")).toDF("doc_id", "source")
    // w = 0.5: base 0 -> rows appear ONLY when hash under threshold
    // (exercises the empty-sequence guard for zero-copy rows)
    val gotHalf = Pipeline.repeatUpsample(docs, col("source"), lit(0), Seq(0.5))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val expHalf = (0L to 9L).filter(h32(_) < thrHalf).map((_, 1L))
    assert(gotHalf.sorted === expHalf.sorted)
    // w = 2.5: every row gets 2 or 3 copies, numbered 1..n
    val got25 = Pipeline.repeatUpsample(docs, col("source"), lit(0), Seq(2.5))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val exp25 = (0L to 9L).flatMap { i =>
      val n = 2L + (if (h32(i) < thrHalf) 1L else 0L)
      (1L to n).map(c => (i, c))
    }
    assert(got25.sorted === exp25.sorted)
  }
}

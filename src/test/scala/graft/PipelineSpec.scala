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
}

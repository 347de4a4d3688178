package graft

import graft.llm.GraphAlgs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 optimization internals:
  *
  *  - `GraphAlgs.adaptiveP`: the scale-adaptive partition count derives
  *    from the plan's sizeInBytes statistic, clamped to [1, conf] — a
  *    tiny relation collapses to one partition, an unknown/huge one
  *    keeps the configured parallelism (so nothing changes at scale).
  *  - `CheckpointStats.checkpointActualStats`: the one-shot memo pin
  *    carries the checkpoint's ACTUAL stored size, not the origin
  *    plan's estimate, with values and row counts untouched.
  *  - `GraphAlgs.modularity`: m2 now derives from the degree table
  *    (Σ deg) instead of a third edge scan — results must stay
  *    bit-identical, including the empty-edge case whose m2 must stay
  *    exactly count(*)'s 0, not sum's NULL.
  */
class RoundSeventeenOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("adaptiveP collapses a tiny relation to one partition and keeps " +
    "the configured parallelism when the statistic is huge") {
    val tiny = spark.range(100).toDF("id").localCheckpoint(true)
    val tinyStats = org.apache.spark.sql.graftshim.CheckpointStats
      .checkpointActualStats(spark.range(100).toDF("id"))
    assert(GraphAlgs.adaptiveP(tinyStats, 32) === 1)
    // a parquet-less huge estimate: cross joins inflate sizeInBytes
    val big = tiny.crossJoin(tiny).crossJoin(tiny).crossJoin(tiny)
      .crossJoin(tiny)
    assert(GraphAlgs.adaptiveP(big, 32) === 32)
    // clamp floor: even a zero/unknown size never returns < 1
    assert(GraphAlgs.adaptiveP(tinyStats, 1) === 1)
  }

  test("checkpointActualStats: values identical, statistic is the " +
    "stored size (not the origin estimate), layout recovered") {
    val origin = spark.range(1000).toDF("id")
      .withColumn("v", col("id") * 3)
      .repartition(4, col("id"))
    val pinned = org.apache.spark.sql.graftshim.CheckpointStats
      .checkpointActualStats(origin)
    // values and count untouched
    assert(pinned.count() === 1000)
    assert(pinned.agg(sum(col("v"))).first().getLong(0) ===
      (0L until 1000L).map(_ * 3).sum)
    // the statistic is the actual stored size: positive and far below
    // any estimate-poisoned figure (1000 rows of two longs store in
    // well under 1 MB)
    val sz = pinned.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(sz > 0 && sz < BigInt(1024 * 1024), s"sizeInBytes=$sz")
    // layout recovery: the explicit hash(id)%4 layout survives the pin
    // (stock checkpoint under AQE stores UnknownPartitioning)
    val part = pinned.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
      .outputPartitioning
    assert(part.toString.contains("hashpartitioning"), part.toString)
  }

  test("modularity: m2 from Σ deg matches the direct edge count, " +
    "including the empty-edge case") {
    // planted: a 3-clique community (ids 1-3), a 2-path community
    // (4-5), one isolated node (6)
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L),
      (5L, 20L), (6L, 30L)).toDF("id", "community")
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L))
      .toDF("src", "dst")
    val got = GraphAlgs.modularity(labels, edges)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // m2 = 8 symmetrized rows; clique: intra2=6, D=6: (8*6-36)/64
    assert(got(10L) === ((3L, 3L, 6L, (8.0 * 6 - 36) / 64)))
    // path: intra2=2, D=2: (8*2-4)/64
    assert(got(20L) === ((2L, 1L, 2L, (8.0 * 2 - 4) / 64)))
    // isolated: intra2=0, D=0 -> contribution exactly 0
    assert(got(30L) === ((1L, 0L, 0L, 0.0)))
    // empty edges: m2 = Σ deg coalesces to exactly count(*)'s 0, so the
    // contribution division hits the SAME ANSI divide-by-zero the stock
    // count-based m2 produced — behavior unchanged, pinned here
    val ex = intercept[Exception] {
      GraphAlgs.modularity(labels,
        Seq.empty[(Long, Long)].toDF("src", "dst")).collect()
    }
    assert(ex.getMessage.contains("DIVIDE_BY_ZERO"), ex.getMessage)
  }
}

package graft

import graft.llm.GraphAlgs

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Unit checks for the reusable graph API on a crafted graph: a 1-2-3
  * chain plus an isolated node 4. The PageRank expectations are the
  * exact integers an independent DuckDB recursive-CTE implementation of
  * the same fixed-point arithmetic produces — cross-engine constants,
  * not self-derived.
  */
class GraphAlgsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
  private def edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")

  test("connectedComponents: chain collapses to min id, singleton kept") {
    val got = GraphAlgs.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("pageRank: bit-exact fixed-point ranks (DuckDB cross-check values)") {
    val got = GraphAlgs.pageRank(nodes, edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 167084492187L, 2L -> 415831015625L,
      3L -> 167084492187L, 4L -> 37500000000L))
  }

  test("empty graph returns empty results, no division by zero") {
    val none = Seq.empty[Long].toDF("id")
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(GraphAlgs.connectedComponents(none, noEdges).count() === 0)
    assert(GraphAlgs.pageRank(none, noEdges).count() === 0)
  }

  test("isolated nodes keep exactly the base rank") {
    val got = GraphAlgs.pageRank(nodes, edges, iters = 5)
      .filter(col("id") === 4L).collect()(0).getLong(1)
    val base = (15L * (1000000000000L / 4)) / 100L
    assert(got === base)
  }
}

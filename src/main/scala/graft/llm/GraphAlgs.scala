package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reusable distributed graph algorithms over plain DataFrames — the
  * library surface behind the d08/g01 gate queries. Both take:
  *
  *  - `nodes`: one numeric `id` column (distinct);
  *  - `edges`: `src`/`dst` pairs of node ids (treated as UNDIRECTED —
  *    symmetrized internally, so pass each pair once).
  *
  * Both iterate with eager `localCheckpoint` per round: with `cache()`
  * alone a self-referencing iteration doubles the analyzed logical plan
  * every round and Catalyst analysis time grows exponentially. At a
  * real 100 TB deployment the same calls run unchanged — checkpoints
  * land on executor storage and every step is an equi-join keyed by
  * node id.
  */
object GraphAlgs {

  private def debug(msg: => String): Unit =
    if (sys.env.contains("GRAFT_DEBUG")) System.err.println(msg)

  /** Symmetrized, cached edge list. Callers own the unpersist. */
  private def undirected(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst"))).cache()
  }

  /** Connected components by min-label propagation with a pointer-jump
    * step (`l(v) ← l(l(v))`), converging in O(log diameter) rounds
    * instead of O(diameter). Returns `(id, component)` where the
    * component id is the minimum node id of the component — canonical
    * and independent of partitioning. Labels only decrease, so
    * `sum(label)` is a monotone potential and one cheap aggregate per
    * round detects the fixpoint.
    */
  def connectedComponents(
      nodes: DataFrame,
      edges: DataFrame,
      maxRounds: Int = 40): DataFrame = {
    val e = undirected(edges)
    val labels0 = nodes.select(col("id"))
      .withColumn("label", col("id")).cache()
    var labels = labels0
    // coalesce: sum over zero rows is null (empty graph must not NPE)
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("label")), lit(0L))).first().getLong(0)
    var prevSum = Long.MaxValue
    var curSum = labelSum(labels)
    var round = 0
    while (curSum != prevSum && round < maxRounds) {
      val tr = System.nanoTime()
      // (1) min label among self and neighbors
      val nbrMin = e.join(labels, e("src") === labels("id"))
        .groupBy(col("dst").as("nid")).agg(min(col("label")).as("nlabel"))
      val l1 = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint(true)
      // (2) pointer jump: adopt the label of the current label (labels
      // are always node ids, so the self-join is total)
      val ptr = l1.select(col("id").as("pid"), col("label").as("plabel"))
      val next = l1.join(ptr, l1("label") === ptr("pid"))
        .select(l1("id"), least(l1("label"), col("plabel")).as("label"))
        .localCheckpoint(true)
      prevSum = curSum
      curSum = labelSum(next)
      labels = next
      round += 1
      debug(s"[cc] round $round sum=$curSum " +
        f"took=${(System.nanoTime() - tr) / 1e9}%.1fs")
    }
    e.unpersist()
    labels0.unpersist()
    if (curSum != prevSum)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds")
    labels.select(col("id"), col("label").as("component"))
  }

  /** Integer-exact PageRank: fixed-point arithmetic (`scale`, damping
    * 85/100, floor division) makes a fixed iteration count bit-identical
    * under any partitioning or summation order. Dangling mass is not
    * redistributed (isolated nodes keep the base rank). Returns
    * `(id, rank)` with rank on the integer scale.
    */
  def pageRank(
      nodes: DataFrame,
      edges: DataFrame,
      iters: Int = 5,
      scale: Long = 1000000000000L): DataFrame = {
    // cached: the edge set appears on BOTH sides of the deg bake-in join
    // below — uncached it would evaluate its lineage twice
    val e = undirected(edges)
    val deg = e.groupBy(col("src").as("dnode")).agg(count(lit(1)).as("deg"))
    // degree is loop-invariant: bake it onto the edge list ONCE so each
    // iteration is a single broadcast join + partial-agg shuffle
    val edgesWithDeg = e.join(deg, col("src") === col("dnode"))
      .select(col("src"), col("dst"), col("deg")).cache()
    val n0 = nodes.select(col("id")).cache()
    val n = n0.count()
    if (n == 0) { // empty graph: no ranks (and no division by zero)
      e.unpersist(); edgesWithDeg.unpersist(); n0.unpersist()
      return n0.select(col("id"), col("id").as("rank"))
    }
    val init = scale / n
    val base = (15L * init) / 100L
    debug(s"[pagerank] n=$n edges cached")
    var pr = n0.withColumn("val", lit(init))
    for (it <- 1 to iters) {
      val tr = System.nanoTime()
      // broadcast the rank table: checkpointed RDDs carry no stats, so
      // without the hint Spark shuffles the full edge list every
      // iteration. (At a scale where ranks outgrow broadcast, the
      // alternative is co-partitioning edges and ranks on the key once.)
      val contrib = broadcast(pr)
        .join(edgesWithDeg, pr("id") === edgesWithDeg("src"))
        .groupBy(col("dst"))
        .agg(sum(expr("val div deg")).as("msum"))
      pr = n0.join(broadcast(contrib), n0("id") === contrib("dst"), "left")
        .select(n0("id"),
          (lit(base) + expr("(85 * coalesce(msum, 0L)) div 100")).as("val"))
        .localCheckpoint(true)
      debug(f"[pagerank] iter $it took=${(System.nanoTime() - tr) / 1e9}%.1fs")
    }
    e.unpersist()
    edgesWithDeg.unpersist()
    n0.unpersist()
    pr.select(col("id"), col("val").as("rank"))
  }
}

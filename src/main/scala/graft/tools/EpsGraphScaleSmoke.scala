package graft.tools

import graft.Catalog
import graft.llm.Similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured evidence for round 10's c11 de-cartesian: the DBSCAN
  * epsilon graph now comes from d06's banded sign-LSH candidates
  * (`embeddingNearDups`) instead of an all-pairs panel join. This smoke
  * grows a synthetic 64-dim corpus 1×/2×/4× and measures, per scale:
  *
  *   - the LSH path: candidate pairs examined, epsilon edges found,
  *     and wall time;
  *   - the all-pairs baseline: pairs examined (N(N-1)/2 by
  *     construction) and wall time, run only at the smallest scale —
  *     the point of the fix is that this number is unrunnable at
  *     corpus scale, so larger scales report the computed pair count.
  *
  * Corpus shape mirrors what DBSCAN is for: every 100-id block plants
  * a 5-member cluster (shared base direction + small per-vector
  * perturbation, pairwise cosine ≈ 0.96), the other 95 vectors are
  * pseudo-random noise — so true epsilon-edge mass grows LINEARLY in N
  * (10 in-cluster pairs per block) while the all-pairs join grows
  * quadratically. Vectors are generated distributed (hash-of-index
  * floats via Spark SQL, no driver materialization) and deterministic,
  * so reruns reproduce the same numbers.
  *
  * Run: `sbt "runMain graft.tools.EpsGraphScaleSmoke"`.
  * Prints one JSON line per (scale, path); record lands in PLANS.md.
  */
object EpsGraphScaleSmoke {

  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-eps-graph-scale-smoke")
      .config("spark.sql.shuffle.partitions", "32")
    Catalog.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    // deterministic synthetic corpus: id % 100 < 5 → cluster member of
    // block (id div 100): shared base direction + 0.15-amplitude
    // per-vector jitter (pairwise cos ≈ 0.96 > 0.35); else noise vector
    def corpus(n: Long): DataFrame = {
      val base = "transform(sequence(0L, 63L), i -> " +
        "cast(pmod(hash(vec_id div 100, i), 1000) - 500 as float) / 500.0F)"
      val jitter = "transform(sequence(0L, 63L), i -> " +
        "cast(pmod(hash(vec_id, i), 1000) - 500 as float) / 500.0F)"
      spark.range(n).toDF("vec_id")
        .withColumn("embedding",
          expr(s"""CASE WHEN vec_id % 100 < 5
                  |THEN zip_with($base, $jitter, (b, j) -> b + 0.15F * j)
                  |ELSE $jitter END""".stripMargin))
    }

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // Round 11 adds the RECALL axis the round-10 advisory asked for:
    // at eps = 0.35 the d06 family (8×12, tuned for cos ≥ 0.9) found
    // only ~9.5% of the exact epsilon edges (r10 artifact: 10,705 of
    // 113,056 at 10k) — core/border roles were banding artifacts. c11
    // now ships its own 16×4 family; this smoke measures, per family
    // and scale: candidate mass, eps edges, and edge recall vs the
    // exact baseline (computable at 1×/2×). The honest cost is printed,
    // not hidden: at low eps a high-recall hyperplane family collides
    // on ~64% of even orthogonal pairs, so candidate mass approaches
    // all-pairs — the SCALE control for c11 is the bounded panel (N/5
    // audit slice), banding keeps the join keyed instead of cartesian.
    val eps = 0.35
    Seq(1, 2, 4).foreach { scale =>
      val n = 10000L * scale
      val vecs = corpus(n).cache()
      vecs.count()

      // full-corpus exact baseline (runnable at 1×/2× only) — recall
      // denominator for the full-corpus 8×12 row
      val allPairs = n * (n - 1) / 2
      val (edgesExact, exactS) =
        if (scale <= 2) {
          val r = timed { Similarity.embeddingNearDups(vecs, eps, exact = true).count() }
          (Some(r._1), Some(r._2))
        } else (None, None)
      println(s"""{"metric":"eps_graph_scale_smoke","bands":"n/a","path":"all_pairs",""" +
        s""""n_vecs":$n,"pairs_examined":$allPairs,""" +
        s""""pairs_per_vec":${"%.1f".format(allPairs.toDouble / n)},""" +
        s""""eps_edges":${edgesExact.map(_.toString).getOrElse("null")},""" +
        s""""total_s":${exactS.map(t => "%.1f".format(t)).getOrElse("null")}""" +
        (if (scale > 2) ""","note":"baseline not run at 4x - the retired shape"""" else "") +
        "}")

      // d06's 8×12 family over the FULL corpus (r10 continuity row):
      // scale-safe candidate mass, but ~9.5% edge recall at this low
      // eps — right family for cos ≥ 0.9 dedup, wrong one for c11
      val (candPairs, candS) = timed { Similarity.lshCandidatePairs(vecs).count() }
      val (edges, lshS) = timed { Similarity.embeddingNearDups(vecs, eps).count() }
      val recallFull = edgesExact
        .map(e => "%.3f".format(edges.toDouble / e)).getOrElse("null")
      println(s"""{"metric":"eps_graph_scale_smoke","bands":"8x12 (d06, cos>=0.9 tuned)","path":"lsh_banded_full",""" +
        s""""n_vecs":$n,"pairs_examined":$candPairs,""" +
        s""""pairs_per_vec":${"%.1f".format(candPairs.toDouble / n)},""" +
        s""""eps_edges":$edges,"edge_recall_at_eps":$recallFull,""" +
        s""""candidates_s":${"%.1f".format(candS)},""" +
        s""""total_s":${"%.1f".format(lshS)}}""")

      // c11's SHIPPED shape: the N/5 audit panel under the eps-tuned
      // 16×4 family. The exact panel baseline is runnable at every
      // scale (|panel|²/2 pairs), so edge recall is MEASURED, not
      // theorized, at each corpus size.
      val panel = vecs.filter(col("vec_id") % 5 === 0).cache()
      val np = panel.count()
      val (pExact, pExactS) = timed {
        Similarity.embeddingNearDups(panel, eps, exact = true).count()
      }
      val (pCand, pCandS) = timed {
        Similarity.lshCandidatePairs(panel, 16, 4).count()
      }
      val (pEdges, pLshS) = timed {
        Similarity.embeddingNearDups(panel, eps, bands = 16, rowBits = 4).count()
      }
      println(s"""{"metric":"eps_graph_scale_smoke","bands":"16x4 (c11 r11-shipped, eps-tuned)","path":"lsh_banded_panel",""" +
        s""""n_vecs":$n,"panel_vecs":$np,"pairs_examined":$pCand,""" +
        s""""pairs_per_panel_vec":${"%.1f".format(pCand.toDouble / np)},""" +
        s""""eps_edges":$pEdges,"panel_exact_edges":$pExact,""" +
        s""""edge_recall_at_eps":${"%.3f".format(pEdges.toDouble / pExact)},""" +
        s""""exact_baseline_s":${"%.1f".format(pExactS)},""" +
        s""""candidates_s":${"%.1f".format(pCandS)},""" +
        s""""total_s":${"%.1f".format(pLshS)}}""")
      panel.unpersist()
      vecs.unpersist()
    }
    spark.stop()
  }
}

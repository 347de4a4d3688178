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

    val eps = 0.35
    Seq(1, 2, 4).foreach { scale =>
      val n = 10000L * scale
      val vecs = corpus(n).cache()
      vecs.count()

      // LSH path (the shipped c11 currency): candidates examined =
      // distinct same-(band,bucket) pairs; edges = cosine ≥ eps on them
      val (candPairs, candS) = timed {
        Similarity.lshCandidatePairs(vecs).count()
      }
      val ((edges, lshS)) = timed {
        Similarity.embeddingNearDups(vecs, eps).count()
      }
      val bands = s"${Similarity.NdBands}x${Similarity.NdRowBits}"
      println(s"""{"metric":"eps_graph_scale_smoke","bands":"$bands","path":"lsh_banded",""" +
        s""""n_vecs":$n,"pairs_examined":$candPairs,""" +
        s""""pairs_per_vec":${"%.1f".format(candPairs.toDouble / n)},""" +
        s""""eps_edges":$edges,"candidates_s":${"%.1f".format(candS)},""" +
        s""""total_s":${"%.1f".format(lshS)}}""")

      // all-pairs baseline: run it only at 1× (the r9 shape this fix
      // retired); at larger scales only the computed join size
      val allPairs = n * (n - 1) / 2
      if (scale == 1) {
        val (edgesExact, exactS) = timed {
          Similarity.embeddingNearDups(vecs, eps, exact = true).count()
        }
        println(s"""{"metric":"eps_graph_scale_smoke","bands":"n/a","path":"all_pairs",""" +
          s""""n_vecs":$n,"pairs_examined":$allPairs,""" +
          s""""pairs_per_vec":${"%.1f".format(allPairs.toDouble / n)},""" +
          s""""eps_edges":$edgesExact,"total_s":${"%.1f".format(exactS)}}""")
      } else {
        println(s"""{"metric":"eps_graph_scale_smoke","bands":"n/a","path":"all_pairs",""" +
          s""""n_vecs":$n,"pairs_examined":$allPairs,""" +
          s""""pairs_per_vec":${"%.1f".format(allPairs.toDouble / n)},""" +
          s""""eps_edges":null,"total_s":null,"note":"not run - this is the retired shape"}""")
      }
      vecs.unpersist()
    }
    spark.stop()
  }
}

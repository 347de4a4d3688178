package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe (guide §1): reproduces the pagerank loop's
  * per-iteration plan shape on synthetic data of the gate graph's size
  * and times each variant, to isolate WHAT costs ~0.35s/task in the
  * per-iteration broadcast-build stage that JobProfile surfaced.
  * Variants: full shape, no integral-divide expr, no broadcast hint on
  * the rank table, no second broadcast (contrib join co-partitioned),
  * agg only (no join), join only (no agg).
  *
  * Usage: `sbt "runMain graft.tools.LoopShapeProbe"`.
  */
object LoopShapeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .appName("loopshape").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.Catalog.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = cpus.toInt

    val n = 5000L
    val nodes = spark.range(n).select(col("id")).repartition(p, col("id")).cache()
    nodes.count()
    // ~88k directed edges with degrees baked in, like edgesWithDeg
    val e0 = spark.range(88000).select(
      (col("id") % n).as("src"), ((col("id") * 7919) % n).as("dst"))
    val deg = e0.groupBy(col("src").as("dnode")).agg(count(lit(1)).as("deg"))
    val edges = e0.join(deg, col("src") === col("dnode"))
      .select(col("src"), col("dst"), col("deg"))
      .repartition(p, col("src")).cache()
    edges.count()

    var pr = nodes.select(col("id"), lit(1000000L).as("val"))
      .localCheckpoint(true)

    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    def iterate(tag: String, iters: Int)(step: org.apache.spark.sql.DataFrame
        => org.apache.spark.sql.DataFrame): Unit = {
      var cur = pr
      time(tag) {
        for (_ <- 1 to iters) cur = step(cur).localCheckpoint(true)
      }
    }

    // warmup one full iteration (JIT + codegen)
    iterate("warmup", 2) { cur =>
      val contrib = broadcast(cur)
        .join(edges, cur("id") === edges("src"))
        .groupBy(col("dst")).agg(sum(expr("val div deg")).as("msum"))
      nodes.join(broadcast(contrib), nodes("id") === contrib("dst"), "left")
        .select(nodes("id"),
          (lit(100L) + expr("(85 * coalesce(msum, 0L)) div 100")).as("val"))
    }

    iterate("full-shape   ", 5) { cur =>
      val contrib = broadcast(cur)
        .join(edges, cur("id") === edges("src"))
        .groupBy(col("dst")).agg(sum(expr("val div deg")).as("msum"))
      nodes.join(broadcast(contrib), nodes("id") === contrib("dst"), "left")
        .select(nodes("id"),
          (lit(100L) + expr("(85 * coalesce(msum, 0L)) div 100")).as("val"))
    }

    iterate("no-div       ", 5) { cur =>
      val contrib = broadcast(cur)
        .join(edges, cur("id") === edges("src"))
        .groupBy(col("dst")).agg(sum(col("val") + col("deg")).as("msum"))
      nodes.join(broadcast(contrib), nodes("id") === contrib("dst"), "left")
        .select(nodes("id"),
          (lit(100L) + expr("(85 * coalesce(msum, 0L)) div 100")).as("val"))
    }

    iterate("no-contrib-bc", 5) { cur =>
      val contrib = broadcast(cur)
        .join(edges, cur("id") === edges("src"))
        .groupBy(col("dst")).agg(sum(expr("val div deg")).as("msum"))
      nodes.join(contrib.repartition(p, col("dst")),
          nodes("id") === contrib("dst"), "left")
        .select(nodes("id"),
          (lit(100L) + expr("(85 * coalesce(msum, 0L)) div 100")).as("val"))
    }

    iterate("agg-only     ", 5) { cur =>
      val contrib = broadcast(cur)
        .join(edges, cur("id") === edges("src"))
        .groupBy(col("dst")).agg(sum(expr("val div deg")).as("msum"))
      contrib.select(col("dst").as("id"), col("msum").as("val"))
    }

    iterate("join-only    ", 5) { cur =>
      broadcast(cur).join(edges, cur("id") === edges("src"))
        .select(edges("dst").as("id"), col("val"))
        .limit(5000).select(col("id"), col("val"))
    }

    // co-partitioned variant: rank table keeps hash(id)%p through the
    // shim's layout recovery; both joins are SHUFFLE_HASH pinned and
    // should need ZERO exchanges beyond the one contrib agg shuffle
    var pr2 = org.apache.spark.sql.graftshim.CheckpointStats
      .checkpointSevered(nodes.select(col("id"), lit(1000000L).as("val")))
    def iterate2(tag: String, iters: Int)(step: org.apache.spark.sql.DataFrame
        => org.apache.spark.sql.DataFrame): Unit = {
      var cur = pr2
      time(tag) {
        for (_ <- 1 to iters) cur =
          org.apache.spark.sql.graftshim.CheckpointStats.checkpointSevered(
            step(cur))
      }
    }
    iterate2("warmup2      ", 2) { cur =>
      val contrib = cur.hint("shuffle_hash")
        .join(edges, cur("id") === edges("src"))
        .groupBy(col("dst")).agg(sum(expr("val div deg")).as("msum"))
      nodes.join(contrib.hint("shuffle_hash"),
          nodes("id") === contrib("dst"), "left")
        .select(nodes("id"),
          (lit(100L) + expr("(85 * coalesce(msum, 0L)) div 100")).as("val"))
    }
    iterate2("copart-shj   ", 5) { cur =>
      val contrib = cur.hint("shuffle_hash")
        .join(edges, cur("id") === edges("src"))
        .groupBy(col("dst")).agg(sum(expr("val div deg")).as("msum"))
      nodes.join(contrib.hint("shuffle_hash"),
          nodes("id") === contrib("dst"), "left")
        .select(nodes("id"),
          (lit(100L) + expr("(85 * coalesce(msum, 0L)) div 100")).as("val"))
    }
    // same but keep the explicit broadcast only on the rank side
    iterate2("bc-pr+shj-agg", 5) { cur =>
      val contrib = broadcast(cur)
        .join(edges, cur("id") === edges("src"))
        .groupBy(col("dst")).agg(sum(expr("val div deg")).as("msum"))
      nodes.join(contrib.hint("shuffle_hash"),
          nodes("id") === contrib("dst"), "left")
        .select(nodes("id"),
          (lit(100L) + expr("(85 * coalesce(msum, 0L)) div 100")).as("val"))
    }
    // print the last plan so the exchange/broadcast count is visible
    val contrib = pr2.hint("shuffle_hash")
      .join(edges, pr2("id") === edges("src"))
      .groupBy(col("dst")).agg(sum(expr("val div deg")).as("msum"))
    nodes.join(contrib.hint("shuffle_hash"),
        nodes("id") === contrib("dst"), "left")
      .select(nodes("id"),
        (lit(100L) + expr("(85 * coalesce(msum, 0L)) div 100")).as("val"))
      .explain()

    spark.stop()
  }
}

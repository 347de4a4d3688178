package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 guards for the graftshim's FALLBACK paths (r15 verdict
  * item 5): the shim leans on private Spark internals
  * (`Dataset.ofRows`, LogicalRDD's private ctor list,
  * `AdaptiveSparkPlanExec.finalPhysicalPlan`), and its safety story is
  * that every internals assumption degrades to STOCK behavior rather
  * than a wrong answer. These specs exercise each degradation so a
  * Spark version bump that changes the internals turns into a visible
  * red here (or in the layout pins) instead of a silent data bug.
  */
class GraftShimFallbackSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("severStats on a NON-checkpoint plan takes the Row round-trip " +
    "fallback and preserves values") {
    val df = spark.range(100)
      .select(col("id"), (col("id") % 3).as("k"))
    // analyzed plan is a Range, not a LogicalRDD → fallback path
    assert(!CheckpointStats.canSever(df))
    val severed = CheckpointStats.severStats(df)
    assert(severed.count() === 100L)
    assert(severed.agg(sum(col("k"))).head().getLong(0) ===
      df.agg(sum(col("k"))).head().getLong(0))
    assert(severed.schema === df.schema)
  }

  test("checkpointSevered under DISABLED AQE keeps stock's layout " +
    "(the recoverLayout early-return) and stays correct") {
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.range(512)
        .select(col("id").as("src"), (col("id") % 5).as("lbl"))
        .repartition(4, col("src"))
      val severed = CheckpointStats.checkpointSevered(df, reliable = false)
      // without AQE, stock checkpoint already stores the real layout —
      // recoverLayout must keep it (early return), not damage it
      val lrdd = severed.queryExecution.analyzed
        .collectFirst { case l: LogicalRDD => l }.get
      assert(lrdd.outputPartitioning.isInstanceOf[HashPartitioning],
        s"non-AQE layout lost: ${lrdd.outputPartitioning}")
      assert(severed.count() === 512L)
      // stats still severed on this path
      assert(severed.queryExecution.optimizedPlan.stats.sizeInBytes ===
        BigInt(spark.sessionState.conf.defaultSizeInBytes))
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("recoverLayout with MISALIGNED origin output falls back to " +
    "stock's stored layout") {
    val df = spark.range(256)
      .select(col("id").as("src"), (col("id") % 5).as("lbl"))
      .repartition(4, col("src"))
    val cp = df.localCheckpoint(true)
    val l = cp.queryExecution.analyzed
      .collectFirst { case lr: LogicalRDD => lr }.get
    // under AQE the stock checkpoint stored UnknownPartitioning — the
    // precondition for the repair attempt
    assert(l.outputPartitioning.isInstanceOf[UnknownPartitioning])
    // an executed AQE origin whose OUTPUT NAMES do not match the
    // checkpoint's: the remap must refuse (aligned = false) and return
    // stock's answer instead of stitching wrong attributes
    val renamed = spark.range(256)
      .select(col("id").as("other"), (col("id") % 5).as("names"))
      .repartition(4, col("other"))
    renamed.write.format("noop").mode("overwrite").save()
    val (part, ord) = CheckpointStats.recoverLayout(renamed, l)
    assert(part === l.outputPartitioning,
      "misaligned remap must keep stock partitioning")
    assert(ord === l.outputOrdering)
  }

  test("recoverLayout with a NON-AQE executed origin returns stock") {
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    // build an AQE checkpoint first (UnknownPartitioning stored)
    val df = spark.range(128)
      .select(col("id").as("src"))
      .repartition(4, col("src"))
    val cp = df.localCheckpoint(true)
    val l = cp.queryExecution.analyzed
      .collectFirst { case lr: LogicalRDD => lr }.get
    assert(l.outputPartitioning.isInstanceOf[UnknownPartitioning])
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val nonAqe = spark.range(128)
        .select(col("id").as("src"))
        .repartition(4, col("src"))
      nonAqe.write.format("noop").mode("overwrite").save()
      val (part, _) = CheckpointStats.recoverLayout(nonAqe, l)
      assert(part === l.outputPartitioning,
        "non-AQE origin must keep stock partitioning")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("checkpointSevered preserves values and schema on an empty frame") {
    val df = spark.range(0)
      .select(col("id").as("src"), (col("id") % 2).as("lbl"))
      .repartition(2, col("src"))
    val severed = CheckpointStats.checkpointSevered(df, reliable = false)
    assert(severed.count() === 0L)
    assert(severed.schema === df.schema)
  }
}

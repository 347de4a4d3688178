package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeMap, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, UnknownPartitioning}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The one-file internals shim behind `GraphAlgs.Rounds.truncate`
  * (round-14 finding, round-15 fix). Two defects in stock
  * `Dataset.checkpoint` hurt iterative DataFrame algorithms:
  *
  *  1. **Inherited statistics square per round.** The checkpoint's
  *     `LogicalRDD` COPIES the origin plan's `Statistics`
  *     (`originStats`), and a self-referential iteration joins the
  *     previous table with a derivative of itself — so the carried
  *     `sizeInBytes` SQUARES each round, its bit-length doubles, and
  *     by round ~18 the driver is multiplying multi-megabyte
  *     BigIntegers inside `SizeInBytesOnlyStatsPlanVisitor` (the
  *     100×-scale d08 curation stage measured 2.5 s → 80 s round
  *     walls from exactly this).
  *  2. **AQE erases the checkpoint's layout.** `LogicalRDD
  *     .fromDataset` reads `executedPlan.outputPartitioning`, but
  *     under adaptive execution the executed plan is an
  *     `AdaptiveSparkPlanExec`, which never overrides
  *     `outputPartitioning` — so the checkpoint stores
  *     `UnknownPartitioning` even though the eager execution already
  *     decided (and materialized) the real layout, and every
  *     downstream same-key join/aggregate pays a fresh Exchange.
  *
  * Round 14 severed the stats by rebuilding through
  * `createDataFrame(cp.rdd, cp.schema)`, which works but pays twice:
  * the Row round-trip re-encodes every row on every downstream pass
  * AND discards partitioning (measured ~1–2 s per g-family gate query
  * when paid every round), which forced an every-16th-call
  * compromise. [[checkpointSevered]] does the minimal correct thing
  * instead: run the stock (local/reliable) checkpoint, then rebuild
  * the Dataset around a NEW `LogicalRDD` that shares the checkpoint's
  * `RDD[InternalRow]` — zero re-encode — carries `originStats = None`
  * (stats fall back to the bounded session default, exactly what
  * `createDataFrame` produced), and repairs the layout by remapping
  * the executed AQE final plan's `outputPartitioning`/`outputOrdering`
  * onto the logical output attributes (best-effort: any attribute the
  * remap cannot place falls back to what stock checkpoint stored).
  *
  * Lives under `org.apache.spark.sql` because `Dataset.ofRows` and
  * `LogicalRDD`'s second parameter list are `private[sql]` — the
  * standard pattern for extensions that must construct logical plans
  * directly. Pure Spark-internals plumbing; cites nothing external.
  *
  * **Spark-upgrade contract (round 16, from the r15 verdict):** every
  * internals dependency here degrades to STOCK behavior, never to a
  * wrong answer — a non-`LogicalRDD` checkpoint plan falls back to the
  * round-14 Row round-trip, a non-AQE (or output-misaligned, or
  * throwing) `finalPhysicalPlan` keeps whatever layout stock
  * checkpoint stored, and any attribute the remap cannot place keeps
  * stock's answer. GraftShimFallbackSpec exercises each of those
  * paths; on a Spark version bump re-run it together with
  * RoundFifteenOpsSpec's severed-stats/layout pins FIRST — if the
  * repair stops firing, results stay correct and only the
  * zero-Exchange plan pins fail, which is the designed failure mode.
  */
object CheckpointStats {

  /** True when [[severStats]] will take the zero-copy path for `df`
    * (its analyzed plan is exactly a [[LogicalRDD]] — e.g. the result
    * of `checkpoint()`/`localCheckpoint()`).
    */
  def canSever(df: DataFrame): Boolean =
    df.queryExecution.analyzed.isInstanceOf[LogicalRDD]

  /** Eagerly checkpoint `df` (reliable when `reliable`, else local)
    * and return a frame with inherited stats severed and the executed
    * plan's real layout attached. The drop-in replacement for
    * `df.localCheckpoint(true)` in iterative loops.
    */
  def checkpointSevered(df: DataFrame, reliable: Boolean = false): DataFrame = {
    val cp =
      if (reliable) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    cp.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val session = cp.sparkSession.asInstanceOf[ClassicSession]
        val (part, ord) = recoverLayout(df, l)
        Dataset.ofRows(session,
          LogicalRDD(l.output, l.rdd, part, ord, l.isStreaming, l.stream)(
            session, None, None))
      case _ => // not checkpoint-shaped (never expected): round-14 path
        cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
    }
  }

  /** Eagerly local-checkpoint `df` and attach the checkpoint's ACTUAL
    * stored byte size as its statistics (round 17). Stock checkpoint
    * copies the origin plan's sizeInBytes ESTIMATE, which for the
    * join-heavy one-shot memo pins is off by three orders of magnitude
    * (the near-dup edge memo: ~2 MB stored, 5.9 GB estimated) — and
    * that poisons every size-derived decision downstream, from
    * auto-broadcasts to the family's scale-adaptive partition counts.
    * The materialized blocks are already registered with the block
    * manager, so the true size is one driver-side storage-status read.
    * Layout is recovered like [[checkpointSevered]]. Degradation
    * contract: a non-`LogicalRDD` plan or an empty storage report keeps
    * stock behavior (inherited estimate), never a wrong answer — the
    * stats only steer layout and join strategy.
    */
  def checkpointActualStats(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(eager = true)
    cp.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val session = cp.sparkSession.asInstanceOf[ClassicSession]
        val (part, ord) = recoverLayout(df, l)
        val actual = session.sparkContext.getRDDStorageInfo
          .filter(_.id == l.rdd.id)
          .map(i => BigInt(i.memSize) + BigInt(i.diskSize)).sum
        val stats =
          if (actual > 0)
            Some(org.apache.spark.sql.catalyst.plans.logical.Statistics(
              sizeInBytes = actual))
          else None // no storage entry: keep stock's inherited estimate
        if (stats.isEmpty) cp // keep stock's inherited estimate
        else Dataset.ofRows(session,
          LogicalRDD(l.output, l.rdd, part, ord, l.isStreaming, l.stream)(
            session, stats, None))
      case _ => cp
    }
  }

  /** Rebuild an already-checkpointed `df` with inherited plan
    * statistics severed, keeping whatever layout its `LogicalRDD`
    * carries. Zero-copy for checkpoint-shaped plans; anything else
    * falls back to the round-14 Row round-trip.
    */
  def severStats(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val session = df.sparkSession.asInstanceOf[ClassicSession]
        Dataset.ofRows(session,
          LogicalRDD(l.output, l.rdd, l.outputPartitioning,
            l.outputOrdering, l.isStreaming, l.stream)(
            session, None, None))
      case _ =>
        df.sparkSession.createDataFrame(df.rdd, df.schema)
    }

  /** The layout stock checkpoint SHOULD have stored: if it recorded
    * `UnknownPartitioning` and the origin ran under AQE, read the
    * final physical plan (already executed — the checkpoint was
    * eager) and remap its partitioning/ordering expressions from
    * physical output attributes to the checkpoint's logical output,
    * positionally (same arity and names, or we keep stock's answer).
    */
  private[graftshim] def recoverLayout(
      origin: DataFrame, l: LogicalRDD): (Partitioning, Seq[SortOrder]) = {
    val stock = (l.outputPartitioning, l.outputOrdering)
    if (!l.outputPartitioning.isInstanceOf[UnknownPartitioning]) return stock
    origin.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec =>
        try {
          val fp = a.finalPhysicalPlan
          val aligned = fp.output.length == l.output.length &&
            fp.output.zip(l.output).forall { case (p, o) => p.name == o.name }
          if (!aligned) return stock
          val m = AttributeMap(fp.output.zip(l.output))
          var ok = true
          def remap(e: Expression): Expression = e.transformUp {
            case att: Attribute => m.get(att).getOrElse { ok = false; att }
          }
          val part = fp.outputPartitioning match {
            case e: Expression => remap(e).asInstanceOf[Partitioning]
            case p => p // attribute-free (RoundRobin / Single / Unknown)
          }
          val ord = fp.outputOrdering
            .map(o => remap(o).asInstanceOf[SortOrder])
          if (ok) (part, ord) else stock
        } catch { case scala.util.control.NonFatal(_) => stock }
      case _ => stock
    }
  }
}

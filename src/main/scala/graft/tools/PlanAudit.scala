package graft.tools

import graft.{Catalog, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Registry-wide physical-plan audit: build every gated query's
  * executed plan at sf0.001 and report which contain a
  * CartesianProduct or BroadcastNestedLoopJoin — the two operators
  * that turn into all-pairs work at cluster scale. The spec twin
  * (PlanQualitySpec's registry-wide guard) asserts the violator set
  * is exactly the commented allowlist; this main is the discovery /
  * debugging view of the same sweep.
  *
  * Run: `sbt "runMain graft.tools.PlanAudit [sfDir]"`.
  */
object PlanAudit {

  /** (query name, plan) for every registry entry, built serially. */
  def sweep(spark: SparkSession, sfDir: String): Seq[(String, String)] =
    SparkEntry.registry.map { q =>
      val p =
        try q.run(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"BUILD-FAILED: ${e.getMessage}" }
      spark.catalog.clearCache()
      q.name -> p
    }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // deterministic JSON decimals
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(Catalog.sessionConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    // minimal JSON string escape: exception messages carry newlines
    // and backslashes (AnalysisException plan fragments) that would
    // otherwise break the line-oriented output
    def jq(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    var bad = 0
    sweep(spark, sfDir).foreach { case (name, p) =>
      val cp = p.contains("CartesianProduct")
      val bnlj = p.contains("BroadcastNestedLoopJoin")
      val fail = p.startsWith("BUILD-FAILED")
      if (cp || bnlj || fail) {
        bad += 1
        println(s"""{"query":"$name","cartesian":$cp,"bnlj":$bnlj""" +
          (if (fail) s""","error":"${jq(p.take(160))}"""" else "") + "}")
      }
    }
    println(s"""{"metric":"plan_audit","queries":${SparkEntry.registry.size},"flagged":$bad}""")
    spark.stop()
  }
}

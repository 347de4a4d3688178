package graft

/** Diagnostics main: print the executed physical plan of registry
  * queries by name against sf0.001 — the quickest way to eyeball
  * pushdown/shuffle/broadcast structure outside the test suite.
  *
  * Usage: `sbt "runMain graft.PlanDump q04_filtered_scan s07_ivf_pq_adc"`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").config(Catalog.sessionConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}

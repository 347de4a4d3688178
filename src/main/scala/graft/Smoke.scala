package graft

import org.apache.spark.sql.SparkSession

/** Driver-style smoke: a PLAIN session (deliberately not applying
  * [[Catalog.sessionConfs]], mimicking the round driver's own session)
  * must get rows from `SparkEntry.entry`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE rows=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}

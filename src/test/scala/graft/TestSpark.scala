package graft

import org.apache.spark.sql.SparkSession

/** One local session shared by every suite in the JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config(Catalog.sessionConfs)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query plus (optionally) the equivalent ANSI SQL the
  * driver runs in DuckDB over the same parquet tables. Column names and
  * value determinism must match exactly between the two (see
  * [[graft.relational.RelationalQueries]] notes on decimal-exact sums).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

/** Loaders for the driver-provided test tables (TESTDATA.md).
  *
  * Tables are one parquet file per scale-factor directory. All reads go
  * through `spark.read.parquet` so Catalyst gets predicate pushdown and
  * column pruning for free on every query built on top.
  */
object Catalog {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session settings every entry point (Verify/Bench/tests) applies.
    * `nanosAsLong`: the driver's `events.parquet` carries TIMESTAMP(NANOS)
    * which Spark's reader otherwise rejects; we read it as long and
    * normalize back to a timestamp column in [[t]].
    */
  val sessionConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // nanos → micros; keeps `ts` a TimestampType column for query code
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from per-module registries; each [[QueryDef]]
  * pairs the Spark implementation with its DuckDB oracle SQL (identical
  * column names — the driver's compare sorts columns by name).
  */
object SparkEntry {

  def registry: Seq[QueryDef] =
    relational.RelationalQueries.all ++
      relational.RelationalQueries2.all ++
      relational.RelationalQueries3.all ++
      relational.RelationalQueries4.all ++
      relational.RelationalQueries5.all ++
      llm.TextAnalysis.all ++
      llm.Dedup.all ++
      llm.Pipeline.all ++
      llm.Similarity.all ++
      llm.Clustering.all ++
      llm.Multimodal.all ++
      streaming.StreamingQueries.all ++
      state.StateQueries.all ++
      sources.IngestQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q18_star_join_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

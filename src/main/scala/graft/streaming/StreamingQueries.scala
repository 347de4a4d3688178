package graft.streaming

import graft.{Catalog, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicInteger

/** Structured Streaming surface: the `events` parquet drives a real
  * `readStream` → windowed aggregation → memory-sink query, executed
  * synchronously (`processAllAvailable`) so it is checkable against the
  * batch DuckDB oracle. Complete output mode: the sink holds the full
  * windowed result, equivalent to the batch `GROUP BY time_bucket`.
  */
object StreamingQueries {

  private val counter = new AtomicInteger(0)

  def all: Seq[QueryDef] = Seq(
    QueryDef(
      "st01_stream_hourly",
      Some("""SELECT time_bucket(INTERVAL '1 hour', cast(ts as timestamp)) AS window_start,
             |  event_type, count(*) AS n
             |FROM events GROUP BY 1, 2""".stripMargin),
      (s, d) => {
        val path = s"$d/events.parquet"
        val rawSchema = s.read.parquet(path).schema // ts read as long (nanos)
        val name = s"st01_mem_${counter.incrementAndGet()}"
        // readStream requires a directory: stream the sf dir, globbed to
        // the events table only
        val stream = s.readStream.schema(rawSchema)
          .option("pathGlobFilter", "events.parquet").parquet(d)
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("window_start"), col("event_type"), col("n"))
        val q = stream.writeStream
          .outputMode("complete").format("memory").queryName(name).start()
        try q.processAllAvailable() finally q.stop()
        // materialize: the memory table lives in the session after stop
        s.table(name)
      })
  )
}

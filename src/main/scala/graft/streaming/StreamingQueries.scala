package graft.streaming

import graft.{Catalog, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable.ListBuffer

/** Event row for the sessionizer (ns timestamp already floored to ms). */
final case class SessEvent(user_id: Long, event_id: Long, ts_ms: Long)

/** One user session: consecutive events with < 30 min gaps. */
final case class UserSession(
    user_id: Long, session_id: Int, n_events: Long, start_ms: Long, end_ms: Long)

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
      }),

    // Stateful streaming: custom per-key session logic through
    // flatMapGroupsWithState (SURVEY.md §2.11 → Structured Streaming
    // stateful ops). The DuckDB oracle is the batch gap-and-islands
    // formulation of the same 30-minute-gap sessionization.
    QueryDef(
      "st02_sessionize",
      Some(s"""WITH e AS (SELECT user_id, event_id,
              |    epoch_ms(cast(ts as timestamp)) AS ts_ms FROM events),
              |x AS (SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL
              |      OR ts_ms - lag(ts_ms) OVER w > $GapMs THEN 1 ELSE 0 END AS new_s
              |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
              |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
              |    ORDER BY ts_ms, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM x)
              |SELECT user_id, cast(session_id as int) AS session_id,
              |  count(*) AS n_events, min(ts_ms) AS start_ms, max(ts_ms) AS end_ms
              |FROM s GROUP BY user_id, session_id""".stripMargin),
      (s, d) => {
        import s.implicits._
        val rawSchema = s.read.parquet(s"$d/events.parquet").schema
        val name = s"st02_mem_${counter.incrementAndGet()}"
        val ev = s.readStream.schema(rawSchema)
          .option("pathGlobFilter", "events.parquet").parquet(d)
          .select(col("user_id"), col("event_id"),
            expr("ts div 1000000").as("ts_ms")) // ns -> ms floor, = epoch_ms
          .as[SessEvent]
        val sessions = ev.groupByKey(_.user_id)
          .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
            StreamingQueries.sessionize)
        val q = sessions.writeStream
          .outputMode("append").format("memory").queryName(name).start()
        try q.processAllAvailable() finally q.stop()
        s.table(name)
      }),

    watermarkQuery
  )

  /** st03: watermarked append-mode windows — only windows closed by the
    * event-time watermark (max event time - 1h) are emitted; the oracle
    * replicates the eviction predicate `window.end <= watermark` in
    * batch SQL. Demonstrates late-data semantics (SURVEY §2.11).
    */
  private[streaming] val watermarkQuery: QueryDef = QueryDef(
    "st03_watermarked_windows",
    Some("""WITH e AS (SELECT time_bucket(INTERVAL '1 hour', cast(ts as timestamp))
           |    AS window_start, event_type FROM events),
           |wm AS (SELECT epoch_ms(max(cast(ts as timestamp))) - 3600000 AS wmms
           |  FROM events)
           |SELECT window_start, event_type, count(*) AS n FROM e, wm
           |WHERE epoch_ms(window_start) + 3600000 <= wmms
           |GROUP BY window_start, event_type""".stripMargin),
    (s, d) => {
      val rawSchema = s.read.parquet(s"$d/events.parquet").schema
      val name = s"st03_mem_${counter.incrementAndGet()}"
      val stream = s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"), col("event_type"), col("n"))
      val q = stream.writeStream
        .outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      s.table(name)
    })

  /** Per-user sessionizer: sort the micro-batch's events, split on >30min
    * gaps. State is unused in this single-batch demo but the signature is
    * the real streaming one (carrying open sessions across batches is the
    * GroupState's job in a continuous deployment).
    */
  private val GapMs = 1800000L

  private def sessionize(
      userId: Long,
      events: Iterator[SessEvent],
      state: GroupState[Int]): Iterator[UserSession] = {
    val sorted = events.toIndexedSeq.sortBy(e => (e.ts_ms, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    val out = ListBuffer.empty[UserSession]
    var sid = 1
    var start = sorted.head.ts_ms
    var last = start
    var n = 0L
    sorted.foreach { e =>
      if (e.ts_ms - last > GapMs) {
        out += UserSession(userId, sid, n, start, last)
        sid += 1; start = e.ts_ms; n = 0L
      }
      n += 1; last = e.ts_ms
    }
    out += UserSession(userId, sid, n, start, last)
    out.iterator
  }
}

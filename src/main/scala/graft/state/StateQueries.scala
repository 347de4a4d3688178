package graft.state

import graft.{Catalog, QueryDef}
import graft.core.codec.Codecs.LongCodec

import org.apache.spark.sql.functions._

/** Driver-gate queries exercising the savepoint engine end-to-end with a
  * relational oracle: state content is DERIVED from the driver's parquet
  * tables, pushed through a full savepoint write → DSv2 scan → typed
  * read cycle, and the final DataFrame must hash-match the plain SQL the
  * state pipeline implements. This makes the byte formats, key-group
  * sharding and codecs part of the DuckDB-verified surface.
  */
object StateQueries {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  def all: Seq[QueryDef] = Seq(

    // Savepoint bootstrap + scan roundtrip (S1-S10, P1, W1, W3, W7).
    QueryDef(
      "sp01_state_roundtrip",
      Some("SELECT o_custkey AS key, count(*) AS cnt FROM orders GROUP BY o_custkey"),
      (s, d) => {
        import s.implicits._
        val counts = Catalog.t(s, d, "orders")
          .groupBy(col("o_custkey")).count()
          .as[(Long, Long)]
        val meta = Savepoints
          .writer(s, Savepoints.bootstrap("counts", parallelism = 4, maxParallelism = 128), "counts")
          .withKeyCodec(LongCodec)
          .createNewValueState("Count", counts, LongCodec)
          .writeAll(tmp("graft-sp01"))
        Savepoints.reader(s, meta, "counts")
          .readValueStates[Long, Long]("Count")
          .toDF("key", "cnt")
      }),

    // The reference's canonical pattern (README.md:143-148): state ⋈
    // external bootstrap data → summed → written back → re-read.
    QueryDef(
      "sp02_state_transform",
      Some("""SELECT o_custkey AS key,
             |  cast(count(*) + sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
             |       as bigint) AS cnt
             |FROM orders GROUP BY o_custkey""".stripMargin),
      (s, d) => {
        import s.implicits._
        val orders = Catalog.t(s, d, "orders")
        val counts = orders.groupBy(col("o_custkey")).count().as[(Long, Long)]
        val meta1 = Savepoints
          .writer(s, Savepoints.bootstrap("counts", 4, 128), "counts")
          .withKeyCodec(LongCodec)
          .createNewValueState("Count", counts, LongCodec)
          .writeAll(tmp("graft-sp02a"))

        val state = Savepoints.reader(s, meta1, "counts")
          .readValueStates[Long, Long]("Count")
          .toDF("key", "n")
        val delta = orders.filter(col("o_totalprice") > 150000)
          .groupBy(col("o_custkey").as("key")).agg(count(lit(1)).as("extra"))
        val merged = state.join(delta, Seq("key"), "left")
          .select(col("key"), (col("n") + coalesce(col("extra"), lit(0L))).as("v"))
          .as[(Long, Long)]

        val meta2 = Savepoints.writer(s, meta1, "counts")
          .addValueState("Count", merged)
          .writeAll(tmp("graft-sp02b"))
        Savepoints.reader(s, meta2, "counts")
          .readValueStates[Long, Long]("Count")
          .toDF("key", "cnt")
      })
  )
}

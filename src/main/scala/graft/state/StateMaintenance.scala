package graft.state

import graft.core.meta.SavepointMeta

import org.apache.spark.sql.{Encoders, SparkSession}

/** Savepoint maintenance jobs: the state-GC / compaction side of the
  * reference's "fix corrupted state" use case (README.md:41-44) — bulk
  * rewrites of a savepoint that drop rows a restoring job should no
  * longer see.
  */
object StateMaintenance {

  /** State GC: rewrite operator `uid`'s TTL value state `stateName`
    * WITHOUT the entries whose TTL timestamp (the 8-byte big-endian
    * prefix Flink's TtlValue wrapper puts before the payload, reference
    * KeyedStateReader.java:279-283) is older than `cutoffMs`. Surviving
    * rows pass through byte-identical — key framing, key-group prefix
    * and TTL wrapper untouched — so the rewrite is safe for any payload
    * type without re-encoding.
    *
    * Scale: one pushed-down scan of the single state (never the whole
    * savepoint), a narrow filter on the first 8 value bytes, and the
    * standard one-shuffle write job. No driver materialization.
    */
  def expireTtl(spark: SparkSession, sp: SavepointMeta, uid: String,
      stateName: String, cutoffMs: Long, outDir: String): SavepointMeta = {
    implicit val enc: org.apache.spark.sql.Encoder[KeyedStateRow] =
      Encoders.product[KeyedStateRow]
    val surviving = Savepoints.reader(spark, sp, uid)
      .getKeyedStateRows(Set(stateName)).as[KeyedStateRow]
      .filter { r =>
        r.valueBytes.length >= 8 &&
          java.nio.ByteBuffer.wrap(r.valueBytes).getLong >= cutoffMs
      }
    Savepoints.writer(spark, sp, uid)
      .addKeyedStateRows(surviving)
      .writeAll(outDir)
  }
}

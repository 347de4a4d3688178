package graft.state

import graft.core.codec.Codec
import graft.core.meta.SavepointMeta

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** Point-in-time state comparison across two snapshots — the analytics
  * behind the reference's "validating / repairing corrupted state"
  * use-case (README.md:41-44): what changed between checkpoint N and
  * N+k, per key.
  *
  * One full-outer join keyed by state key; both sides stream out of
  * the savepoint scan with state-name pushdown, so at scale the diff
  * shuffles exactly the two states being compared, nothing else.
  */
object StateDiff {

  /** Per-key diff of one value state across two savepoints. Returns
    * `(key, old_value, new_value, status)` with status in
    * added | removed | changed | same.
    */
  def valueStates[K, V](
      spark: SparkSession,
      before: SavepointMeta,
      after: SavepointMeta,
      uid: String,
      stateName: String,
      keyCodec: Codec[K] = null,
      valueCodec: Codec[V] = null)(
      implicit e: Encoder[(K, V)]): DataFrame = {
    val a = Savepoints.reader(spark, before, uid)
      .readValueStates[K, V](stateName, keyCodec, valueCodec)
      .toDF("key", "old_value")
    val b = Savepoints.reader(spark, after, uid)
      .readValueStates[K, V](stateName, keyCodec, valueCodec)
      .toDF("key", "new_value")
    a.join(b, Seq("key"), "full_outer")
      .withColumn("status",
        when(col("old_value").isNull, lit("added"))
          .when(col("new_value").isNull, lit("removed"))
          .when(col("old_value") === col("new_value"), lit("same"))
          .otherwise(lit("changed")))
  }
}

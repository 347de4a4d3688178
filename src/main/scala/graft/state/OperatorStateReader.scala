package graft.state

import graft.core.codec._
import graft.core.meta.{OperatorStateMeta, SavepointMeta, StateKind}

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions.col

import scala.collection.mutable

/** Typed state reads over a savepoint operator (SURVEY.md §2.2/§2.3:
  * P1-P8, F1-F3, S7). The raw scan is the `flink-savepoint` DSv2 source;
  * every typed reader is a flatMap projection over it, exactly where the
  * reference runs its `KeyedStateReader` RichFlatMapFunctions
  * (reader/KeyedStateReader.java:40-41).
  *
  * Codec overrides (`keyCodec`/`valueCodec` params) are the
  * schema-on-read hooks of the reference (withKeyDeserializer /
  * withValueDeserializer, KeyedStateReader.java:109-158).
  */
final class OperatorStateReader(
    spark: SparkSession,
    val savepoint: SavepointMeta,
    uid: String,
    stateFilter: Option[Set[String]] = None) {

  val operator: OperatorStateMeta = savepoint.operator(uid)
  private val readStates = mutable.Set.empty[String]

  /** Memoized raw row scan (reference S7, OperatorStateReader.java:
    * 154-158). Catalyst pushes `stateName` predicates into the source.
    */
  lazy val allKeyedStateRows: DataFrame = {
    val r = spark.read.format("flink-savepoint")
      .option("uid", operator.uid)
    stateFilter.fold(r)(f => r.option("states", f.mkString(",")))
      .load(savepoint.basePath)
  }

  /** F2: row filter on state names. */
  def getKeyedStateRows(names: Set[String]): DataFrame =
    allKeyedStateRows.filter(col("stateName").isin(names.toSeq: _*))

  /** F3: anti-selection of states already consumed by typed readers —
    * the copy-through input for the write path
    * (OperatorStateReader.java:130-140).
    */
  def getAllUnreadKeyedStateRows: DataFrame = {
    val consumed = readStates.toSeq
    if (consumed.isEmpty) allKeyedStateRows
    else allKeyedStateRows.filter(!col("stateName").isin(consumed: _*))
  }

  // ------------------------------------------------------------- P1 / P2

  /** P1: value state as (key, value) pairs. */
  def readValueStates[K, V](name: String,
      keyCodec: Codec[K] = null, valueCodec: Codec[V] = null)(
      implicit e: Encoder[(K, V)]): Dataset[(K, V)] = {
    val kc = resolveKey(keyCodec)
    val vc = resolveValue[V](name, valueCodec)
    val prefix = KeyGroups.prefixBytes(operator.maxParallelism)
    markRead(name)
    rowsFor(name).map { row =>
      val kr = new ByteReader(row.keyAndNamespaceBytes)
      kr.skip(prefix.toLong)
      val key = kc.read(kr)
      val value = vc.fromBytes(row.valueBytes)
      (key, value)
    }
  }

  /** P2: value state values only — the projection prunes to the
    * `valueBytes` column, so the source's column-pruning pushdown skips
    * key bytes during decode entirely (ValueStateValueReader.java:41-48
    * never decodes keys; we never even materialize them).
    */
  def readValueStateValues[V](name: String, valueCodec: Codec[V] = null)(
      implicit e: Encoder[V]): Dataset[V] = {
    val vc = resolveValue[V](name, valueCodec)
    markRead(name)
    valueBytesFor(name).map(vc.fromBytes)
  }

  // ------------------------------------------------------------- P3 / P4

  /** P3: list state as (key, elements). */
  def readListStates[K, V](name: String,
      keyCodec: Codec[K] = null, elemCodec: Codec[V] = null)(
      implicit e: Encoder[(K, List[V])]): Dataset[(K, List[V])] = {
    val kc = resolveKey(keyCodec)
    val lc = resolveListElem[V](name, elemCodec)
    val prefix = KeyGroups.prefixBytes(operator.maxParallelism)
    markRead(name)
    rowsFor(name).map { row =>
      val kr = new ByteReader(row.keyAndNamespaceBytes)
      kr.skip(prefix.toLong)
      (kc.read(kr), lc.fromBytes(row.valueBytes))
    }
  }

  /** P4: list state flattened to one row per element (explode shape). */
  def readListStateValues[K, V](name: String,
      keyCodec: Codec[K] = null, elemCodec: Codec[V] = null)(
      implicit e: Encoder[(K, V)]): Dataset[(K, V)] = {
    val kc = resolveKey(keyCodec)
    val lc = resolveListElem[V](name, elemCodec)
    val prefix = KeyGroups.prefixBytes(operator.maxParallelism)
    markRead(name)
    rowsFor(name).flatMap { row =>
      val kr = new ByteReader(row.keyAndNamespaceBytes)
      kr.skip(prefix.toLong)
      val key = kc.read(kr)
      lc.fromBytes(row.valueBytes).map(v => (key, v))
    }
  }

  // ------------------------------------------------------------- P5 / P6

  /** P5: map state entries (key, mapKey, value). Key bytes are
    * [prefix][key][namespace][mapKey]; value bytes carry a null-marker
    * boolean (MapStateKKVReader.java:50-82).
    */
  def readMapStates[K, MK, V](name: String,
      keyCodec: Codec[K] = null, mapKeyCodec: Codec[MK] = null,
      valueCodec: Codec[V] = null)(
      implicit e: Encoder[(K, MK, V)]): Dataset[(K, MK, V)] = {
    val kc = resolveKey(keyCodec)
    val mkc = Option(mapKeyCodec).getOrElse(
      CodecRegistry.resolve(operator.stateMeta(name).mapKeyCodecId.getOrElse(
        throw new IllegalArgumentException(s"state '$name' has no map-key codec")))
        .asInstanceOf[Codec[MK]])
    val vc = resolveValue[V](name, valueCodec)
    val prefix = KeyGroups.prefixBytes(operator.maxParallelism)
    markRead(name)
    val nsc = CodecRegistry.resolve(operator.stateMeta(name).namespaceCodecId)
    rowsFor(name).flatMap { row =>
      val kr = new ByteReader(row.keyAndNamespaceBytes)
      kr.skip(prefix.toLong)
      val key = kc.read(kr)
      nsc.read(kr) // declared namespace codec (void unless overridden)
      val mapKey = mkc.read(kr)
      val vr = new ByteReader(row.valueBytes)
      val isNull = vr.readBoolean()
      if (isNull) Nil else List((key, mapKey, vc.read(vr)))
    }
  }

  /** P6: map state values only (null-marker aware; key bytes pruned at
    * the source like P2).
    */
  def readMapStateValues[V](name: String, valueCodec: Codec[V] = null)(
      implicit e: Encoder[V]): Dataset[V] = {
    val vc = resolveValue[V](name, valueCodec)
    markRead(name)
    valueBytesFor(name).flatMap { bytes =>
      val vr = new ByteReader(bytes)
      if (vr.readBoolean()) Nil else List(vc.read(vr))
    }
  }

  // ------------------------------------------------------------------ P7

  /** P7: window-operator accumulated state, hard-coded state name
    * (KeyedStateReader.java:46-48).
    */
  def readWindowStateValues[V](valueCodec: Codec[V] = null)(
      implicit e: Encoder[V]): Dataset[V] =
    readValueStateValues(OperatorStateReader.WindowContents, valueCodec)

  def readWindowStates[K, V](keyCodec: Codec[K] = null, valueCodec: Codec[V] = null)(
      implicit e: Encoder[(K, V)]): Dataset[(K, V)] =
    readValueStates(OperatorStateReader.WindowContents, keyCodec, valueCodec)

  /** P7 with the window bounds: (key, windowStart, windowEnd, value).
    * The TimeWindow namespace (16 fixed bytes after the key) is decoded
    * with the state's declared namespace codec.
    */
  def readWindowStatesWithBounds[K, V](
      keyCodec: Codec[K] = null, valueCodec: Codec[V] = null)(
      implicit e: Encoder[(K, Long, Long, V)]): Dataset[(K, Long, Long, V)] = {
    val name = OperatorStateReader.WindowContents
    val kc = resolveKey(keyCodec)
    val vc = resolveValue[V](name, valueCodec)
    require(operator.stateMeta(name).namespaceCodecId == Codecs.FlinkTimeWindowCodec.id,
      s"state '$name' does not declare a TimeWindow namespace " +
        s"(has '${operator.stateMeta(name).namespaceCodecId}')")
    val prefix = KeyGroups.prefixBytes(operator.maxParallelism)
    markRead(name)
    rowsFor(name).map { row =>
      val kr = new ByteReader(row.keyAndNamespaceBytes)
      kr.skip(prefix.toLong)
      val key = kc.read(kr)
      val (start, end) = Codecs.FlinkTimeWindowCodec.read(kr)
      (key, start, end, vc.fromBytes(row.valueBytes))
    }
  }

  // ----------------------------------------------------------- raw timers

  /** Heap-timer decode over the RAW keyed stream (beyond the reference,
    * which only preserves the handle bytes): every event/processing-time
    * timer of every subtask as typed rows. Handle sections parse
    * driver-side (tiny); group decode distributes one task per subtask —
    * inline delegates ship with their task, file delegates open + seek
    * executor-side. Timer volume per subtask is bounded by live keys x
    * open windows of that subtask, the same bound the original job's
    * heap held.
    */
  def readTimers(): Dataset[graft.core.flink.FlinkTimerIO.TimerRow] = {
    val base = savepoint.basePath
    val sections = operator.rawKeyedState.toSeq.sortBy(_._1)
    implicit val pairEnc: Encoder[(Int, Array[Byte])] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.Encoders.BINARY)
    implicit val rowEnc: Encoder[graft.core.flink.FlinkTimerIO.TimerRow] =
      org.apache.spark.sql.Encoders.product[graft.core.flink.FlinkTimerIO.TimerRow]
    spark.createDataset(sections)
      .repartition(math.max(1, sections.size))
      .flatMap { case (sub, bytes) =>
        graft.core.flink.FlinkTimerIO.decodeSection(bytes, base, sub)
      }
  }

  /** Event-time WINDOW timers — the state a restored window job fires
    * from — as (key, windowStart, windowEnd, timestamp). `service`
    * defaults to the window operator's timer-service name.
    */
  def readEventTimeWindowTimers[K](
      service: String = OperatorStateReader.WindowTimers,
      keyCodec: Codec[K] = null)(
      implicit e: Encoder[(K, Long, Long, Long)]): Dataset[(K, Long, Long, Long)] = {
    val kcOverride = Option(keyCodec)
    val svc = service
    readTimers()
      .filter(t => t.eventTime && t.service == svc)
      .map { t =>
        require(t.namespaceCodecId == Codecs.FlinkTimeWindowCodec.id,
          s"timer service '$svc' has namespace codec " +
            s"'${t.namespaceCodecId}', not a TimeWindow")
        val kc = kcOverride.getOrElse(
          CodecRegistry.resolve(t.keyCodecId).asInstanceOf[Codec[K]])
        val (s0, e0) = Codecs.FlinkTimeWindowCodec.fromBytes(t.namespaceBytes)
        (kc.fromBytes(t.keyBytes), s0, e0, t.timestamp)
      }
  }

  // ------------------------------------------------------------- helpers

  private def valueBytesFor(name: String): Dataset[Array[Byte]] =
    allKeyedStateRows.filter(col("stateName") === name)
      .select("valueBytes")
      .as[Array[Byte]](org.apache.spark.sql.Encoders.BINARY)

  private def rowsFor(name: String): Dataset[KeyedStateRow] = {
    implicit val enc: Encoder[KeyedStateRow] =
      org.apache.spark.sql.Encoders.product[KeyedStateRow]
    allKeyedStateRows.filter(col("stateName") === name).as[KeyedStateRow]
  }

  private def markRead(name: String): Unit = synchronized { readStates += name }

  private def resolveKey[K](explicit: Codec[K]): Codec[K] =
    Option(explicit).getOrElse(
      CodecRegistry.resolve(operator.keyCodecId.getOrElse(
        throw new IllegalArgumentException(
          s"operator ${operator.uid} has no key codec in metadata")))
        .asInstanceOf[Codec[K]])

  /** Value codec with TTL auto-unwrap (reference
    * StateMetadataUtils.java:196-206 + KeyedStateReader.java:279-283).
    */
  private def resolveValue[V](name: String, explicit: Codec[V]): Codec[V] =
    Option(explicit).getOrElse(
      CodecRegistry.resolve(operator.stateMeta(name).valueCodecId)
        .asInstanceOf[Codec[V]])

  private def resolveListElem[V](name: String, explicit: Codec[V]): Codec[List[V]] =
    Option(explicit).map(Codecs.ListCodec(_)).getOrElse {
      CodecRegistry.resolve(operator.stateMeta(name).valueCodecId) match {
        case l: Codecs.ListCodec[_] => l.asInstanceOf[Codec[List[V]]]
        case other => throw new IllegalArgumentException(
          s"state '$name' is not a list state (codec ${other.id})")
      }
    }
}

object OperatorStateReader {
  /** Flink's window-operator state name (KeyedStateReader.java:46-48). */
  val WindowContents = "window-contents"
  /** Flink's window-operator timer-service name (WindowOperator.open). */
  val WindowTimers = "window-timers"
}

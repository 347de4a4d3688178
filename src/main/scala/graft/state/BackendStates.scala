package graft.state

import graft.core.codec.Codec
import graft.core.meta.{ListStateMode, OperatorBackendState}

/** Typed access to non-keyed operator state (SURVEY.md §2.1 S8/S11).
  * The model is fully in-memory and driver-side, matching the
  * reference's explicit stance ("completely restored in-memory",
  * OperatorStateReader.java:161-163; README.md:115). Raw entries stay
  * codec-encoded bytes in [[OperatorBackendState]]; these helpers
  * project them to/from typed Scala values.
  */
object BackendStates {

  def listState[T](b: OperatorBackendState, name: String)(
      implicit c: Codec[T]): Seq[T] =
    b.listStates.get(name).map(_._2.map(c.fromBytes)).getOrElse(Seq.empty)

  def withListState[T](b: OperatorBackendState, name: String, values: Seq[T],
      mode: Byte = ListStateMode.SplitDistribute)(
      implicit c: Codec[T]): OperatorBackendState =
    b.copy(listStates = b.listStates.updated(name, (mode, values.map(c.toBytes))),
      listCodecs = b.listCodecs.updated(name, c.id))

  /** Union-list states are re-distributed to every subtask on restore. */
  def unionListState[T](b: OperatorBackendState, name: String)(
      implicit c: Codec[T]): Seq[T] = listState(b, name)

  def broadcastState[K, V](b: OperatorBackendState, name: String)(
      implicit kc: Codec[K], vc: Codec[V]): Map[K, V] =
    b.broadcastStates.get(name)
      .map(_.map { case (k, v) => kc.fromBytes(k) -> vc.fromBytes(v) }.toMap)
      .getOrElse(Map.empty)

  def withBroadcastState[K, V](b: OperatorBackendState, name: String,
      entries: Map[K, V])(
      implicit kc: Codec[K], vc: Codec[V]): OperatorBackendState =
    b.copy(broadcastStates = b.broadcastStates.updated(name,
      entries.toSeq.map { case (k, v) => (kc.toBytes(k), vc.toBytes(v)) }),
      broadcastCodecs = b.broadcastCodecs.updated(name, (kc.id, vc.id)))

  /** Reference `getSerializableListState` parity
    * (OperatorStateReader.java:172-185): the DefaultOperatorStateBackend
    * default `_default_` list state, with each element a standalone
    * Java-serialization stream (Flink JavaSerializer layout).
    */
  def serializableListState(b: OperatorBackendState): Seq[AnyRef] =
    b.listStates.get(graft.core.flink.FlinkOperatorStateIO.DefaultStateName)
      .map(_._2.map(graft.core.codec.Codecs.FlinkJavaCodec.fromBytes))
      .getOrElse(Seq.empty)

  def withSerializableListState(b: OperatorBackendState,
      values: Seq[AnyRef]): OperatorBackendState = {
    val name = graft.core.flink.FlinkOperatorStateIO.DefaultStateName
    b.copy(
      listStates = b.listStates.updated(name, (ListStateMode.SplitDistribute,
        values.map(graft.core.codec.Codecs.FlinkJavaCodec.toBytes))),
      listCodecs = b.listCodecs.updated(name,
        graft.core.flink.FlinkOperatorStateIO.JavaCodecId))
  }
}

package graft.core.flink

import graft.core.meta.{ListStateMode, OperatorBackendState}

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Non-keyed (operator) state in the Flink layout: the
  * `DefaultOperatorStateBackend` snapshot the reference restores via
  * Flink's own backend (OperatorStateReader.java:163-211
  * `createOperatorStateBackendFromSnapshot` / `getSerializableListState`).
  *
  * Reconstructed layout (Flink 1.7 DefaultOperatorStateBackend
  * snapshot + OperatorBackendSerializationProxy):
  *
  * {{{
  * i32  proxy version = 3
  * u16  numOperatorStates; per state:     // same meta-info grammar as
  *   UTF name | i32 type ordinal (OPERATOR=1)           // the keyed proxy
  *   i32 numOptions { "OPERATOR_STATE_DISTRIBUTION_MODE":
  *                    "SPLIT_DISTRIBUTE"|"UNION" }
  *   i32 numSerializers { "VALUE_SERIALIZER": <snapshot envelope> }
  * u16  numBroadcastStates; per state:
  *   UTF name | i32 type ordinal (BROADCAST=2)
  *   i32 numOptions { mode: "BROADCAST" }
  *   i32 numSerializers { "KEY_SERIALIZER", "VALUE_SERIALIZER" }
  * then state data:
  *   list states: elements back-to-back, ONE recorded offset per
  *     element (how Flink redistributes round-robin state);
  *   broadcast states: ONE offset -> [i32 numEntries][key value ...].
  * }}}
  *
  * The per-state (mode, offsets) map lives in the PARTITIONABLE
  * operator handle in `_metadata` ([[FlinkMetadataIO]]); the bytes here
  * are the handle's delegate stream. Codec ids default to `flink-java`
  * (Flink's JavaSerializer — the `getSerializableListState` default).
  */
object FlinkOperatorStateIO {

  val ProxyVersion = 3
  val OperatorStateOrdinal = 1
  val BroadcastStateOrdinal = 2
  val ModeKey = "OPERATOR_STATE_DISTRIBUTION_MODE"
  val KeySerializerKey = "KEY_SERIALIZER"
  val ValueSerializerKey = FlinkProxyIO.ValueSerializerKey

  /** Flink's default (java-serialized) operator list state name. */
  val DefaultStateName = "_default_"
  val JavaCodecId = "flink-java"

  final case class StateOffsets(name: String, mode: Byte, offsets: Seq[Long])

  private def modeName(mode: Byte): String = mode match {
    case ListStateMode.SplitDistribute => "SPLIT_DISTRIBUTE"
    case ListStateMode.Union           => "UNION"
    case other => throw new IllegalArgumentException(s"unknown list mode $other")
  }

  private def modeOf(name: String): Byte = name match {
    case "SPLIT_DISTRIBUTE" => ListStateMode.SplitDistribute
    case "UNION"            => ListStateMode.Union
    case other => throw new IllegalArgumentException(s"unknown distribution mode $other")
  }

  /** Serialize one subtask's backend -> (delegate bytes, per-state
    * offsets for the PARTITIONABLE handle). Deterministic: states in
    * name order.
    */
  def write(b: OperatorBackendState): (Array[Byte], Seq[StateOffsets]) = {
    val bos = new ByteArrayOutputStream()
    val d = new DataOutputStream(bos)
    val lists = b.listStates.toSeq.sortBy(_._1)
    val broadcasts = b.broadcastStates.toSeq.sortBy(_._1)
    // proxy
    d.writeInt(ProxyVersion)
    d.writeShort(lists.size)
    lists.foreach { case (name, (mode, _)) =>
      d.writeUTF(name)
      d.writeInt(OperatorStateOrdinal)
      d.writeInt(1)
      d.writeUTF(ModeKey); d.writeUTF(modeName(mode))
      d.writeInt(1)
      d.writeUTF(ValueSerializerKey)
      FlinkSnapshots.write(d, b.listCodecs.getOrElse(name, JavaCodecId))
    }
    d.writeShort(broadcasts.size)
    broadcasts.foreach { case (name, _) =>
      val (kc, vc) = b.broadcastCodecs.getOrElse(name, (JavaCodecId, JavaCodecId))
      d.writeUTF(name)
      d.writeInt(BroadcastStateOrdinal)
      d.writeInt(1)
      d.writeUTF(ModeKey); d.writeUTF("BROADCAST")
      d.writeInt(2)
      d.writeUTF(KeySerializerKey); FlinkSnapshots.write(d, kc)
      d.writeUTF(ValueSerializerKey); FlinkSnapshots.write(d, vc)
    }
    d.flush()
    // data: one offset per list element; one offset per broadcast state
    val offsets = Seq.newBuilder[StateOffsets]
    lists.foreach { case (name, (mode, entries)) =>
      val offs = entries.map { e =>
        // boundaries are recovered by offset-slicing on read: a
        // zero-length element would alias the next element's offset
        // and read back as its bytes. No real serializer produces
        // zero-byte elements (java streams are >= 7 bytes, framed
        // codecs >= 1), so reject rather than corrupt.
        require(e.nonEmpty,
          s"list state '$name': zero-length element not representable " +
            "in the offset-sliced Flink layout")
        val off = bos.size().toLong
        bos.write(e)
        off
      }
      offsets += StateOffsets(name, mode, offs)
    }
    broadcasts.foreach { case (name, entries) =>
      val off = bos.size().toLong
      d.writeInt(entries.size)
      entries.foreach { case (k, v) => d.write(k); d.write(v) }
      d.flush()
      offsets += StateOffsets(name, 2: Byte, Seq(off))
    }
    (bos.toByteArray, offsets.result())
  }

  /** Restore one subtask's backend from the delegate bytes + the
    * handle's offsets. List elements are offset-sliced (no
    * deserialization — raw bytes keep any serializer readable,
    * including Java serialization). Broadcast entries are split with
    * their declared codecs via consumed-byte measurement; broadcast
    * states declared as java-serialized cannot be split (each entry is
    * an opaque object stream with no recorded boundary) and raise a
    * clear error.
    */
  def read(bytes: Array[Byte], handleOffsets: Seq[StateOffsets]): OperatorBackendState = {
    val d = new DataInputStream(new ByteArrayInputStream(bytes))
    val v = d.readInt()
    require(v == ProxyVersion,
      s"unsupported OperatorBackendSerializationProxy version $v (expected $ProxyVersion)")
    def readMetaList(expectedOrdinal: Int): Seq[(String, String, Map[String, String])] = {
      val n = d.readUnsignedShort()
      (0 until n).map { _ =>
        val name = d.readUTF()
        val ord = d.readInt()
        require(ord == expectedOrdinal,
          s"state '$name': backend state type $ord (expected $expectedOrdinal)")
        val nOpts = d.readInt()
        val opts = (0 until nOpts).map(_ => d.readUTF() -> d.readUTF()).toMap
        val nSer = d.readInt()
        val sers = (0 until nSer).map(_ => d.readUTF() -> FlinkSnapshots.read(d)).toMap
        (name, opts.getOrElse(ModeKey, "SPLIT_DISTRIBUTE"), sers)
      }
    }
    val listMeta = readMetaList(OperatorStateOrdinal)
    val broadcastMeta = readMetaList(BroadcastStateOrdinal)

    val byName = handleOffsets.map(o => o.name -> o).toMap
    // global ascending offsets bound each list element's slice
    val allOffsets = handleOffsets.flatMap(_.offsets).sorted
    def sliceEnd(off: Long): Long =
      allOffsets.find(_ > off).getOrElse(bytes.length.toLong)

    val lists = listMeta.map { case (name, modeStr, sers) =>
      val h = byName.getOrElse(name,
        throw new IllegalArgumentException(s"no offsets for list state '$name'"))
      val entries = h.offsets.map { off =>
        java.util.Arrays.copyOfRange(bytes, off.toInt, sliceEnd(off).toInt)
      }
      val codec = sers.getOrElse(ValueSerializerKey, JavaCodecId)
      (name, (modeOf(modeStr), entries), codec)
    }
    val broadcasts = broadcastMeta.map { case (name, _, sers) =>
      val h = byName.getOrElse(name,
        throw new IllegalArgumentException(s"no offsets for broadcast state '$name'"))
      require(h.offsets.size == 1, s"broadcast state '$name' with ${h.offsets.size} offsets")
      val off = h.offsets.head
      val end = sliceEnd(off)
      val kcId = sers.getOrElse(KeySerializerKey, JavaCodecId)
      val vcId = sers.getOrElse(ValueSerializerKey, JavaCodecId)
      if (kcId == JavaCodecId || vcId == JavaCodecId)
        throw new UnsupportedOperationException(
          s"broadcast state '$name' uses Java serialization: entries have " +
            "no recorded boundaries and cannot be split; use framed codecs")
      val kc = graft.core.codec.CodecRegistry.resolve(kcId)
      val vc = graft.core.codec.CodecRegistry.resolve(vcId)
      val slice = java.util.Arrays.copyOfRange(bytes, off.toInt, end.toInt)
      val sd = new graft.core.codec.ByteReader(slice)
      val n = sd.readInt()
      val entries = (0 until n).map { _ =>
        // measure consumed bytes to slice raw entry parts
        val kStart = sd.position; kc.read(sd); val kEnd = sd.position
        val vStart = sd.position; vc.read(sd); val vEnd = sd.position
        (java.util.Arrays.copyOfRange(slice, kStart.toInt, kEnd.toInt),
          java.util.Arrays.copyOfRange(slice, vStart.toInt, vEnd.toInt))
      }
      (name, entries, (kcId, vcId))
    }
    OperatorBackendState(
      listStates = lists.map { case (n, e, _) => n -> e }.toMap,
      broadcastStates = broadcasts.map { case (n, e, _) => n -> (e: Seq[(Array[Byte], Array[Byte])]) }.toMap,
      listCodecs = lists.map { case (n, _, c) => n -> c }.toMap,
      broadcastCodecs = broadcasts.map { case (n, _, c) => n -> c }.toMap)
  }
}

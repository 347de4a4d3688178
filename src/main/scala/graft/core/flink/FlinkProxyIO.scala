package graft.core.flink

import graft.core.meta.{StateKind, StateMeta}

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, InputStream}

/** Serializer-snapshot resolution: codec id <-> Flink
  * `TypeSerializerSnapshot` class name + version + body.
  *
  * The reference resolves codecs from these snapshots via Flink's own
  * classes (StateMetadataUtils.java:149-162 `getSerializer`, :164-174
  * state-id mapping, :196-206 TTL detect). Flink itself is not on this
  * classpath, so the on-wire snapshot layout is RECONSTRUCTED here from
  * the public Flink 1.7 sources the reference builds against
  * (build.gradle:8 `flink: '1.7.1'`); every constant is kept in this
  * one table so a byte-level correction lands in one place:
  *
  *  - snapshot envelope (TypeSerializerSnapshotSerializationUtil):
  *    `i32 version=2 | bool newStyle | UTF snapshotClass | i32
  *    snapshotVersion | body`. Legacy (`newStyle=false`) snapshots
  *    carry a Java-serialized serializer and are rejected with a clear
  *    error — our writer never emits them.
  *  - simple snapshots (SimpleTypeSerializerSnapshot): version 2 with
  *    the SERIALIZER class name as a UTF body — the Flink 1.7.x layout
  *    (1.7's writeSnapshot emits the class name; 1.8 moved to version 3
  *    with an empty body and reads-and-discards the UTF for v2). The
  *    writer targets 1.7.1 (the reference's pinned version,
  *    build.gradle:8); the reader accepts both v2-with-body and
  *    v3-empty, so 1.8+-written savepoints also load.
  *  - composite snapshots (List/MapSerializerSnapshot, version 1):
  *    body = `i32 nestedCount | nested envelopes`
  *    (CompositeSerializerSnapshot.writeCompositeSnapshot).
  *  - TTL values (TtlStateFactory$TtlSerializer): detected by class
  *    name prefix exactly like StateMetadataUtils.isTtlState
  *    (:196-200); decoded as a 2-nested composite (timestamp, inner).
  */
object FlinkSnapshots {

  val EnvelopeVersion = 2
  /** Flink 1.7.x SimpleTypeSerializerSnapshot: UTF serializer-class body. */
  val SimpleSnapshotVersion = 2
  /** Flink 1.8+ layout: empty body (read-side compatibility only). */
  val SimpleSnapshotVersionV3 = 3
  val CompositeSnapshotVersion = 1

  private val Base = "org.apache.flink.api.common.typeutils.base."
  val TtlPrefix = "org.apache.flink.runtime.state.ttl.TtlStateFactory$TtlSerializer"

  /** codec id -> (snapshot class, serializer class) for leaf
    * serializers. The snapshot is the serializer's nested class; the
    * serializer class name is the v2 snapshot body.
    */
  private val leafByCodec: Map[String, (String, String)] = Map(
    "long" -> (Base + "LongSerializer$LongSerializerSnapshot", Base + "LongSerializer"),
    "int" -> (Base + "IntSerializer$IntSerializerSnapshot", Base + "IntSerializer"),
    "short" -> (Base + "ShortSerializer$ShortSerializerSnapshot", Base + "ShortSerializer"),
    "byte" -> (Base + "ByteSerializer$ByteSerializerSnapshot", Base + "ByteSerializer"),
    "boolean" -> (Base + "BooleanSerializer$BooleanSerializerSnapshot", Base + "BooleanSerializer"),
    "float" -> (Base + "FloatSerializer$FloatSerializerSnapshot", Base + "FloatSerializer"),
    "double" -> (Base + "DoubleSerializer$DoubleSerializerSnapshot", Base + "DoubleSerializer"),
    "flink-string" -> (Base + "StringSerializer$StringSerializerSnapshot", Base + "StringSerializer"),
    "flink-bytes" -> (Base + "array.BytePrimitiveArraySerializer$BytePrimitiveArraySerializerSnapshot",
      Base + "array.BytePrimitiveArraySerializer"),
    "void" -> ("org.apache.flink.runtime.state.VoidNamespaceSerializer$VoidNamespaceSerializerSnapshot",
      "org.apache.flink.runtime.state.VoidNamespaceSerializer"),
    "flink-java" -> ("org.apache.flink.runtime.state.JavaSerializer$JavaSerializerSnapshot",
      "org.apache.flink.runtime.state.JavaSerializer"),
    "flink-window" -> ("org.apache.flink.streaming.api.windowing.windows.TimeWindow$Serializer$TimeWindowSerializerSnapshot",
      "org.apache.flink.streaming.api.windowing.windows.TimeWindow$Serializer"))

  private val codecByLeaf: Map[String, String] =
    leafByCodec.map { case (id, (cls, _)) => cls -> id }

  val ListSnapshotClass: String = Base + "ListSerializerSnapshot"
  val MapSnapshotClass: String = Base + "MapSerializerSnapshot"

  /** Write one snapshot envelope for `codecId`. Rejects codec ids with
    * no Flink equivalent (graft-dialect layouts like `string`/`bytes`)
    * — Flink-dialect writers must use the flink-layout codecs.
    */
  def write(d: DataOutputStream, codecId: String): Unit = {
    d.writeInt(EnvelopeVersion)
    d.writeBoolean(true) // new-style TypeSerializerSnapshot
    codecId match {
      case id if leafByCodec.contains(id) =>
        val (snapshotCls, serializerCls) = leafByCodec(id)
        d.writeUTF(snapshotCls); d.writeInt(SimpleSnapshotVersion)
        d.writeUTF(serializerCls) // 1.7.x v2 body
      case l if l.startsWith("list<") && l.endsWith(">") =>
        d.writeUTF(ListSnapshotClass); d.writeInt(CompositeSnapshotVersion)
        d.writeInt(1)
        write(d, l.substring(5, l.length - 1))
      case m if m.startsWith("map<") && m.endsWith(">") =>
        d.writeUTF(MapSnapshotClass); d.writeInt(CompositeSnapshotVersion)
        val inner = m.substring(4, m.length - 1)
        val comma = splitTopLevel(inner)
        d.writeInt(2)
        write(d, inner.substring(0, comma))
        write(d, inner.substring(comma + 1))
      case t if t.startsWith("ttl<") =>
        throw new UnsupportedOperationException(
          "Writing of TTL states is not supported") // reference parity
      case other =>
        throw new IllegalArgumentException(
          s"codec '$other' has no Flink serializer-snapshot equivalent; " +
            "use flink-layout codecs (flink-string, flink-bytes, numeric " +
            "primitives, list<...>, map<...>) for the Flink dialect")
    }
  }

  /** Read one snapshot envelope -> codec id. */
  def read(d: DataInputStream): String = {
    val v = d.readInt()
    require(v == EnvelopeVersion, s"unsupported serializer-snapshot envelope version $v")
    val newStyle = d.readBoolean()
    if (!newStyle)
      throw new UnsupportedOperationException(
        "legacy (TypeSerializerConfigSnapshot) snapshots carry " +
          "Java-serialized serializers and are not supported; re-snapshot " +
          "with Flink >= 1.7 new-style serializer snapshots")
    val cls = d.readUTF()
    val snapVersion = d.readInt()
    cls match {
      case c if codecByLeaf.contains(c) =>
        snapVersion match {
          case SimpleSnapshotVersion   => d.readUTF() // 1.7.x serializer-class body
          case SimpleSnapshotVersionV3 => // 1.8+: empty body
          case other => throw new IllegalArgumentException(
            s"unsupported simple serializer snapshot version $other for '$c'")
        }
        codecByLeaf(c)
      case ListSnapshotClass =>
        val n = d.readInt()
        require(n == 1, s"list snapshot with $n nested serializers")
        s"list<${read(d)}>"
      case MapSnapshotClass =>
        val n = d.readInt()
        require(n == 2, s"map snapshot with $n nested serializers")
        val k = read(d)
        val v2 = read(d)
        s"map<$k,$v2>"
      case c if c.startsWith(TtlPrefix) =>
        // TTL wrapper: composite of (timestamp long, inner value) —
        // detect-by-name parity with StateMetadataUtils.isTtlState
        val n = d.readInt()
        require(n == 2, s"ttl snapshot with $n nested serializers")
        read(d) // timestamp serializer (long)
        s"ttl<${read(d)}>"
      case other =>
        throw new IllegalArgumentException(
          s"unknown serializer snapshot class '$other' (version $snapVersion)")
    }
  }

  /** Index of the top-level ',' in a composite codec id body. */
  private[flink] def splitTopLevel(s: String): Int = {
    var depth = 0
    s.indices.foreach { i =>
      s(i) match {
        case '<' => depth += 1
        case '>' => depth -= 1
        case ',' if depth == 0 => return i
        case _ =>
      }
    }
    throw new IllegalArgumentException(s"malformed composite codec id: $s")
  }
}

/** `KeyedBackendSerializationProxy` (version 5, Flink 1.7) — the
  * "metaBytes" block at the head of every keyed state file
  * (RocksDBSavepointWriter.java:113 writes it verbatim; the reference
  * parses it with Flink's own proxy class at
  * StateMetadataUtils.java:176-187). Reconstructed layout:
  *
  * {{{
  * i32  version = 5
  * bool usingKeyGroupCompression
  * <key serializer snapshot envelope>
  * u16  numKeyedStates
  * per state (StateMetaInfoSnapshotReadersWriters current writer):
  *   UTF  name
  *   i32  backendStateType ordinal   (KEY_VALUE = 0)
  *   i32  numOptions; per option: UTF key, UTF value
  *        ({"KEYED_STATE_TYPE": "VALUE"|"LIST"|"MAP"})
  *   i32  numSerializers; per entry: UTF key, <snapshot envelope>
  *        (NAMESPACE_SERIALIZER, VALUE_SERIALIZER)
  * }}}
  *
  * The state-id of a state = its position in this list
  * (StateMetadataUtils.java:164-174); compression flag parity with
  * :142-146.
  */
object FlinkProxyIO {

  val Version = 5
  val KeyValueStateOrdinal = 0
  val KeyedStateTypeKey = "KEYED_STATE_TYPE"
  val NamespaceSerializerKey = "NAMESPACE_SERIALIZER"
  val ValueSerializerKey = "VALUE_SERIALIZER"

  final case class Proxy(
      compression: Boolean,
      keyCodecId: String,
      states: Seq[StateMeta])

  private def stateTypeName(kind: Byte): String = kind match {
    case StateKind.Value => "VALUE"
    case StateKind.List  => "LIST"
    case StateKind.Map   => "MAP"
    case other           => throw new IllegalArgumentException(s"unknown state kind $other")
  }

  private def kindOf(stateType: String): Byte = stateType match {
    case "VALUE"                  => StateKind.Value
    case "LIST"                   => StateKind.List
    case "MAP"                    => StateKind.Map
    case other =>
      throw new UnsupportedOperationException(s"unsupported keyed state type $other")
  }

  def toBytes(p: Proxy): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val d = new DataOutputStream(bos)
    d.writeInt(Version)
    d.writeBoolean(p.compression)
    FlinkSnapshots.write(d, p.keyCodecId)
    d.writeShort(p.states.size)
    p.states.foreach { s =>
      d.writeUTF(s.name)
      d.writeInt(KeyValueStateOrdinal)
      d.writeInt(1)
      d.writeUTF(KeyedStateTypeKey); d.writeUTF(stateTypeName(s.kind))
      d.writeInt(2)
      d.writeUTF(NamespaceSerializerKey)
      FlinkSnapshots.write(d, s.namespaceCodecId)
      d.writeUTF(ValueSerializerKey)
      s.kind match {
        case StateKind.Map =>
          FlinkSnapshots.write(d,
            s"map<${s.mapKeyCodecId.getOrElse(throw new IllegalArgumentException(
              s"map state '${s.name}' has no map-key codec"))},${s.valueCodecId}>")
        case _ => FlinkSnapshots.write(d, s.valueCodecId)
      }
    }
    d.flush()
    bos.toByteArray
  }

  /** Read the proxy from the head of a state stream, leaving `in`
    * positioned after it.
    */
  def read(in: InputStream): Proxy = {
    val d = new DataInputStream(in)
    val v = d.readInt()
    require(v == Version,
      s"unsupported KeyedBackendSerializationProxy version $v (expected $Version)")
    val compression = d.readBoolean()
    val keyCodecId = FlinkSnapshots.read(d)
    val n = d.readUnsignedShort()
    val states = (0 until n).map { _ =>
      val name = d.readUTF()
      val stateTypeOrdinal = d.readInt()
      require(stateTypeOrdinal == KeyValueStateOrdinal,
        s"state '$name' has backend state type ordinal $stateTypeOrdinal " +
          "(only KEY_VALUE appears in keyed backend snapshots)")
      val nOpts = d.readInt()
      val opts = (0 until nOpts).map(_ => d.readUTF() -> d.readUTF()).toMap
      val nSer = d.readInt()
      val sers = (0 until nSer).map(_ => d.readUTF() -> FlinkSnapshots.read(d)).toMap
      val kind = kindOf(opts.getOrElse(KeyedStateTypeKey, "VALUE"))
      val nsId = sers.getOrElse(NamespaceSerializerKey, "void")
      val valueId = sers.getOrElse(ValueSerializerKey,
        throw new IllegalArgumentException(s"state '$name' has no value serializer"))
      kind match {
        case StateKind.Map =>
          // value snapshot is map<k,v>: split into entry-value codec +
          // map-key codec (RocksDB map rows carry the user key in the
          // key bytes and a null-marked value, MapStateKKVReader.java:73)
          require(valueId.startsWith("map<") && valueId.endsWith(">"),
            s"MAP state '$name' with non-map serializer $valueId")
          val inner = valueId.substring(4, valueId.length - 1)
          val comma = FlinkSnapshots.splitTopLevel(inner)
          StateMeta(name, kind, inner.substring(comma + 1),
            Some(inner.substring(0, comma)), nsId)
        case _ => StateMeta(name, kind, valueId, None, nsId)
      }
    }
    Proxy(compression, keyCodecId, states)
  }
}

package graft.core.codec

/** Typed byte codec — the Spark-side stand-in for a restored Flink
  * `TypeSerializer` (SURVEY.md §1.3). Codecs are identified by a stable
  * string id carried in the savepoint metadata, and resolved through
  * [[CodecRegistry]] at read time ("schema-on-read": readers may override
  * the registered codec, mirroring the reference's `withKeyDeserializer`
  * at reader/KeyedStateReader.java:109-158).
  *
  * Layout notes: primitives are big-endian fixed width; String is
  * varint(utf8 length) + utf8 bytes; List elements are separated by the
  * 0x2c ',' byte (reference: utils/RocksDBUtils.java:160-192); Map
  * entries carry a null-marker boolean before each value (reference:
  * reader/MapStateKKVReader.java:73). The TTL wrapper prefixes an 8-byte
  * timestamp (reference: reader/KeyedStateReader.java:279-283).
  */
trait Codec[T] extends Serializable {
  def id: String
  def read(r: ByteReader): T
  def write(w: ByteWriter, v: T): Unit

  /** Wire-format width in bytes when fixed, None when variable-length —
    * the analogue of Flink `TypeSerializer.getLength()`; drives the
    * ambiguous-key framing decision ([[KeyFraming]]). User codecs with a
    * fixed layout should override.
    */
  def fixedWidth: Option[Int] = None

  final def toBytes(v: T): Array[Byte] = {
    val w = new ByteWriter(); write(w, v); w.toBytes
  }
  final def fromBytes(b: Array[Byte]): T = read(new ByteReader(b))
}

object Codecs {
  implicit object IntCodec extends Codec[Int] {
    val id = "int"
    override def fixedWidth: Option[Int] = Some(4)
    def read(r: ByteReader): Int = r.readInt()
    def write(w: ByteWriter, v: Int): Unit = w.writeInt(v)
  }
  implicit object LongCodec extends Codec[Long] {
    val id = "long"
    override def fixedWidth: Option[Int] = Some(8)
    def read(r: ByteReader): Long = r.readLong()
    def write(w: ByteWriter, v: Long): Unit = w.writeLong(v)
  }
  implicit object ShortCodec extends Codec[Short] {
    val id = "short"
    override def fixedWidth: Option[Int] = Some(2)
    def read(r: ByteReader): Short = r.readShort()
    def write(w: ByteWriter, v: Short): Unit = w.writeShort(v)
  }
  implicit object ByteCodec extends Codec[Byte] {
    val id = "byte"
    override def fixedWidth: Option[Int] = Some(1)
    def read(r: ByteReader): Byte = r.readByte()
    def write(w: ByteWriter, v: Byte): Unit = w.writeByte(v)
  }
  implicit object BooleanCodec extends Codec[Boolean] {
    val id = "boolean"
    override def fixedWidth: Option[Int] = Some(1)
    def read(r: ByteReader): Boolean = r.readBoolean()
    def write(w: ByteWriter, v: Boolean): Unit = w.writeBoolean(v)
  }
  implicit object FloatCodec extends Codec[Float] {
    val id = "float"
    override def fixedWidth: Option[Int] = Some(4)
    def read(r: ByteReader): Float = r.readFloat()
    def write(w: ByteWriter, v: Float): Unit = w.writeFloat(v)
  }
  implicit object DoubleCodec extends Codec[Double] {
    val id = "double"
    override def fixedWidth: Option[Int] = Some(8)
    def read(r: ByteReader): Double = r.readDouble()
    def write(w: ByteWriter, v: Double): Unit = w.writeDouble(v)
  }
  implicit object StringCodec extends Codec[String] {
    val id = "string"
    def read(r: ByteReader): String = r.readString()
    def write(w: ByteWriter, v: String): Unit = w.writeString(v)
  }
  implicit object BytesCodec extends Codec[Array[Byte]] {
    val id = "bytes"
    def read(r: ByteReader): Array[Byte] = r.readBytes()
    def write(w: ByteWriter, v: Array[Byte]): Unit = w.writeBytes(v)
  }

  /** Flink `StringSerializer` wire layout (`StringValue.writeString`,
    * stable across every public Flink release): var-length-encoded
    * `length+1` (0 = null), then each CHAR as little-endian 7-bit
    * var-width chunks — not UTF-8. Needed for bit-compatibility with
    * real Flink string state (graft's own `string` codec is
    * varint+utf8 and lives in the graft dialect only).
    */
  object FlinkStringCodec extends Codec[String] {
    val id = "flink-string"
    private val HighBit = 0x80
    def read(r: ByteReader): String = {
      var len = r.readByte() & 0xff
      if (len == 0) return null
      if (len >= HighBit) {
        var shift = 7
        len = len & 0x7f
        var curr = r.readByte() & 0xff
        while (curr >= HighBit) {
          len |= (curr & 0x7f) << shift; shift += 7
          curr = r.readByte() & 0xff
        }
        len |= curr << shift
      }
      len -= 1
      val data = new Array[Char](len)
      var i = 0
      while (i < len) {
        var c = r.readByte() & 0xff
        if (c >= HighBit) {
          var shift = 7
          c = c & 0x7f
          var curr = r.readByte() & 0xff
          while (curr >= HighBit) {
            c |= (curr & 0x7f) << shift; shift += 7
            curr = r.readByte() & 0xff
          }
          c |= curr << shift
        }
        data(i) = c.toChar
        i += 1
      }
      new String(data, 0, len)
    }
    def write(w: ByteWriter, v: String): Unit = {
      if (v == null) { w.writeByte(0); return }
      var lenToWrite = v.length + 1
      while (lenToWrite >= HighBit) {
        w.writeByte(lenToWrite | HighBit); lenToWrite >>>= 7
      }
      w.writeByte(lenToWrite)
      var i = 0
      while (i < v.length) {
        var c: Int = v.charAt(i)
        while (c >= HighBit) { w.writeByte(c | HighBit); c >>>= 7 }
        w.writeByte(c)
        i += 1
      }
    }
  }

  /** Flink `BytePrimitiveArraySerializer` layout: i32 length + bytes. */
  object FlinkBytesCodec extends Codec[Array[Byte]] {
    val id = "flink-bytes"
    def read(r: ByteReader): Array[Byte] = r.readFully(r.readInt())
    def write(w: ByteWriter, v: Array[Byte]): Unit = { w.writeInt(v.length); w.writeRaw(v) }
  }

  /** Flink `JavaSerializer` layout: one fresh Java object-serialization
    * stream per element (header + object) — the
    * DefaultOperatorStateBackend default for `getSerializableListState`
    * payloads (reference OperatorStateReader.java:172-185). Read-side
    * `ObjectInputStream` buffers ahead, so like [[ListCodec]] this is
    * only decodable from a slice that contains exactly one element
    * (non-keyed list entries are offset-sliced, so that holds).
    */
  object FlinkJavaCodec extends Codec[AnyRef] {
    val id = "flink-java"
    def read(r: ByteReader): AnyRef = {
      val in = new java.io.InputStream {
        def read(): Int = r.tryReadUnsignedByte()
      }
      new java.io.ObjectInputStream(in).readObject().asInstanceOf[AnyRef]
    }
    def write(w: ByteWriter, v: AnyRef): Unit = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(v); oos.flush()
      w.writeRaw(bos.toByteArray)
    }
  }

  /** Single placeholder byte, like Flink's VoidNamespaceSerializer. */
  object VoidNamespaceCodec extends Codec[Unit] {
    val id = "void"
    override def fixedWidth: Option[Int] = Some(1)
    def read(r: ByteReader): Unit = { r.readByte(); () }
    def write(w: ByteWriter, v: Unit): Unit = w.writeByte(0)
  }

  /** Flink `TimeWindow.Serializer` layout: start long + end long — the
    * namespace of window-operator state ("window-contents", P7).
    */
  object FlinkTimeWindowCodec extends Codec[(Long, Long)] {
    val id = "flink-window"
    override def fixedWidth: Option[Int] = Some(16)
    def read(r: ByteReader): (Long, Long) = (r.readLong(), r.readLong())
    def write(w: ByteWriter, v: (Long, Long)): Unit = {
      w.writeLong(v._1); w.writeLong(v._2)
    }
  }

  /** List value layout: elements separated by a ',' byte (reference:
    * RocksDBUtils.java:160-192 — note we do NOT port the stray debug
    * println at :188).
    */
  final case class ListCodec[T](elem: Codec[T]) extends Codec[List[T]] {
    val id = s"list<${elem.id}>"
    def read(r: ByteReader): List[T] = {
      val buf = scala.collection.mutable.ListBuffer.empty[T]
      val head = r.tryReadUnsignedByte()
      if (head == -1) return Nil // empty value = empty list
      buf += elem.read(new PushbackReader(head.toByte, r))
      var sep = r.tryReadUnsignedByte()
      while (sep != -1) {
        require(sep == ',', s"expected list separator 0x2c, got $sep")
        buf += elem.read(r)
        sep = r.tryReadUnsignedByte()
      }
      buf.toList
    }
    def write(w: ByteWriter, v: List[T]): Unit = {
      var first = true
      v.foreach { e =>
        if (!first) w.writeByte(',')
        elem.write(w, e)
        first = false
      }
    }
  }

  /** Map value layout: varint size + (key, nullMarker, value) entries
    * (null marker per reference MapStateKKVReader.java:73).
    */
  final case class MapCodec[K, V](kc: Codec[K], vc: Codec[V]) extends Codec[Map[K, V]] {
    val id = s"map<${kc.id},${vc.id}>"
    def read(r: ByteReader): Map[K, V] = {
      val n = r.readVarInt()
      (0 until n).map { _ =>
        val k = kc.read(r)
        val isNull = r.readBoolean()
        val v = if (isNull) null.asInstanceOf[V] else vc.read(r)
        k -> v
      }.toMap
    }
    def write(w: ByteWriter, v: Map[K, V]): Unit = {
      w.writeVarInt(v.size)
      v.foreach { case (k, value) =>
        kc.write(w, k)
        w.writeBoolean(value == null)
        if (value != null) vc.write(w, value)
      }
    }
  }

  /** TTL wrapper: 8-byte event timestamp before the payload (reference:
    * KeyedStateReader.java:279-283; StateMetadataUtils.java:196-206).
    * Reading drops the timestamp; writing TTL state is unsupported, like
    * the reference (OperatorStateWriter.java:182-184).
    */
  final case class TtlCodec[T](inner: Codec[T]) extends Codec[T] {
    val id = s"ttl<${inner.id}>"
    override def fixedWidth: Option[Int] = inner.fixedWidth.map(_ + 8)
    def read(r: ByteReader): T = { r.readLong(); inner.read(r) }
    def write(w: ByteWriter, v: T): Unit =
      throw new UnsupportedOperationException("Writing of TTL states is not supported")
  }

  /** Tuple2 struct codec (key unwrap parity with the reference's Tuple1
    * special case, OperatorStateReader.java:110-119).
    */
  final case class Tuple2Codec[A, B](a: Codec[A], b: Codec[B]) extends Codec[(A, B)] {
    val id = s"tuple2<${a.id},${b.id}>"
    override def fixedWidth: Option[Int] =
      for (wa <- a.fixedWidth; wb <- b.fixedWidth) yield wa + wb
    def read(r: ByteReader): (A, B) = (a.read(r), b.read(r))
    def write(w: ByteWriter, v: (A, B)): Unit = { a.write(w, v._1); b.write(w, v._2) }
  }

  /** Internal: lets ListCodec re-feed the lookahead byte to elem codecs. */
  private final class PushbackReader(head: Byte, tail: ByteReader)
      extends ByteReader(new java.io.SequenceInputStream(
        new java.io.ByteArrayInputStream(Array(head)),
        new java.io.InputStream {
          def read(): Int = tail.tryReadUnsignedByte()
        }))
}

/** Resolves codec ids from savepoint metadata back to codecs — the
  * stand-in for restoring Flink serializers from `StateMetaInfoSnapshot`
  * (reference: StateMetadataUtils.java:149-162, TTL detect :196-206).
  */
object CodecRegistry {
  import Codecs._

  private val primitives: Map[String, Codec[_]] = Seq(
    IntCodec, LongCodec, ShortCodec, ByteCodec, BooleanCodec,
    FloatCodec, DoubleCodec, StringCodec, BytesCodec, VoidNamespaceCodec,
    FlinkStringCodec, FlinkBytesCodec, FlinkJavaCodec, FlinkTimeWindowCodec)
    .map(c => c.id -> (c: Codec[_])).toMap

  def resolve(id: String): Codec[_] = {
    // ListCodec's wire format is EOF-delimited (',' separators, no
    // length framing — the reference's list layout), so a list is only
    // decodable as the OUTERMOST value codec: nested anywhere else it
    // would consume its container's bytes. Reject such ids up front.
    def parse(s: String, top: Boolean): Codec[_] = s match {
      case p if primitives.contains(p) => primitives(p)
      case l if l.startsWith("list<") && l.endsWith(">") =>
        if (!top) throw new IllegalArgumentException(
          s"list codec is EOF-delimited and only valid as the outermost value codec: $id")
        ListCodec(parse(l.substring(5, l.length - 1), top = false))
      case t if t.startsWith("ttl<") && t.endsWith(">") =>
        // ttl is a transparent prefix wrapper: its payload keeps the
        // wrapper's position (top stays top)
        TtlCodec(parse(t.substring(4, t.length - 1), top))
      case m if m.startsWith("map<") && m.endsWith(">") =>
        val inner = m.substring(4, m.length - 1)
        val comma = splitTopLevel(inner)
        MapCodec(parse(inner.substring(0, comma), top = false),
          parse(inner.substring(comma + 1), top = false))
      case t2 if t2.startsWith("tuple2<") && t2.endsWith(">") =>
        val inner = t2.substring(7, t2.length - 1)
        val comma = splitTopLevel(inner)
        Tuple2Codec(parse(inner.substring(0, comma), top = false),
          parse(inner.substring(comma + 1), top = false))
      case other => throw new IllegalArgumentException(s"unknown codec id: $other")
    }
    parse(id, top = true)
  }

  /** TTL wrapper detection by id, like the reference's class-name check. */
  def isTtl(id: String): Boolean = id.startsWith("ttl<")

  private def splitTopLevel(s: String): Int = {
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

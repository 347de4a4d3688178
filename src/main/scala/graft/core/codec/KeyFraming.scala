package graft.core.codec

/** Ambiguous-key framing (SURVEY.md §2.9 C2/C3; reference
  * utils/RocksDBUtils.java:44-118): when BOTH the key and the namespace
  * serializers are variable-length, the raw key bytes `[key][namespace]`
  * cannot be split unambiguously, so a var-int byte-length suffix is
  * appended after each part. Fixed-width parts never get a suffix.
  *
  * graft's default namespace (VoidNamespace, 1 fixed byte) never
  * triggers this; the kernel exists for custom-namespace states
  * (e.g. window namespaces) and for byte-level parity with the
  * reference's row format rules.
  */
object KeyFraming {

  /** Is a codec's wire format variable-length? */
  def isVarLength(c: Codec[_]): Boolean = c match {
    case Codecs.IntCodec | Codecs.LongCodec | Codecs.ShortCodec |
         Codecs.ByteCodec | Codecs.BooleanCodec | Codecs.FloatCodec |
         Codecs.DoubleCodec | Codecs.VoidNamespaceCodec => false
    case Codecs.TtlCodec(inner) => isVarLength(inner)
    case Codecs.Tuple2Codec(a, b) => isVarLength(a) || isVarLength(b)
    case _ => true // string, bytes, list, map, unknown composites
  }

  /** C3 (reference RocksDBUtils.java:89-92). */
  def isAmbiguousKeyPossible(keyCodec: Codec[_], namespaceCodec: Codec[_]): Boolean =
    isVarLength(keyCodec) && isVarLength(namespaceCodec)

  /** C2 write side: value bytes, then a var-int length suffix iff
    * ambiguous (reference RocksDBUtils.java:94-118).
    */
  def writePart[T](w: ByteWriter, value: T, c: Codec[T], ambiguous: Boolean): Unit = {
    val bytes = c.toBytes(value)
    w.writeRaw(bytes)
    if (ambiguous) w.writeVarInt(bytes.length)
  }

  /** C2 read side: decode the part, then consume its length suffix iff
    * ambiguous (reference RocksDBUtils.java:44-87).
    */
  def readPart[T](r: ByteReader, c: Codec[T], ambiguous: Boolean): T = {
    val v = c.read(r)
    if (ambiguous) r.readVarInt()
    v
  }
}

package graft.core.codec

/** Ambiguous-key framing (SURVEY.md §2.9 C2/C3; reference
  * utils/RocksDBUtils.java:44-143): when BOTH the key and the namespace
  * serializers are variable-length, the raw key bytes `[key][namespace]`
  * cannot be split unambiguously, so each part is followed by its byte
  * length written as raw little-endian base-256 digits (shift-by-8
  * do-while, RocksDBUtils.java:135-143 — NOT a LEB128 var-int). The
  * suffix is not self-delimiting: the reader decodes the part, measures
  * the consumed byte count via a position delta, and skips exactly
  * `base256digits(consumed)` suffix bytes (RocksDBUtils.java:120-125).
  * Fixed-width parts never carry a suffix.
  *
  * graft's default namespace (VoidNamespace, 1 fixed byte) never
  * triggers this; the kernel exists for custom-namespace states
  * (e.g. window namespaces) and byte-level parity with the reference's
  * row format rules.
  */
object KeyFraming {

  /** Is a codec's wire format variable-length? (reference: Flink
    * `TypeSerializer.getLength() == -1`, via [[Codec.fixedWidth]] so
    * user-supplied codecs classify correctly too).
    */
  def isVarLength(c: Codec[_]): Boolean = c.fixedWidth.isEmpty

  /** C3 (reference RocksDBUtils.java:89-92). */
  def isAmbiguousKeyPossible(keyCodec: Codec[_], namespaceCodec: Codec[_]): Boolean =
    isVarLength(keyCodec) && isVarLength(namespaceCodec)

  /** Number of base-256 digits the length suffix occupies (>= 1). */
  private def suffixBytes(len: Long): Int = {
    var v = len; var n = 0
    while ({ n += 1; v >>>= 8; v != 0 }) ()
    n
  }

  /** C2 write side: the part's bytes, then its length as raw LE digits
    * iff ambiguous (reference RocksDBUtils.java:94-118, :135-143).
    * Writes straight through — no intermediate buffer.
    */
  def writePart[T](w: ByteWriter, value: T, c: Codec[T], ambiguous: Boolean): Unit = {
    val before = w.size
    c.write(w, value)
    if (ambiguous) {
      var len = w.size - before
      while ({ w.writeByte((len & 0xff).toInt); len >>>= 8; len != 0 }) ()
    }
  }

  /** C2 read side: decode the part, measure the consumed bytes, skip its
    * suffix iff ambiguous (reference RocksDBUtils.java:44-87, :120-125).
    */
  def readPart[T](r: ByteReader, c: Codec[T], ambiguous: Boolean): T = {
    val before = r.position
    val v = c.read(r)
    if (ambiguous) r.skip(suffixBytes(r.position - before).toLong)
    v
  }
}

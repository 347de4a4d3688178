package graft.core.codec

/** Key-group math — the hard-correctness kernel of the write path
  * (SURVEY.md §7.4 #1). Mirrors the semantics of Flink's public
  * `KeyGroupRangeAssignment` / `MathUtils` (as exercised by the
  * reference at writer/functions/ValueStateToKeyedStateRow.java:55 and
  * functions/OperatorIndexForKeyGroupKey.java:24-40): a key lands in
  * key-group `murmur(javaHashCode(key)) % maxParallelism`, and key-group
  * `kg` belongs to operator subtask `kg * parallelism / maxParallelism`.
  */
object KeyGroups {

  /** murmur3-32 finalization-style hash of a single int (same algorithm
    * family as Flink MathUtils.murmurHash: full murmur3_32 of the 4-byte
    * value with seed 0x01000193).
    */
  def murmurHash(code: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var k = code
    k = k * c1
    k = Integer.rotateLeft(k, 15)
    k = k * c2
    var h = 0x01000193
    h = h ^ k
    h = Integer.rotateLeft(h, 13)
    h = h * 5 + 0xe6546b64
    // finalization (length = 4 bytes)
    h = h ^ 4
    h = h ^ (h >>> 16)
    h = h * 0x85ebca6b
    h = h ^ (h >>> 13)
    h = h * 0xc2b2ae35
    h = h ^ (h >>> 16)
    h
  }

  /** Java `Object.hashCode` semantics for supported key types (document:
    * keys beyond these need an explicit hash function).
    */
  def javaHashCode(key: Any): Int = key match {
    case i: Int     => i
    case l: Long    => (l ^ (l >>> 32)).toInt
    case s: String  => s.hashCode // Scala String IS java.lang.String
    case b: Boolean => if (b) 1231 else 1237
    case b: Byte    => b.toInt
    case sh: Short  => sh.toInt
    case c: Char    => c.toInt
    case f: Float   => java.lang.Float.hashCode(f)
    case d: Double  => java.lang.Double.hashCode(d)
    case a: Array[Byte] => java.util.Arrays.hashCode(a)
    case other      => other.hashCode()
  }

  def assignToKeyGroup(key: Any, maxParallelism: Int): Int =
    math.floorMod(murmurHash(javaHashCode(key)), maxParallelism)

  /** Subtask that owns a key-group (reference:
    * functions/OperatorIndexForKeyGroupKey.java:24-40).
    */
  def operatorIndexForKeyGroup(maxParallelism: Int, parallelism: Int, keyGroup: Int): Int =
    keyGroup * parallelism / maxParallelism

  /** Key-group range [start, end] (inclusive) owned by a subtask. */
  def keyGroupRange(maxParallelism: Int, parallelism: Int, operatorIndex: Int): (Int, Int) = {
    val start = (operatorIndex * maxParallelism + parallelism - 1) / parallelism
    val end = ((operatorIndex + 1) * maxParallelism - 1) / parallelism
    (start, end)
  }

  /** Serialized key-group prefix width: 2 bytes iff maxParallelism > 128
    * (reference: utils/StateMetadataUtils.java:89-91,
    * RocksDBUtils.java:156-158).
    */
  def prefixBytes(maxParallelism: Int): Int = if (maxParallelism > 128) 2 else 1

  /** Read the 1-2 byte big-endian key-group prefix (reference:
    * RocksDBUtils.java:35-42, types/KeyedStateRow.java:59-63).
    */
  def readKeyGroup(keyBytes: Array[Byte], maxParallelism: Int): Int = {
    if (prefixBytes(maxParallelism) == 1) keyBytes(0) & 0xff
    else ((keyBytes(0) & 0xff) << 8) | (keyBytes(1) & 0xff)
  }

  def writeKeyGroup(w: ByteWriter, keyGroup: Int, maxParallelism: Int): Unit = {
    if (prefixBytes(maxParallelism) == 1) w.writeByte(keyGroup)
    else { w.writeByte(keyGroup >>> 8); w.writeByte(keyGroup & 0xff) }
  }
}

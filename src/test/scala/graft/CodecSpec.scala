package graft

import graft.core.codec._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style roundtrips with a seeded RNG (the scalatest-scalacheck
  * bridge artifact is not in the offline cache).
  */
class CodecSpec extends AnyFunSuite {
  import Codecs._
  private val rnd = new scala.util.Random(42)

  test("var-int roundtrip, including multi-byte boundaries") {
    val cases = Seq(0, 1, 127, 128, 300, 16383, 16384, Int.MaxValue) ++
      Seq.fill(500)(rnd.nextInt(Int.MaxValue))
    cases.foreach { v =>
      val w = new ByteWriter(); w.writeVarInt(v)
      assert(new ByteReader(w.toBytes).readVarInt() == v)
    }
    val longs = Seq(0L, 127L, 128L, Long.MaxValue) ++
      Seq.fill(500)(math.abs(rnd.nextLong()) % Long.MaxValue)
    longs.foreach { v =>
      val w = new ByteWriter(); w.writeVarLong(v)
      assert(new ByteReader(w.toBytes).readVarLong() == v)
    }
  }

  test("primitive codec roundtrips") {
    (1 to 500).foreach { _ =>
      val i = rnd.nextInt(); val l = rnd.nextLong(); val d = rnd.nextDouble()
      val s = rnd.alphanumeric.take(rnd.nextInt(50)).mkString + "→é✓"
      assert(IntCodec.fromBytes(IntCodec.toBytes(i)) == i)
      assert(LongCodec.fromBytes(LongCodec.toBytes(l)) == l)
      assert(StringCodec.fromBytes(StringCodec.toBytes(s)) == s)
      assert(DoubleCodec.fromBytes(DoubleCodec.toBytes(d)) == d)
      assert(FloatCodec.fromBytes(FloatCodec.toBytes(d.toFloat)) == d.toFloat)
      assert(ShortCodec.fromBytes(ShortCodec.toBytes(i.toShort)) == i.toShort)
      assert(BooleanCodec.fromBytes(BooleanCodec.toBytes(i % 2 == 0)) == (i % 2 == 0))
      val bytes = Array.fill(rnd.nextInt(40))(rnd.nextInt().toByte)
      assert(BytesCodec.fromBytes(BytesCodec.toBytes(bytes)).sameElements(bytes))
    }
  }

  test("list codec roundtrip with ',' separators (RocksDBUtils.java:160-192 layout)") {
    val c = ListCodec(IntCodec)
    (1 to 200).foreach { _ =>
      val xs = List.fill(rnd.nextInt(20))(rnd.nextInt())
      assert(c.fromBytes(c.toBytes(xs)) == xs)
    }
    assert(c.fromBytes(Array.empty[Byte]) == Nil)
    // separator byte is literally 0x2c between fixed-width ints
    val two = c.toBytes(List(1, 2))
    assert(two.length == 9 && two(4) == ','.toByte)
    // string lists: var-length elements across separators
    val sc = ListCodec(StringCodec)
    val ss = List("", "a", "hello world", "π∂")
    assert(sc.fromBytes(sc.toBytes(ss)) == ss)
  }

  test("map codec roundtrip with null markers (MapStateKKVReader.java:73)") {
    val c = MapCodec(StringCodec, StringCodec)
    (1 to 200).foreach { _ =>
      val m = (1 to rnd.nextInt(10))
        .map(_ => rnd.alphanumeric.take(5).mkString -> rnd.alphanumeric.take(8).mkString)
        .toMap
      assert(c.fromBytes(c.toBytes(m)) == m)
    }
    val withNull: Map[String, String] = Map("a" -> "x", "b" -> null)
    assert(c.fromBytes(c.toBytes(withNull)) == withNull)
  }

  test("ttl codec skips the 8-byte timestamp and refuses writes") {
    val w = new ByteWriter()
    w.writeLong(123456789L)
    w.writeInt(42)
    assert(TtlCodec(IntCodec).fromBytes(w.toBytes) == 42)
    intercept[UnsupportedOperationException] { TtlCodec(IntCodec).toBytes(7) }
    // ttl list: per-element timestamps (TtlStateTest.java scenario)
    val lw = new ByteWriter()
    lw.writeLong(1L); lw.writeInt(10)
    lw.writeByte(','); lw.writeLong(2L); lw.writeInt(20)
    assert(ListCodec(TtlCodec(IntCodec)).fromBytes(lw.toBytes) == List(10, 20))
  }

  test("registry resolves composite ids") {
    assert(CodecRegistry.resolve("list<int>").isInstanceOf[ListCodec[_]])
    assert(CodecRegistry.resolve("map<string,ttl<int>>").isInstanceOf[MapCodec[_, _]])
    assert(CodecRegistry.resolve("ttl<list<ttl<long>>>").id == "ttl<list<ttl<long>>>")
    assert(CodecRegistry.isTtl("ttl<int>") && !CodecRegistry.isTtl("list<ttl<int>>"))
    intercept[IllegalArgumentException] { CodecRegistry.resolve("nope") }
  }
}

class KeyGroupSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(7)

  test("key-group assignment lands in [0, maxPar) and is stable") {
    (1 to 1000).foreach { _ =>
      val k = rnd.nextInt()
      val kg = KeyGroups.assignToKeyGroup(k, 128)
      assert(kg >= 0 && kg < 128)
      assert(kg == KeyGroups.assignToKeyGroup(k, 128))
    }
    // string and long keys too
    assert(KeyGroups.assignToKeyGroup("user-1", 4096) ==
      KeyGroups.assignToKeyGroup("user-1", 4096))
  }

  test("operator index math is consistent with key-group ranges") {
    for (maxPar <- Seq(128, 129, 4096); par <- Seq(1, 2, 3, 7, 32)) {
      val fromRange = (0 until par).flatMap { idx =>
        val (s, e) = KeyGroups.keyGroupRange(maxPar, par, idx)
        (s to e).map(kg => kg -> idx)
      }.toMap
      assert(fromRange.size == maxPar, s"ranges must tile [0,$maxPar)")
      (0 until maxPar).foreach { kg =>
        assert(fromRange(kg) == KeyGroups.operatorIndexForKeyGroup(maxPar, par, kg),
          s"kg=$kg maxPar=$maxPar par=$par")
      }
    }
  }

  test("prefix width flips at maxParallelism 128 (StateMetadataUtils.java:89-91)") {
    assert(KeyGroups.prefixBytes(128) == 1)
    assert(KeyGroups.prefixBytes(129) == 2)
  }

  test("key-group prefix read/write roundtrip, both widths") {
    for (maxPar <- Seq(128, 4096); kg <- Seq(0, 1, 127, 128, 300, 4095)
         if kg < maxPar) {
      val w = new ByteWriter()
      KeyGroups.writeKeyGroup(w, kg, maxPar)
      val bytes = w.toBytes ++ Array[Byte](9, 9)
      assert(KeyGroups.readKeyGroup(bytes, maxPar) == kg)
      assert(bytes.length == KeyGroups.prefixBytes(maxPar) + 2)
    }
  }

  test("java hashCode semantics for supported key types") {
    assert(KeyGroups.javaHashCode(42) == 42)
    assert(KeyGroups.javaHashCode(42L) == java.lang.Long.hashCode(42L))
    assert(KeyGroups.javaHashCode("abc") == "abc".hashCode)
    assert(KeyGroups.javaHashCode(true) == java.lang.Boolean.hashCode(true))
  }

  test("operator id is murmur3_128 of the uid (Identifiers.java:29-37)") {
    val id = graft.core.meta.Identifiers.operatorId("hello")
    assert(id.length == 32 && id.matches("[0-9a-f]{32}"))
    assert(id == graft.core.meta.Identifiers.operatorId("hello"))
    assert(id != graft.core.meta.Identifiers.operatorId("hello2"))
  }
}

class KeyFramingSpec extends AnyFunSuite {
  import Codecs._
  import KeyFraming._

  test("ambiguity detection (RocksDBUtils.java:89-92)") {
    assert(!isAmbiguousKeyPossible(IntCodec, VoidNamespaceCodec))
    assert(!isAmbiguousKeyPossible(StringCodec, VoidNamespaceCodec))
    assert(!isAmbiguousKeyPossible(LongCodec, StringCodec))
    assert(isAmbiguousKeyPossible(StringCodec, StringCodec))
    assert(isAmbiguousKeyPossible(BytesCodec, ListCodec(StringCodec)))
    assert(isVarLength(TtlCodec(StringCodec)) && !isVarLength(TtlCodec(IntCodec)))
    assert(isVarLength(Tuple2Codec(IntCodec, StringCodec)))
    assert(!isVarLength(Tuple2Codec(IntCodec, LongCodec)))
  }

  test("length-suffix framing roundtrip for ambiguous key+namespace") {
    val w = new ByteWriter()
    writePart(w, "user-42", StringCodec, ambiguous = true)
    writePart(w, "window-7", StringCodec, ambiguous = true)
    val r = new ByteReader(w.toBytes)
    assert(readPart(r, StringCodec, ambiguous = true) == "user-42")
    assert(readPart(r, StringCodec, ambiguous = true) == "window-7")
    // non-ambiguous parts carry no suffix
    val w2 = new ByteWriter()
    writePart(w2, 42, IntCodec, ambiguous = false)
    assert(w2.toBytes.length == 4)
  }

  test("suffix is raw little-endian shift-by-8 digits (RocksDBUtils.java:135-143), " +
    "correct past 127 and 255 bytes") {
    for (n <- Seq(1, 127, 128, 255, 300, 70000)) {
      val s1 = "x" * n
      val w = new ByteWriter()
      writePart(w, s1, StringCodec, ambiguous = true)
      writePart(w, "tail", StringCodec, ambiguous = true)
      val bytes = w.toBytes
      // suffix layout: part bytes, then LE digits of the part length
      val partLen = StringCodec.toBytes(s1).length
      val expectedSuffix =
        Iterator.iterate(partLen)(_ >>> 8).takeWhile(_ != 0).map(v => (v & 0xff).toByte).toSeq
      val gotSuffix = bytes.slice(partLen, partLen + expectedSuffix.length).toSeq
      assert(gotSuffix == expectedSuffix, s"n=$n")
      val r = new ByteReader(bytes)
      assert(readPart(r, StringCodec, ambiguous = true) == s1)
      assert(readPart(r, StringCodec, ambiguous = true) == "tail")
    }
  }
}

class CodecSafetySpec extends AnyFunSuite {
  import Codecs._

  test("nested list codec ids are rejected (EOF-delimited wire format)") {
    // a nested list would silently merge elements: reject at resolve time
    intercept[IllegalArgumentException] { CodecRegistry.resolve("list<list<long>>") }
    intercept[IllegalArgumentException] { CodecRegistry.resolve("map<string,list<int>>") }
    intercept[IllegalArgumentException] { CodecRegistry.resolve("tuple2<list<int>,long>") }
    // lists remain fine as the outermost value codec, incl. under ttl
    assert(CodecRegistry.resolve("list<int>").id == "list<int>")
    assert(CodecRegistry.resolve("ttl<list<ttl<long>>>").id == "ttl<list<ttl<long>>>")
  }

  test("skip on truncated input raises EOFException instead of hanging") {
    val r = new ByteReader(Array[Byte](1, 2, 3))
    intercept[java.io.EOFException] { r.skip(10) }
  }
}

class KMinValuesSpec extends AnyFunSuite {
  import graft.functions.KMinValues
  import org.apache.spark.sql.catalyst.expressions.Literal

  private def agg = KMinValues(Literal(0L), 4)

  test("buffer keeps the k smallest distinct values through merge and serde") {
    val a = agg.createAggregationBuffer()
    Seq(50L, 10L, 30L, 10L, 90L).foreach { v =>
      a.add(v); if (a.size > 4) a.pollLast()
    }
    val b = agg.deserialize(agg.serialize(a)) // serde roundtrip
    assert(b.equals(a))
    val other = agg.createAggregationBuffer()
    Seq(5L, 70L, 30L).foreach { v => other.add(v); if (other.size > 4) other.pollLast() }
    val merged = agg.merge(b, other)
    val out = agg.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    assert(out.toLongArray().toSeq == Seq(5L, 10L, 30L, 50L))
  }
}

package graft

import graft.core.codec._
import graft.core.codec.Codecs._

import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based coverage for the byte-level foundation every savepoint
  * read/write stands on (C1–C11): arbitrary values roundtrip through
  * the var-int/string/bytes wire helpers, every codec is its own
  * inverse, key-group assignment stays in range and partitions exactly,
  * and the key/namespace framing decodes exactly what it encoded for
  * ambiguous (var-length) layouts. Deterministic example specs
  * (CodecSpec, StateFormatSpec) pin known byte vectors; these sweep the
  * input space around them with a fixed seed (reproducible failures —
  * no scalatest-scalacheck bridge in the offline cache, so sampling is
  * driven directly).
  */
class CodecPropertySpec extends AnyFunSuite {

  private def forAllG[T](gen: Gen[T], n: Int = 200)(f: T => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  private val anyInt = Arbitrary.arbitrary[Int]
  private val anyLong = Arbitrary.arbitrary[Long]
  private val anyString = Arbitrary.arbitrary[String]
  private val anyBytes = Arbitrary.arbitrary[Array[Byte]]

  // ----------------------------------------------------------- var-ints

  test("writeVarInt/readVarInt roundtrip non-negative Ints, position " +
    "advances by the encoded width; negatives fail fast") {
    forAllG(Gen.chooseNum(0, Int.MaxValue)) { v =>
      val w = new ByteWriter()
      w.writeVarInt(v)
      val bytes = w.toBytes
      assert(bytes.length >= 1 && bytes.length <= 5)
      val r = new ByteReader(bytes)
      assert(r.readVarInt() === v)
      assert(r.position === bytes.length.toLong)
    }
    // the layer is unsigned by contract (lengths/counts/ids): a
    // negative is always a caller bug and must not be silently encoded
    forAllG(Gen.chooseNum(Int.MinValue, -1), n = 50) { v =>
      intercept[IllegalArgumentException] { new ByteWriter().writeVarInt(v) }
    }
  }

  test("writeVarLong/readVarLong roundtrip non-negative Longs; " +
    "negatives fail fast") {
    forAllG(Gen.chooseNum(0L, Long.MaxValue)) { v =>
      val w = new ByteWriter()
      w.writeVarLong(v)
      val bytes = w.toBytes
      assert(bytes.length >= 1 && bytes.length <= 9)
      assert(new ByteReader(bytes).readVarLong() === v)
    }
    forAllG(Gen.chooseNum(Long.MinValue, -1L), n = 50) { v =>
      intercept[IllegalArgumentException] { new ByteWriter().writeVarLong(v) }
    }
  }

  test("var-int boundaries encode at exact widths") {
    // 7 bits per byte: [0,127] -> 1, [128, 16383] -> 2, ...
    def width(v: Int): Int = {
      val w = new ByteWriter(); w.writeVarInt(v); w.toBytes.length
    }
    assert(width(0) === 1 && width(127) === 1)
    assert(width(128) === 2 && width(16383) === 2)
    assert(width(16384) === 3)
    assert(width(Int.MaxValue) === 5)
  }

  test("strings and byte arrays roundtrip (incl. surrogates and 0xFF)") {
    forAllG(Gen.zip(anyString, anyBytes)) { case (s, b) =>
      val w = new ByteWriter()
      w.writeString(s)
      w.writeBytes(b)
      val r = new ByteReader(w.toBytes)
      assert(r.readString() === s)
      assert(r.readBytes().toSeq === b.toSeq)
    }
  }

  // ------------------------------------------------------------- codecs

  private def roundtrips[T](c: Codec[T], gen: Gen[T]): Unit =
    forAllG(gen) { v =>
      val got = c.fromBytes(c.toBytes(v))
      (got, v) match {
        case (g: Array[Byte], x: Array[Byte]) => assert(g.toSeq === x.toSeq)
        case _                                => assert(got === v)
      }
    }

  test("primitive codecs are inverses on arbitrary values") {
    roundtrips(IntCodec, anyInt)
    roundtrips(LongCodec, anyLong)
    roundtrips(ShortCodec, Arbitrary.arbitrary[Short])
    roundtrips(ByteCodec, Arbitrary.arbitrary[Byte])
    roundtrips(BooleanCodec, Arbitrary.arbitrary[Boolean])
    roundtrips(StringCodec, anyString)
    roundtrips(BytesCodec, anyBytes)
  }

  test("float/double codecs are bit-exact (NaN payloads preserved)") {
    forAllG(Gen.zip(Arbitrary.arbitrary[Float], Arbitrary.arbitrary[Double])) {
      case (f, d) =>
        assert(java.lang.Float.floatToRawIntBits(
          FloatCodec.fromBytes(FloatCodec.toBytes(f))) ===
          java.lang.Float.floatToRawIntBits(f))
        assert(java.lang.Double.doubleToRawLongBits(
          DoubleCodec.fromBytes(DoubleCodec.toBytes(d))) ===
          java.lang.Double.doubleToRawLongBits(d))
    }
  }

  test("FlinkStringCodec roundtrips arbitrary unicode") {
    forAllG(anyString)(s =>
      assert(FlinkStringCodec.fromBytes(FlinkStringCodec.toBytes(s)) === s))
  }

  test("composite codecs (list/map/tuple2) roundtrip with nesting") {
    val listC = ListCodec(LongCodec)
    forAllG(Gen.listOf(anyLong)) { xs =>
      assert(listC.fromBytes(listC.toBytes(xs)) === xs)
    }
    val mapC = MapCodec(IntCodec, FlinkStringCodec)
    forAllG(Gen.mapOf(Gen.zip(anyInt, anyString))) { m =>
      assert(mapC.fromBytes(mapC.toBytes(m)) === m)
    }
    val tupC = Tuple2Codec(LongCodec, ListCodec(IntCodec))
    forAllG(Gen.zip(anyLong, Gen.listOf(anyInt))) { case (a, bs) =>
      assert(tupC.fromBytes(tupC.toBytes((a, bs))) === ((a, bs)))
    }
  }

  test("CodecRegistry resolves composite ids back to equivalent codecs; " +
    "non-outermost lists are rejected (EOF-delimited layout)") {
    Seq("long", "int", "flink-string", "list<double>",
      "map<int,flink-string>", "ttl<list<long>>", "tuple2<long,int>")
      .foreach(id => assert(CodecRegistry.resolve(id).id === id))
    // a list's wire format has no length framing, so nesting one inside
    // another container would consume the container's bytes — rejected
    Seq("list<list<long>>", "map<long,list<int>>").foreach { id =>
      val e = intercept[IllegalArgumentException] { CodecRegistry.resolve(id) }
      assert(e.getMessage.contains("outermost"))
    }
  }

  // --------------------------------------------------------- key groups

  private val maxParGen = Gen.oneOf(1, 2, 37, 128, 129, 512, 4096, 32768)

  test("assignToKeyGroup stays in [0, maxPar) for arbitrary keys") {
    forAllG(Gen.zip(anyLong, maxParGen)) { case (k, mp) =>
      val kg = KeyGroups.assignToKeyGroup(k, mp)
      assert(kg >= 0 && kg < mp)
    }
    forAllG(Gen.zip(anyString, maxParGen)) { case (k, mp) =>
      val kg = KeyGroups.assignToKeyGroup(k, mp)
      assert(kg >= 0 && kg < mp)
    }
  }

  test("operator index ranges partition the key-group space exactly") {
    forAllG(Gen.zip(maxParGen, Gen.choose(1, 64)), n = 60) { case (mp, par0) =>
      val par = math.min(par0, mp)
      val covered = (0 until par).flatMap { op =>
        val (s, e) = KeyGroups.keyGroupRange(mp, par, op)
        (s to e).map { kg =>
          assert(KeyGroups.operatorIndexForKeyGroup(mp, par, kg) === op,
            s"kg $kg op $op mp $mp par $par")
          kg
        }
      }
      assert(covered === (0 until mp))
    }
  }

  test("key-group prefix write/read roundtrips at both widths and never " +
    "sets the metadata-follows flag bit") {
    forAllG(maxParGen.flatMap(mp => Gen.choose(0, mp - 1).map(mp -> _)),
      n = 400) { case (mp, kg) =>
      val w = new ByteWriter()
      KeyGroups.writeKeyGroup(w, kg, mp)
      val bytes = w.toBytes
      assert(bytes.length === KeyGroups.prefixBytes(mp))
      assert(KeyGroups.readKeyGroup(bytes, mp) === kg)
      // the 0x80 flag bit of byte 0 must stay free for every
      // representable key group (C7 invariant: maxPar <= 32768)
      assert((bytes(0) & 0x80) === 0, s"kg $kg mp $mp sets the flag bit")
    }
  }

  // ------------------------------------------------------- key framing

  test("ambiguous (var-length) key/namespace framing is the identity") {
    forAllG(Gen.zip(anyString, anyString)) { case (key, ns) =>
      val ambiguous = KeyFraming.isAmbiguousKeyPossible(StringCodec, StringCodec)
      assert(ambiguous) // two var-length parts -> framed layout
      val w = new ByteWriter()
      KeyFraming.writePart(w, key, StringCodec, ambiguous)
      KeyFraming.writePart(w, ns, StringCodec, ambiguous)
      val r = new ByteReader(w.toBytes)
      assert(KeyFraming.readPart(r, StringCodec, ambiguous) === key)
      assert(KeyFraming.readPart(r, StringCodec, ambiguous) === ns)
    }
  }

  test("fixed-width framing adds no overhead and roundtrips") {
    forAllG(anyLong) { key =>
      val ambiguous = KeyFraming.isAmbiguousKeyPossible(LongCodec, VoidNamespaceCodec)
      assert(!ambiguous)
      val w = new ByteWriter()
      KeyFraming.writePart(w, key, LongCodec, ambiguous)
      assert(w.toBytes.length === 8)
      assert(KeyFraming.readPart(new ByteReader(w.toBytes), LongCodec,
        ambiguous) === key)
    }
  }

  test("MisraGries buffers roundtrip serialize/deserialize and stay " +
    "exact under arbitrary splits when capacity covers the keys") {
    val mg = graft.functions.MisraGries(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 16)
    val genTerms = Gen.listOfN(300, Gen.oneOf((1 to 12).map(i => s"k$i")))
    val genSplit = for {
      ts <- genTerms; cut <- Gen.choose(0, ts.length)
    } yield (ts, cut)
    forAllG(genSplit, n = 100) { case (terms, cut) =>
      def buildVia(items: Seq[String]) = {
        val b = mg.createAggregationBuffer()
        items.foreach { t =>
          val cur = b.getOrDefault(t, 0L)
          if (cur > 0L) b.put(t, cur + 1L)
          else if (b.size < 16) b.put(t, 1L)
        }
        b
      }
      // merge of a split must equal the unsplit build (12 keys < m=16:
      // both sides exact), and survive the wire roundtrip
      val (l, r) = terms.splitAt(cut)
      val merged = mg.merge(
        mg.deserialize(mg.serialize(buildVia(l))),
        mg.deserialize(mg.serialize(buildVia(r))))
      val whole = buildVia(terms)
      import scala.jdk.CollectionConverters._
      assert(merged.asScala === whole.asScala)
      val rt = mg.deserialize(mg.serialize(merged))
      assert(rt.asScala === merged.asScala)
    }
  }
}

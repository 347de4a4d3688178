package graft

import graft.functions.PolyHash32

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-8 de-shuffle replaced the exploded-groupBy MinHash and
  * SimHash pipelines with per-row array-HOF folds. The oracle gate
  * proves equality on the driver corpus; this spec proves it on
  * ADVERSARIAL random inputs (empty strings, unicode, 0-50 words,
  * repeated words — repetition is where a "min over distinct" vs "min
  * over all" or a ±1-sum multiplicity bug would show) against
  * independent plain-Scala reference implementations.
  */
class NarrowSignatureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // the published permutation family (Dedup.scala constants)
  private val P = 4294967291L
  private val Perms = 16
  private def permA(j: Int): Long =
    ((1103515245L * (j + 1) + 12345L) % (1L << 30)) | 1L
  private def permB(j: Int): Long = (69069L * (j + 7) + 1L) % P

  private def refSimhash(text: String): Long = {
    // independent 64-bit reference: bits 0-31 from the PolyHash32 fold,
    // bits 32-63 from the (mult 37, mod 4294967279) fold; signed
    // assembly hi*2^32+lo with bit 63 as -2^31 inside the high half.
    // Spark's split(str, regex) keeps trailing empty strings (limit -1)
    def hash2(s: String): Long = {
      var h = 0L
      s.foreach(c => h = (h * 37L + c) % 4294967279L)
      h
    }
    val words = text.split(" ", -1)
    val bits = Array.fill(64)(0L)
    words.foreach { w =>
      val h1 = PolyHash32.hash(w)
      val h2 = hash2(w)
      (0 until 32).foreach { i =>
        bits(i) += (if (((h1 >> i) & 1L) == 1L) 1L else -1L)
        bits(32 + i) += (if (((h2 >> i) & 1L) == 1L) 1L else -1L)
      }
    }
    val lo = (0 until 32).map(i => if (bits(i) > 0) 1L << i else 0L).sum
    val hi = (0 until 31).map(i => if (bits(32 + i) > 0) 1L << i else 0L).sum +
      (if (bits(63) > 0) -2147483648L else 0L)
    hi * 4294967296L + lo
  }

  private def refMinhash(text: String): Option[Seq[Long]] = {
    val w = text.split(" ", -1)
    if (w.length < 3) None
    else {
      val hs = (0 until w.length - 2)
        .map(i => PolyHash32.hash(s"${w(i)} ${w(i + 1)} ${w(i + 2)}"))
      Some((0 until Perms).map(j => hs.map(h => (permA(j) * h + permB(j)) % P).min))
    }
  }

  private def randomDocs(n: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Seq("the", "a", "détente", "漢字", "x", "", "zz9",
      "word", "word", "repeat") // duplicates on purpose
    (1L to n.toLong).map { i =>
      val len = rnd.nextInt(51)
      (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }

  test("narrow simhash equals the plain-Scala reference on random docs") {
    val s = spark
    import s.implicits._
    val docs = randomDocs(200, 8101)
    val got = graft.llm.Dedup.simhashFingerprints(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == refSimhash(text), s"doc $id '$text'")
    }
  }

  test("narrow minhash signature equals the plain-Scala reference, and " +
    "docs without shingles produce no signature") {
    val s = spark
    import s.implicits._
    val docs = randomDocs(200, 8102)
    val got = graft.llm.Dedup
      .minhashSignatureNarrow(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (0 until Perms).map(j => r.getLong(1 + j)))
      .toMap
    docs.foreach { case (id, text) =>
      refMinhash(text) match {
        case None      => assert(!got.contains(id), s"doc $id should have no sig")
        case Some(ref) => assert(got(id) == ref, s"doc $id '$text'")
      }
    }
  }
}

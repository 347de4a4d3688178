package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Multimodal
import graft.llm.Multimodal.{MediaRow, WavPcmCodec}

/** Round-14: the REAL audio decode path behind the m12 seam.
  *
  * [[Multimodal.WavPcmCodec]] is a genuine RIFF/WAVE → PCM decoder
  * (pure-JVM `javax.sound.sampled`), and [[Multimodal.vadSegments]]
  * runs m12's exact segment machinery over it. These specs build WAV
  * payloads BY HAND (raw 44-byte RIFF headers, little-endian samples —
  * independent of the JDK's own writer) with planted tone-burst
  * structure, then assert the decoded samples and the distributed VAD
  * report recover that structure exactly. The m12 gate query keeps
  * StubMediaCodec so the DuckDB oracle can replay its arithmetic; this
  * suite is the evidence the seam takes a real codec end-to-end.
  */
class RoundFourteenOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A minimal PCM WAV container: 44-byte RIFF header + the samples
    * little-endian, `channels` interleaved 16-bit frames.
    */
  private def wavBytes(samples: Array[Short], channels: Int = 1,
      rate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(rate)
      .putInt(rate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** `spec` is (runFrames, amplitude) islands at 32-sample frame
    * grain: amplitude 0 = silence, nonzero = a planted tone burst.
    */
  private def toneClip(spec: Seq[(Int, Short)]): Array[Short] =
    spec.flatMap { case (frames, amp) =>
      Array.fill(frames * 32)(amp)
    }.toArray

  test("WavPcmCodec decodes a hand-rolled mono WAV bit-exactly") {
    val planted = Array[Short](0, 1000, -1000, 32767, -32768, 7, 0, -7)
    val got = WavPcmCodec.pcm(MediaRow(1L, "wav", wavBytes(planted)))
    assert(got.toSeq == planted.map(_.toInt).toSeq)
  }

  test("WavPcmCodec takes channel 0 of stereo deterministically") {
    // interleave: channel 0 carries the signal, channel 1 junk
    val inter = Array[Short](100, -9999, 200, 1234, -300, 31000)
    val got = WavPcmCodec.pcm(MediaRow(2L, "wav", wavBytes(inter, channels = 2)))
    assert(got.toSeq == Seq(100, 200, -300))
  }

  test("vadSegments over REAL WAV payloads recovers the planted burst " +
    "structure (the m12 report, real codec end-to-end)") {
    import spark.implicits._
    // amplitude 1000 → frame energy 32·10⁶ ≥ threshold; silence → 0
    val on: Short = 1000
    val clips = Seq(
      // doc 10: bursts of 2, 5, 3 frames with silent gaps → 3 segments
      10L -> toneClip(Seq((1, 0: Short), (2, on), (3, 0: Short), (5, on),
        (1, 0: Short), (3, on), (2, 0: Short))),
      // doc 11: all silence → zeros row must SURVIVE in the report
      11L -> toneClip(Seq((6, 0: Short))),
      // doc 12: wall-to-wall tone → one segment spanning every frame
      12L -> toneClip(Seq((4, on)))
    )
    val media = clips.map { case (id, s) => (id, "wav", wavBytes(s)) }
      .toDF("doc_id", "format", "payload")
    val out = Multimodal.vadSegments(media, WavPcmCodec,
      frameSize = 32, threshold = 1000000L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(10L) == ((17L, 10L, 3L, 5L)))
    assert(out(11L) == ((6L, 0L, 0L, 0L)))
    assert(out(12L) == ((4L, 4L, 1L, 4L)))
  }

  // ------------------------------------ round-14 statistics panel

  private val sf = "/root/testdata/sf0.001"

  test("q82: U, ties, and z² recount exactly from first principles " +
    "(average ranks over the raw per-customer counts)") {
    import org.apache.spark.sql.functions._
    val counts = Catalog.t(spark, sf, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      .select(expr("abs(o_custkey % 2)").as("v"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val all = counts.map(_._2).sorted
    // doubled average rank per value, from the raw sorted sequence
    val dr = all.zipWithIndex.groupBy(_._1).map { case (v, xs) =>
      v -> xs.map { case (_, i) => 2L * (i + 1) }.sum / xs.length
    }
    val r12 = counts.filter(_._1 == 1L).map(c => dr(c._2)).sum
    val n1 = counts.count(_._1 == 1L).toLong
    val n0 = counts.count(_._1 == 0L).toLong
    val u12 = r12 - n1 * (n1 + 1)
    val tie = all.groupBy(identity).values
      .map(g => g.length.toLong).map(t => t * t * t - t).sum
    val row = SparkEntry.queries("q82_ranksum_test")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_control") == n0)
    assert(row.getAs[Long]("n_treatment") == n1)
    assert(row.getAs[Long]("u1_doubled") == u12,
      s"doubled U: got ${row.getAs[Long]("u1_doubled")}, want $u12")
    assert(row.getAs[Long]("tie_term") == tie)
    assert(tie > 0L,
      "no ties at gate scale — the average-rank machinery is vacuous")
    val n = BigInt(n0 + n1)
    val diff2 = BigInt(u12) - BigInt(n0) * BigInt(n1)
    val den = BigInt(n0) * BigInt(n1) * (n * n * n - n - BigInt(tie))
    val z2 = diff2 * diff2 * 3 * n * (n - 1) * 1000000 / den
    assert(BigInt(row.getAs[Long]("z2_fx")) == z2)
  }

  test("q83: Gini recounts exactly per source and stays in [0, 1)") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q83_gini_concentration")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.nonEmpty)
    out.values.foreach { case (_, _, g) =>
      assert(g >= 0L && g < 1000000L, s"gini_fx $g escapes [0, 1e6)")
    }
    val toks = Catalog.t(spark, sf, "documents")
      .select(col("source"), col("doc_id"),
        expr("cast(size(split(text, ' ')) as bigint)").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    toks.groupBy(_._1).foreach { case (src, docs) =>
      val xs = docs.sortBy(d => (d._3, d._2)).map(_._3)
      val nd = BigInt(xs.length)
      val tot = xs.map(BigInt(_)).sum
      val iwx = xs.zipWithIndex.map { case (x, i) =>
        BigInt(i + 1) * x }.sum
      val want =
        if (tot == 0) BigInt(0)
        else (2 * iwx - (nd + 1) * tot) * 1000000 / (nd * tot)
      assert(BigInt(out(src)._3) == want, s"$src: gini mismatch")
      assert(out(src)._1 == xs.length && BigInt(out(src)._2) == tot)
    }
  }

  test("q84: concordant/discordant/tied partition the day pairs and " +
    "recount exactly") {
    import org.apache.spark.sql.functions._
    val row = SparkEntry.queries("q84_kendall_corr")(spark, sf)
      .collect().head
    val nDays = row.getAs[Long]("n_days")
    val nPairs = row.getAs[Long]("n_pairs")
    assert(nPairs == nDays * (nDays - 1) / 2)
    assert(row.getAs[Long]("concordant") + row.getAs[Long]("discordant") +
      row.getAs[Long]("tied") == nPairs)
    // first principles over the zero-filled day series
    val byDay = Catalog.t(spark, sf, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("a"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("b"))
      .collect()
      .map(r => r.getDate(0).toLocalDate -> (r.getLong(1), r.getLong(2)))
      .toMap
    val days = byDay.keys.min.toEpochDay to byDay.keys.max.toEpochDay
    val series = days.map(e => byDay.getOrElse(
      java.time.LocalDate.ofEpochDay(e), (0L, 0L)))
    assert(series.length.toLong == nDays)
    var (cc, dd, tt) = (0L, 0L, 0L)
    for (i <- series.indices; j <- (i + 1) until series.length) {
      val p = (series(i)._1 - series(j)._1) * (series(i)._2 - series(j)._2)
      if (p > 0) cc += 1 else if (p < 0) dd += 1 else tt += 1
    }
    assert(row.getAs[Long]("concordant") == cc)
    assert(row.getAs[Long]("discordant") == dd)
    assert(row.getAs[Long]("tied") == tt)
    assert(row.getAs[Long]("s_stat") == cc - dd)
  }

  test("q85: the lag-1 autocorrelation recounts exactly and respects " +
    "|r1| <= 1") {
    import org.apache.spark.sql.functions._
    val row = SparkEntry.queries("q85_autocorr_lag1")(spark, sf)
      .collect().head
    val r1 = row.getAs[Long]("r1_fx")
    assert(r1 >= -1000000L && r1 <= 1000000L)
    val byDay = Catalog.t(spark, sf, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    val days = byDay.keys.min.toEpochDay to byDay.keys.max.toEpochDay
    val ys = days.map(e => byDay.getOrElse(
      java.time.LocalDate.ofEpochDay(e), 0L)).map(BigInt(_))
    val n = BigInt(ys.length)
    val sTot = ys.sum
    val cy = ys.map(y => n * y - sTot)
    val den = cy.map(c => c * c).sum
    val num = cy.zip(cy.tail).map { case (a2, b2) => a2 * b2 }.sum
    val want = if (den == 0) BigInt(0) else num * 1000000 / den
    assert(row.getAs[Long]("n_days") == ys.length.toLong)
    assert(BigInt(row.getAs[Long]("total_events")) == sTot)
    assert(BigInt(r1) == want, s"r1_fx $r1 != recount $want")
  }

  test("the real-codec path and the gate's stub path share one report " +
    "kernel (same schema, same column semantics)") {
    val real = Multimodal.vadSegments(
      {
        import spark.implicits._
        Seq((1L, "wav", wavBytes(toneClip(Seq((2, 1000: Short))))))
          .toDF("doc_id", "format", "payload")
      },
      WavPcmCodec)
    val gate = SparkEntry.queries("m12_audio_vad")(
      spark, "/root/testdata/sf0.001")
    assert(real.schema.map(f => f.name -> f.dataType) ==
      gate.schema.map(f => f.name -> f.dataType))
  }
}

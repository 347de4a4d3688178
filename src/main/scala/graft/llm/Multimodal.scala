package graft.llm

import graft.{Catalog, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads modeled as opaque `binary`
  * columns with a typed metadata struct, processed by batched
  * mapPartitions stages (the Scala analogue of `mapInPandas` batch
  * processing). The container has no image/audio codecs, so the decode
  * kernel is a clearly-marked deterministic STUB — the Spark-side
  * plumbing (schema, partitioning, batch shape) is real and tested.
  *
  * The test corpus has no binary media, so the payload is the utf-8
  * encoding of `documents.text` — the pipeline shape is identical for a
  * real image/audio payload column.
  */
object Multimodal {

  /** Input row for the decode stage: id + media metadata + opaque bytes. */
  final case class MediaRow(doc_id: Long, format: String, payload: Array[Byte])

  /** Output of the stubbed decode/feature-extract kernel. */
  final case class MediaFeatures(
      doc_id: Long, format: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** Output of the modality-routed resize/resample stub (m04). */
  final case class MediaResized(
      doc_id: Long, format: String, out_w: Int, out_h: Int,
      n_samples: Long, n_thumbs: Int)

  /** SPI seam for the decode kernel: implement this trait with a real
    * image/audio/video codec (javax.imageio, JavaCV, an FFI wrapper —
    * anything Serializable) and pass it to [[decodeFeatures]] /
    * [[frameSample]] / [[modalityResize]]. `decode` runs executor-side
    * inside batched mapPartitions, one call per media row; it must be
    * deterministic for reproducible pipelines and must not retain the
    * payload beyond the call (batches stream through).
    */
  trait MediaCodec extends Serializable {
    def decode(r: MediaRow): MediaFeatures
  }

  /** Default codec: an honest deterministic STUB. This container ships
    * no media codecs, so a real implementation cannot exist here; the
    * stub derives fake dimensions and a rolling checksum from the
    * payload bytes so the full pipeline (schema, batching, dispatch,
    * oracle checks) runs for real. Swap it out via the [[MediaCodec]]
    * parameter — the gate queries keep the stub so the DuckDB oracle
    * can replay the arithmetic exactly.
    */
  object StubMediaCodec extends MediaCodec {
    def decode(r: MediaRow): MediaFeatures = {
      val n = r.payload.length
      val checksum = r.payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 4294967291L)
      val width = 64 + (checksum % 64).toInt
      val height = 64 + ((checksum / 64) % 64).toInt
      val frames = if (r.format == "mp4") 1 + n / 100 else 1
      MediaFeatures(r.doc_id, r.format, n.toLong, width, height, frames, checksum)
    }
  }

  /** Public API: batched decode/feature-extract of a media frame
    * `(doc_id, format, payload)` through the pluggable codec (m02's
    * pipeline). Batch size bounds peak decoded-payload memory per task.
    */
  def decodeFeatures(media: DataFrame, codec: MediaCodec = StubMediaCodec,
      batchSize: Int = 64): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(batch => batch.map(codec.decode)))
      .toDF()
  }

  /** Public API: every-`stride`th-frame sampling of video rows (m03). */
  def frameSample(media: DataFrame, codec: MediaCodec = StubMediaCodec,
      stride: Int = 4, batchSize: Int = 64): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.as[MediaRow]
      .filter((r: MediaRow) => r.format == "mp4")
      .mapPartitions(_.grouped(batchSize).flatMap(batch => batch.map(codec.decode)))
      .flatMap(f => (0 until f.n_frames by stride).map(i => (f.doc_id, i)))
      .toDF("doc_id", "frame_idx")
  }

  /** Public API: modality router (m04) — decode through the codec, then
    * dispatch per-format kernels (image resize to a 32-wide box, audio
    * resample, video thumbnail count).
    */
  def modalityResize(media: DataFrame, codec: MediaCodec = StubMediaCodec,
      batchSize: Int = 64): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        val f = codec.decode(r) // modality dispatch on the decoded meta
        f.format match {
          case "png" | "jpeg" => MediaResized(f.doc_id, f.format,
            32, math.max(f.height * 32 / f.width, 1), 0L, 0)
          case "wav" => MediaResized(f.doc_id, f.format, 0, 0, f.n_bytes / 4, 0)
          case _ => MediaResized(f.doc_id, f.format, 0, 0, 0L,
            1 + (f.n_frames - 1) / 4)
        }
      }))
      .toDF()
  }

  private val Formats = Seq("png", "jpeg", "wav", "mp4")

  private def mediaDF(s: SparkSession, d: String): DataFrame = {
    val fmtArr = Formats.map(f => s"'$f'").mkString("array(", ", ", ")")
    Catalog.t(s, d, "documents").select(
      col("doc_id"),
      expr(s"element_at($fmtArr, cast(doc_id % ${Formats.size} as int) + 1)").as("format"),
      encode(col("text"), "UTF-8").as("payload"))
  }

  def all: Seq[QueryDef] = Seq(

    // Metadata projection over the binary column — oracle-checked.
    QueryDef(
      "m01_multimodal_meta",
      Some(s"""SELECT doc_id,
              |  (['png', 'jpeg', 'wav', 'mp4'])[cast(doc_id % 4 as int) + 1] AS format,
              |  cast(strlen(text) as bigint) AS n_bytes
              |FROM documents""".stripMargin),
      (s, d) => mediaDF(s, d).select(
        col("doc_id"), col("format"),
        expr("cast(octet_length(payload) as bigint)").as("n_bytes"))),

    // Batched decode/feature-extract through the typed Dataset pipeline.
    // The decode kernel is a deterministic stub (polynomial mod-hash
    // checksum over the payload bytes), so the oracle can reproduce it
    // exactly in SQL. The oracle folds the UTF-8 BYTES (duckByteHash
    // over hex(encode(text))), matching the Spark-side payload fold for
    // ANY text, ASCII or not.
    QueryDef(
      "m02_multimodal_decode",
      Some(s"""WITH c AS (SELECT doc_id,
              |    (['png', 'jpeg', 'wav', 'mp4'])[cast(doc_id % 4 as int) + 1] AS format,
              |    cast(strlen(text) as bigint) AS n_bytes,
              |    ${TextExprs.duckByteHash("text")} AS checksum
              |  FROM documents)
              |SELECT doc_id, format, n_bytes,
              |  cast(64 + checksum % 64 as int) AS width,
              |  cast(64 + (checksum // 64) % 64 as int) AS height,
              |  cast(CASE WHEN format = 'mp4' THEN 1 + n_bytes // 100 ELSE 1 END as int) AS n_frames,
              |  checksum
              |FROM c""".stripMargin),
      (s, d) => decodeFeatures(mediaDF(s, d))),

    // Frame sampling: one row per sampled frame of each decoded video
    // (every 4th frame). The decode stub drives n_frames; the explode is
    // the real frame-sample plumbing shape. Oracle reproduces the
    // deterministic stub arithmetic (checksum -> n_frames) in SQL, so
    // even the stubbed kernel is hash-verified.
    QueryDef(
      "m03_frame_sample",
      Some("""WITH f AS (SELECT doc_id,
             |    1 + cast(strlen(text) // 100 as int) AS n_frames
             |  FROM documents WHERE doc_id % 4 = 3)
             |SELECT doc_id, cast(unnest(range(0, n_frames, 4)) as int) AS frame_idx
             |FROM f""".stripMargin),
      (s, d) => frameSample(mediaDF(s, d))),

    // m04: modality router — one typed pipeline dispatches per-format
    // kernels (image resize to a 32-wide box, audio resample, video
    // thumbnail count). Kernels are integer-arithmetic stubs derived
    // from the m02 decode (a real pipeline swaps in codec calls; the
    // dispatch, schema, and batching are the production shape). Oracle
    // replays the same integer math per format branch.
    QueryDef(
      "m04_modality_resize",
      Some(s"""WITH c AS (SELECT doc_id,
              |    (['png', 'jpeg', 'wav', 'mp4'])[cast(doc_id % 4 as int) + 1] AS format,
              |    cast(strlen(text) as bigint) AS n_bytes,
              |    ${TextExprs.duckByteHash("text")} AS checksum
              |  FROM documents),
              |f AS (SELECT doc_id, format, n_bytes,
              |    cast(64 + checksum % 64 as int) AS width,
              |    cast(64 + (checksum // 64) % 64 as int) AS height,
              |    cast(CASE WHEN format = 'mp4' THEN 1 + n_bytes // 100
              |      ELSE 1 END as int) AS n_frames
              |  FROM c)
              |SELECT doc_id, format,
              |  cast(CASE WHEN format IN ('png', 'jpeg') THEN 32 ELSE 0 END as int) AS out_w,
              |  cast(CASE WHEN format IN ('png', 'jpeg')
              |    THEN greatest((height * 32) // width, 1) ELSE 0 END as int) AS out_h,
              |  cast(CASE WHEN format = 'wav' THEN n_bytes // 4 ELSE 0 END as bigint)
              |    AS n_samples,
              |  cast(CASE WHEN format = 'mp4' THEN 1 + (n_frames - 1) // 4
              |    ELSE 0 END as int) AS n_thumbs
              |FROM f""".stripMargin),
      (s, d) => modalityResize(mediaDF(s, d))),

    // m05: modality-partitioned shard packing — the export step for
    // binary media: within each modality, blobs pack in doc_id order
    // into shards capped at ShardBytes (greedy running-sum cut, the
    // p01 packing shape over bytes instead of tokens), and the
    // manifest reports per-shard item/byte totals. At corpus scale the
    // window key is (modality, corpus shard); the manifest is what a
    // WebDataset-style writer persists next to the tar shards.
    QueryDef(
      "m05_media_shards",
      Some(s"""WITH m AS (SELECT doc_id,
              |    (['png', 'jpeg', 'wav', 'mp4'])[cast(doc_id % 4 as int) + 1]
              |      AS format,
              |    cast(strlen(text) as bigint) AS n_bytes FROM documents),
              |x AS (SELECT *,
              |    cast((sum(n_bytes) OVER (PARTITION BY format ORDER BY doc_id
              |      ROWS UNBOUNDED PRECEDING) - n_bytes) // $ShardBytes as int)
              |      AS shard_id
              |  FROM m)
              |SELECT format, shard_id, count(*) AS n_items,
              |  cast(sum(n_bytes) as bigint) AS bytes,
              |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
              |FROM x GROUP BY format, shard_id""".stripMargin),
      (s, d) => mediaShards(mediaDF(s, d))),

    // m07: shard INTEGRITY manifest — the checksum ledger a 100 TB media
    // lake persists next to each shard so a re-reader can detect
    // corrupt, missing, or reordered items without re-decoding
    // everything: per (format, shard) the item count, byte total, and an
    // ORDER-INDEPENDENT content checksum (the exact integer sum of the
    // per-item decode checksums — commutative, so multi-task re-reads
    // verify without any ordering constraint). Same decode plumbing as
    // m02, same greedy shard cut as m05.
    QueryDef(
      "m07_shard_integrity",
      Some(s"""WITH m AS (SELECT doc_id,
              |    (['png', 'jpeg', 'wav', 'mp4'])[cast(doc_id % 4 as int) + 1]
              |      AS format,
              |    cast(strlen(text) as bigint) AS n_bytes,
              |    ${TextExprs.duckByteHash("text")} AS checksum
              |  FROM documents),
              |x AS (SELECT *,
              |    cast((sum(n_bytes) OVER (PARTITION BY format ORDER BY doc_id
              |      ROWS UNBOUNDED PRECEDING) - n_bytes) // $ShardBytes as int)
              |      AS shard_id
              |  FROM m)
              |SELECT format, shard_id, count(*) AS n_items,
              |  cast(sum(n_bytes) as bigint) AS bytes,
              |  cast(sum(checksum) as bigint) AS content_sum
              |FROM x GROUP BY format, shard_id""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("format")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        decodeFeatures(mediaDF(s, d))
          .withColumn("cum_bytes", sum(col("n_bytes")).over(w))
          .withColumn("shard_id",
            expr(s"cast((cum_bytes - n_bytes) div $ShardBytes as int)"))
          .groupBy(col("format"), col("shard_id"))
          .agg(count(lit(1)).as("n_items"), sum(col("n_bytes")).as("bytes"),
            sum(col("checksum")).as("content_sum"))
      }),

    // m06: perceptual-hash near-dup over DECODED media — the dedup
    // family extended to the binary column. A 16-bit pHash derives from
    // the codec's content features (here: the stub checksum; a real
    // codec supplies DCT-based bits through the same SPI), pairs
    // generate via the pigeonhole 8-bit-half bucket join (d05's shape
    // — hamming <= 1 guarantees an intact half; never all-pairs), and
    // exact hamming filters the candidates. Oracle replays the stub
    // arithmetic and the same pigeonhole algebra in SQL.
    QueryDef(
      "m06_perceptual_neardup",
      Some(s"""WITH c AS (SELECT doc_id,
              |    (${TextExprs.duckByteHash("text")}) % 65536 AS ph
              |  FROM documents),
              |h AS (SELECT doc_id, ph, ph // 256 AS hi, ph % 256 AS lo FROM c),
              |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    a.ph AS pa, b.ph AS pb
              |  FROM h a JOIN h b
              |    ON a.doc_id < b.doc_id AND (a.hi = b.hi OR a.lo = b.lo))
              |SELECT doc_a, doc_b, cast(bit_count(xor(pa, pb)) as int) AS hamming
              |FROM cand WHERE bit_count(xor(pa, pb)) <= 1""".stripMargin),
      (s, d) => perceptualNearDups(mediaDF(s, d))),

    // m08: modality mix report — the media lake's dataset card: per
    // format, item/byte/frame totals, byte share of the whole corpus in
    // fixed-point, and the mean item size. What a multimodal training
    // mix is budgeted against (video dominates bytes long before it
    // dominates items — exactly the number this surfaces). One keyed
    // aggregate over the decoded features plus a broadcast 1-row total;
    // all ratios are exact integer fixed-point.
    QueryDef(
      "m08_modality_mix",
      Some(s"""WITH c AS (SELECT doc_id,
              |    (['png', 'jpeg', 'wav', 'mp4'])[cast(doc_id % 4 as int) + 1]
              |      AS format,
              |    cast(strlen(text) as bigint) AS n_bytes,
              |    ${TextExprs.duckByteHash("text")} AS checksum
              |  FROM documents),
              |f AS (SELECT format, n_bytes,
              |    CASE WHEN format = 'mp4' THEN 1 + n_bytes // 100 ELSE 1 END
              |      AS n_frames FROM c),
              |g AS (SELECT format, count(*) AS n_items,
              |    cast(sum(n_bytes) as bigint) AS total_bytes,
              |    cast(sum(n_frames) as bigint) AS frames_total FROM f
              |  GROUP BY format),
              |t AS (SELECT cast(sum(total_bytes) as bigint) AS tb FROM g)
              |SELECT format, n_items, total_bytes,
              |  cast(total_bytes * 1000000 // tb as bigint) AS byte_share_fx,
              |  cast(total_bytes // n_items as bigint) AS mean_item_bytes,
              |  frames_total
              |FROM g, t""".stripMargin),
      (s, d) => {
        val g = decodeFeatures(mediaDF(s, d))
          .groupBy(col("format"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("n_bytes")).as("total_bytes"),
            sum(col("n_frames").cast("long")).as("frames_total"))
        val t = g.agg(sum(col("total_bytes")).as("tb"))
        g.crossJoin(broadcast(t))
          .select(col("format"), col("n_items"), col("total_bytes"),
            expr("cast(total_bytes * 1000000 div tb as bigint)")
              .as("byte_share_fx"),
            expr("cast(total_bytes div n_items as bigint)")
              .as("mean_item_bytes"),
            col("frames_total"))
      }),

    // m09: subtitle/caption alignment — an as-of join INSIDE the
    // multimodal family: m03's sampled video frames (25 fps → frame
    // time = idx·40 ms) land on the latest caption segment that started
    // at or before them. Caption segments come from the same doc's
    // transcript: per-word durations (200 ms + 10 ms/char — the stub's
    // deterministic stand-in for a forced aligner), 8-word segments,
    // segment start = prefix sum of prior word durations. The reported
    // lag is the within-segment offset a subtitle renderer needs.
    // Scale: words/segments are a narrow explode + ONE doc-keyed window
    // (prefix sums), the frame↔segment match is a co-keyed join on
    // doc_id with an order-free max(struct) as-of pick (j01's
    // discipline) — segments per doc are bounded, so the fan-in is too.
    QueryDef(
      "m09_caption_align",
      Some("""WITH f0 AS (SELECT doc_id,
             |    1 + cast(strlen(text) // 100 as int) AS n_frames
             |  FROM documents WHERE doc_id % 4 = 3),
             |fr AS (SELECT doc_id,
             |    cast(unnest(range(0, n_frames, 4)) as int) AS frame_idx
             |  FROM f0),
             |wz AS (SELECT doc_id, unnest(list_transform(
             |      range(1, len(w) + 1), i -> {'i0': i - 1, 'word': w[i]}),
             |      recursive := true)
             |  FROM (SELECT doc_id, string_split(text, ' ') AS w
             |    FROM documents WHERE doc_id % 4 = 3) z),
             |wd AS (SELECT doc_id, i0,
             |    cast(200 + 10 * strlen(word) as bigint) AS dur FROM wz),
             |wc AS (SELECT doc_id, i0,
             |    coalesce(sum(dur) OVER (PARTITION BY doc_id ORDER BY i0
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS start,
             |    cast(i0 // 8 as int) AS seg_idx FROM wd),
             |sg AS (SELECT doc_id, seg_idx, min(start) AS seg_start_ms
             |  FROM wc GROUP BY 1, 2),
             |fm AS (SELECT doc_id, frame_idx,
             |    cast(frame_idx * 40 as bigint) AS frame_ms FROM fr),
             |pick AS (SELECT fm.doc_id, fm.frame_idx, fm.frame_ms,
             |    sg.seg_idx, sg.seg_start_ms,
             |    row_number() OVER (PARTITION BY fm.doc_id, fm.frame_idx
             |      ORDER BY sg.seg_start_ms DESC) AS rn
             |  FROM fm JOIN sg ON fm.doc_id = sg.doc_id
             |  WHERE sg.seg_start_ms <= fm.frame_ms)
             |SELECT doc_id, frame_idx, seg_idx,
             |  cast(seg_start_ms as bigint) AS seg_start_ms,
             |  cast(frame_ms - seg_start_ms as bigint) AS lag_ms
             |FROM pick WHERE rn = 1""".stripMargin),
      (s, d) => captionAlign(frameSample(mediaDF(s, d)),
        Catalog.t(s, d, "documents").filter(col("doc_id") % 4 === 3))),

    // m10: keyframe selection — per video, keep only sampled frames
    // whose (stub) content hash jumps by >= the cut threshold from the
    // previous sampled frame, plus the first frame; the shot-boundary
    // pass that decides which frames a vision encoder actually sees
    // (4-25× decode reduction downstream). The per-frame hash is the
    // codec checksum folded with the frame index — the deterministic
    // stand-in for a real perceptual frame hash, swapped at the same
    // MediaCodec seam as m02. One doc-keyed join (frames ↔ checksum)
    // and one doc-keyed window; both bounded by frames/doc.
    QueryDef(
      "m10_keyframes",
      Some(s"""WITH c AS (SELECT doc_id,
              |    cast(strlen(text) as bigint) AS n_bytes,
              |    ${graft.llm.TextExprs.duckByteHash("text")} AS checksum
              |  FROM documents WHERE doc_id % 4 = 3),
              |f AS (SELECT doc_id, checksum,
              |    1 + cast(n_bytes // 100 as int) AS n_frames FROM c),
              |fr AS (SELECT doc_id, checksum,
              |    cast(unnest(range(0, n_frames, 4)) as int) AS frame_idx
              |  FROM f),
              |h AS (SELECT doc_id, frame_idx,
              |    (checksum * (frame_idx + 1)) % 1000003 AS fhash FROM fr),
              |k AS (SELECT *, lag(fhash) OVER (PARTITION BY doc_id
              |    ORDER BY frame_idx) AS prev FROM h),
              |kk AS (SELECT doc_id, frame_idx, fhash FROM k
              |  WHERE prev IS NULL OR abs(fhash - prev) >= $KeyframeDelta)
              |SELECT doc_id, frame_idx, cast(fhash as bigint) AS fhash,
              |  cast(row_number() OVER (PARTITION BY doc_id
              |    ORDER BY frame_idx) as int) AS key_rank
              |FROM kk""".stripMargin),
      (s, d) => keyframes(frameSample(mediaDF(s, d)),
        decodeFeatures(mediaDF(s, d)))),

    // m11: MEDIA DEDUP LEDGER — exact byte-level dedup by payload
    // checksum, reported per format. The FIRST pass of any 100 TB
    // media-curation run: identical bytes (re-crawled images, mirrored
    // videos) collapse on one hash long before perceptual passes (m06)
    // spend compute on near-dups. Spark shape: checksum inside the
    // scan (the codegen'd graft_bytehash32 byte fold — the payload is
    // the UTF-8 encoding of text, so the text fold IS the payload
    // fold, m02's documented equivalence), then TWO map-side-
    // combinable aggregates ((format, checksum) → format) — payloads
    // never shuffle, and no countDistinct expand. Complements m07
    // (shard integrity: checksums verify transport) — here checksums
    // drive IDENTITY.
    QueryDef(
      "m11_media_dedup",
      Some(s"""WITH c AS (SELECT
              |    (['png', 'jpeg', 'wav', 'mp4'])[cast(doc_id % 4 as int) + 1]
              |      AS format,
              |    ${TextExprs.duckByteHash("text")} AS checksum
              |  FROM documents),
              |g AS (SELECT format, checksum, count(*) AS n
              |  FROM c GROUP BY 1, 2)
              |SELECT format, cast(sum(n) as bigint) AS n_items,
              |  cast(count(*) as bigint) AS n_distinct,
              |  cast(sum(n) - count(*) as bigint) AS n_dup_items,
              |  cast((sum(n) - count(*)) * 1000000 // sum(n) as bigint)
              |    AS dup_ppm
              |FROM g GROUP BY format""".stripMargin),
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Catalog.t(s, d, "documents")
          .select(expr("element_at(array('png', 'jpeg', 'wav', 'mp4'), " +
            "cast(doc_id % 4 as int) + 1)").as("format"),
            expr("graft_bytehash32(text)").as("checksum"))
          .groupBy(col("format"), col("checksum"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("format"))
          .agg(sum(col("n")).as("n_items"),
            count(lit(1)).as("n_distinct"),
            expr("sum(n) - count(*)").as("n_dup_items"),
            expr("(sum(n) - count(*)) * 1000000 div sum(n)").as("dup_ppm"))
      }),

    // m12: AUDIO VOICE-ACTIVITY SEGMENTATION (stub decode) — the
    // energy-threshold VAD every speech-data pipeline runs before
    // transcription: frame the signal, keep frames above an energy
    // floor, and report contiguous active SEGMENTS (count + longest
    // run) per clip, so downstream ASR decodes seconds of speech, not
    // hours of silence. Decode is stubbed at the same seam as
    // m02/m10: "samples" are the text's character codes (the corpus
    // carries no real PCM — the real codec swaps in per MediaCodec),
    // 32 samples per frame, energy = Σ(code−96)². Spark shape: the
    // wav quarter explodes to CHAR grain (narrow int rows — the
    // honest distributed shape for per-sample math), two map-side-
    // combinable keyed aggregates, one doc-keyed window for the
    // gaps-and-islands run structure (q54 idiom: frame_idx −
    // row_number, no self-join). Docs with zero active frames stay
    // in the report with zeros (the t46 zero-hit lesson).
    QueryDef(
      "m12_audio_vad",
      Some(s"""WITH a AS (SELECT doc_id, text FROM documents
              |    WHERE doc_id % 4 = 2),
              |ch AS (SELECT doc_id,
              |    cast((i - 1) // 32 as bigint) AS frame_idx,
              |    ascii(substr(text, cast(i as int), 1)) - 96 AS v
              |  FROM a, unnest(range(1, length(text) + 1)) AS t(i)),
              |en AS (SELECT doc_id, frame_idx,
              |    sum(cast(v as bigint) * v) AS energy
              |  FROM ch GROUP BY 1, 2),
              |act AS (SELECT doc_id, frame_idx FROM en
              |  WHERE energy >= $VadThreshold),
              |isl AS (SELECT doc_id, frame_idx,
              |    frame_idx - row_number() OVER (PARTITION BY doc_id
              |      ORDER BY frame_idx) AS grp
              |  FROM act),
              |seg AS (SELECT doc_id, grp, count(*) AS run
              |  FROM isl GROUP BY 1, 2),
              |per AS (SELECT doc_id, count(*) AS n_segments,
              |    max(run) AS longest_run FROM seg GROUP BY 1),
              |tot AS (SELECT doc_id, count(*) AS n_frames,
              |    sum(CASE WHEN energy >= $VadThreshold THEN 1 ELSE 0 END)
              |      AS n_active
              |  FROM en GROUP BY 1)
              |SELECT a.doc_id,
              |  cast(coalesce(n_frames, 0) as bigint) AS n_frames,
              |  cast(coalesce(n_active, 0) as bigint) AS n_active,
              |  cast(coalesce(n_segments, 0) as bigint) AS n_segments,
              |  cast(coalesce(longest_run, 0) as bigint) AS longest_run
              |FROM a LEFT JOIN tot USING (doc_id)
              |  LEFT JOIN per USING (doc_id)""".stripMargin),
      (s, d) => {
        val a = Catalog.t(s, d, "documents")
          .filter(expr("doc_id % 4 = 2"))
          .select(col("doc_id"), col("text"))
        // Spark's sequence(1, 0) counts DOWN — gate the explode on
        // non-empty text (empty clips stay in the report via the
        // left join below, with zero frames)
        val ch = a.filter(expr("length(text) >= 1"))
          .select(col("doc_id"), col("text"),
            explode(expr("sequence(1, length(text))")).as("i"))
          .select(col("doc_id"),
            expr("cast((i - 1) div 32 as bigint)").as("frame_idx"),
            expr("ascii(substring(text, cast(i as int), 1)) - 96").as("v"))
        vadReport(a.select(col("doc_id")), ch, VadThreshold)
      })
  )

  /** The VAD report shared by m12's stub-decode gate query and the
    * real-codec [[vadSegments]] path: per-frame energy (Σv², widened
    * to bigint before the square so astral-plane char codes and
    * full-scale 16-bit PCM can't overflow int32), active frames above
    * the floor, contiguous runs via gaps-and-islands arithmetic
    * (frame_idx − row_number, the q54 idiom — no self-join), and a
    * per-clip rollup where zero-active clips keep their row. `docs`
    * is the full clip population (doc_id), `samples` is (doc_id,
    * frame_idx, v) at sample grain.
    */
  private[graft] def vadReport(
      docs: DataFrame, samples: DataFrame, threshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val en = samples.groupBy(col("doc_id"), col("frame_idx"))
      .agg(sum(expr("cast(v as bigint) * v")).as("energy"))
    val act = en.filter(col("energy") >= threshold)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val seg = act
      .withColumn("grp", col("frame_idx") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("run"))
    val per = seg.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        max(col("run")).as("longest_run"))
    val tot = en.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("energy") >= threshold, 1L).otherwise(0L))
          .as("n_active"))
    docs
      .join(tot, Seq("doc_id"), "left")
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_frames"), lit(0L)).cast("long").as("n_frames"),
        coalesce(col("n_active"), lit(0L)).cast("long").as("n_active"),
        coalesce(col("n_segments"), lit(0L)).cast("long")
          .as("n_segments"),
        coalesce(col("longest_run"), lit(0L)).cast("long")
          .as("longest_run"))
  }

  /** SPI seam for SAMPLE-grain audio decode — the companion of
    * [[MediaCodec]] (which yields per-clip features): `pcm` returns
    * the clip's mono PCM samples for per-sample DSP such as VAD.
    * Executor-side inside mapPartitions; must be deterministic and
    * must not retain the payload beyond the call.
    */
  trait PcmCodec extends Serializable {
    def pcm(r: MediaRow): Array[Int]
  }

  /** A REAL audio codec: RIFF/WAVE → mono 16-bit PCM via the pure-JVM
    * `javax.sound.sampled` stack (public JDK API, zero dependencies —
    * the one decode path this container CAN ship for real). Non-PCM
    * encodings (a-law/µ-law/float) are converted to signed 16-bit
    * through the platform conversion chain; multi-channel audio takes
    * channel 0 (deterministic, matches common VAD practice of running
    * on a single channel). Use with [[vadSegments]]; the m12 gate
    * query keeps [[StubMediaCodec]] so the DuckDB oracle can replay
    * the arithmetic — this object is the production swap-in.
    */
  object WavPcmCodec extends PcmCodec {
    def pcm(r: MediaRow): Array[Int] = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(
          new java.io.ByteArrayInputStream(r.payload)))
      try {
        val src = in.getFormat
        val want = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, false)
        val pcmIn =
          if (src.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            src.getSampleSizeInBits == 16) in
          else AudioSystem.getAudioInputStream(want, in)
        try {
          val fmt = pcmIn.getFormat
          val bytesPerFrame = fmt.getFrameSize
          val big = fmt.isBigEndian
          val bytes = pcmIn.readAllBytes()
          val n = bytes.length / bytesPerFrame
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            val off = i * bytesPerFrame // channel 0 leads each frame
            val (lo, hi) = if (big) (bytes(off + 1), bytes(off))
            else (bytes(off), bytes(off + 1))
            out(i) = ((hi << 8) | (lo & 0xff)).toShort.toInt
            i += 1
          }
          out
        } finally pcmIn.close() // closing the converter cascades to `in`
      } finally in.close() // no-op when already closed via pcmIn
    }
  }

  /** Public API: energy-threshold VAD segmentation over REAL audio
    * payloads — m12's exact report (frames, active frames, contiguous
    * segments, longest run) with the decode stage swapped from the
    * oracle stub to a [[PcmCodec]]. Decode runs executor-side in
    * batched mapPartitions (narrow; payload bytes never shuffle), the
    * exploded sample rows are the same honest distributed shape as
    * the gate query, and the segment machinery is [[vadReport]]
    * verbatim. `frameSize` samples per frame; `threshold` compares
    * against Σv² per frame (16-bit full scale ≈ 1e9/frame·32 — size
    * it to the recording level).
    */
  def vadSegments(media: DataFrame, codec: PcmCodec,
      frameSize: Int = 32, threshold: Long = VadThreshold,
      batchSize: Int = 64): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    val samples = media.as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.flatMap { r =>
        val xs = codec.pcm(r)
        xs.iterator.zipWithIndex.map { case (v, i) =>
          (r.doc_id, (i / frameSize).toLong, v)
        }
      }))
      .toDF("doc_id", "frame_idx", "v")
    vadReport(media.select(col("doc_id")), samples, threshold)
  }

  /** Hash-jump threshold below which a sampled frame is considered the
    * same shot as its predecessor (m10). */
  private val KeyframeDelta = 500000L

  /** m12's frame-energy floor. With the stubbed char-code decode a
    * 32-sample frame's energy is ≈4096·spaces + ~240·letters, so
    * 24576 splits frames at roughly five spaces — a genuine mix of
    * active/inactive frames on the word-soup corpus (not all-on or
    * all-off, which would make the segment structure vacuous).
    */
  private val VadThreshold = 24576L

  /** Public API: keyframe selection over sampled frames (m10). `frames`
    * is m03's `(doc_id, frame_idx)`; `features` supplies the per-doc
    * codec checksum the stub frame hash folds with. See the m10
    * QueryDef comment.
    */
  def keyframes(frames: DataFrame, features: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames
      .join(features.select(col("doc_id"), col("checksum")), Seq("doc_id"))
      .withColumn("fhash", expr("(checksum * (frame_idx + 1)) % 1000003"))
      .withColumn("prev", lag(col("fhash"), 1).over(w))
      .filter(col("prev").isNull ||
        abs(col("fhash") - col("prev")) >= KeyframeDelta)
      .withColumn("key_rank", row_number().over(w).cast("int"))
      .select(col("doc_id"), col("frame_idx"), col("fhash"), col("key_rank"))
  }

  /** Public API: align sampled frames `(doc_id, frame_idx)` to caption
    * segments derived from the docs' transcripts (m09). See the m09
    * QueryDef comment for semantics; the as-of pick is an order-free
    * `max(struct(seg_start, seg_idx))` aggregation, never a per-row
    * subquery.
    */
  def captionAlign(frames: DataFrame, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"), posexplode(col("w")).as(Seq("i0", "word")))
      .withColumn("dur", expr("cast(200 + 10 * length(word) as bigint)"))
    val wp = Window.partitionBy(col("doc_id")).orderBy(col("i0"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val segs = words
      .withColumn("start", coalesce(sum(col("dur")).over(wp), lit(0L)))
      .withColumn("seg_idx", expr("cast(i0 div 8 as int)"))
      .groupBy(col("doc_id"), col("seg_idx"))
      .agg(min(col("start")).as("seg_start_ms"))
    frames
      .withColumn("frame_ms", (col("frame_idx") * 40).cast("long"))
      .join(segs, Seq("doc_id"))
      .filter(col("seg_start_ms") <= col("frame_ms"))
      .groupBy(col("doc_id"), col("frame_idx"), col("frame_ms"))
      .agg(max(struct(col("seg_start_ms"), col("seg_idx"))).as("s"))
      .select(col("doc_id"), col("frame_idx"),
        col("s.seg_idx").as("seg_idx"),
        col("s.seg_start_ms").as("seg_start_ms"),
        (col("frame_ms") - col("s.seg_start_ms")).as("lag_ms"))
  }

  /** Public API: perceptual-hash near-duplicate pairs over decoded
    * media (m06). The 16-bit pHash comes from the codec's features;
    * candidates come from a keyed self-join on the two 8-bit halves
    * (pigeonhole: hamming <= 1 implies one half equal), exact hamming
    * only on candidates. One shuffle on the bucket keys — the media
    * twin of the d05 SimHash chunk join.
    */
  def perceptualNearDups(media: DataFrame, codec: MediaCodec = StubMediaCodec,
      maxHamming: Int = 1, batchSize: Int = 64): DataFrame = {
    require(maxHamming <= 1,
      s"the 2-half pigeonhole scheme detects hamming <= 1; got $maxHamming" +
        " (widen to 4 x 4-bit bands for higher radii)")
    val s = media.sparkSession
    import s.implicits._
    val ph = media.as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        val f = codec.decode(r)
        (f.doc_id, f.checksum % 65536L)
      })).toDF("doc_id", "ph")
    val buckets = ph.select(col("doc_id"), col("ph"), explode(expr(
        "array(struct(0 as bi, ph div 256 as bv), struct(1 as bi, ph % 256 as bv))"))
        .as("b"))
      .select(col("doc_id"), col("ph"), col("b.bi"), col("b.bv"))
    buckets.select(col("doc_id").as("doc_a"), col("ph").as("pa"),
        col("bi"), col("bv"))
      .join(buckets.select(col("doc_id").as("doc_b"), col("ph").as("pb"),
        col("bi"), col("bv")), Seq("bi", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "pa", "pb").distinct()
      .select(col("doc_a"), col("doc_b"),
        expr("cast(bit_count(pa ^ pb) as int)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Shard cap for m05 — small enough that the gate corpus produces
    * multiple shards per modality.
    */
  private val ShardBytes = 8000L

  /** Public API: greedy byte-budget shard packing per modality. A blob
    * goes to shard `floor(bytes_before_it / cap)` within its modality
    * (items never split): deterministic, one window per modality key,
    * and the manifest aggregation is map-side partial.
    */
  def mediaShards(media: DataFrame, cap: Long = ShardBytes): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("format")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    media
      .select(col("doc_id"), col("format"),
        expr("cast(octet_length(payload) as bigint)").as("n_bytes"))
      .withColumn("cum_bytes", sum(col("n_bytes")).over(w))
      .withColumn("shard_id",
        expr(s"cast((cum_bytes - n_bytes) div $cap as int)"))
      .groupBy(col("format"), col("shard_id"))
      .agg(count(lit(1)).as("n_items"), sum(col("n_bytes")).as("bytes"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }
}

package graft.sources

import graft.{Catalog, QueryDef}
import graft.llm.TextExprs.duckWordHash

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest-format surface: the file formats a training-data pipeline
  * actually receives corpora in, gated end-to-end through the DuckDB
  * oracle by ROUNDTRIPPING the driver's parquet tables through each
  * format and proving the re-read relation aggregates identically.
  *
  * 100 TB stance, per format:
  *  - JSONL (i01): the lingua franca of web-scale text corpora. Schema
  *    is always EXPLICIT — `spark.read.schema(s).json(dir)` — because
  *    schema inference is a full extra pass over the corpus. Uncompressed
  *    (or zstd/bzip2) JSONL is line-splittable, so parallelism is
  *    byte-range driven like parquet; gzip parts are NOT splittable and
  *    cap parallelism at one task per file — acceptable only when the
  *    corpus is already sharded into many files of bounded size.
  *  - CSV (i02): header + quoted fields in the default `multiLine=false`
  *    mode, which keeps the format line-splittable. Fields containing
  *    the delimiter are quote-escaped by the writer and must survive the
  *    roundtrip byte-exactly (gated via a constructed delimiter-bearing
  *    column). Embedded newlines would force `multiLine=true` — one task
  *    per file — so the contract here is the splittable subset.
  *  - Hive-partitioned parquet lake (i03): `partitionBy(col)` layout is
  *    THE 100 TB pruning primitive — a reader filtering on the partition
  *    column never lists, opens, or scans non-matching directories
  *    (PartitionFilters in the scan node, asserted by IngestSpec). Low
  *    cardinality partition keys only (lang: 5 values); high-cardinality
  *    keys belong in sorted/z-ordered file layout (p07) instead.
  *
  * All three write into a temp dir with the SAME parallelism as the
  * source relation (no coalesce(1)): a 100 TB export must stream from
  * every task, and the re-read proves multi-part output is handled.
  */
object IngestQueries {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Per-lang fidelity aggregate used by i01/i02: row count, exact char
    * total, and the polynomial text hash summed per group — any
    * encode/escape defect in the roundtrip shifts `text_hash`.
    */
  private val fidelityOracle =
    s"""SELECT lang, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(sum(${duckWordHash("text")}) AS BIGINT) AS text_hash
       |FROM documents GROUP BY lang""".stripMargin

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "i01_jsonl_roundtrip",
      Some(fidelityOracle),
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val out = tmp("graft-i01")
        Catalog.t(s, d, "documents").write.mode("overwrite").json(out)
        s.read.schema(docSchema).json(out)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("sum_chars"),
            sum(expr("graft_polyhash32(text)")).as("text_hash"))
      }),

    QueryDef(
      "i02_csv_roundtrip",
      Some(s"""SELECT source, count(*) AS n_docs,
              |  CAST(sum(${duckWordHash("text")}) AS BIGINT) AS text_hash,
              |  CAST(sum(${duckWordHash("(lang || ', ' || source)")}) AS BIGINT) AS tag_hash
              |FROM documents GROUP BY source""".stripMargin),
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val out = tmp("graft-i02")
        // `tag` embeds the delimiter, so the writer MUST quote it and the
        // reader MUST unquote it for tag_hash to survive.
        // whitespace preservation is opt-in in Spark's univocity CSV
        // writer/parser (both trim trailing whitespace by default) —
        // the engine's CSV contract is byte-preserving fields
        Catalog.t(s, d, "documents")
          .withColumn("tag", concat_ws(", ", col("lang"), col("source")))
          .write.mode("overwrite").option("header", "true")
          .option("ignoreLeadingWhiteSpace", "false")
          .option("ignoreTrailingWhiteSpace", "false").csv(out)
        val back = s.read
          .schema(docSchema.add(StructField("tag", StringType)))
          .option("header", "true")
          .option("ignoreLeadingWhiteSpace", "false")
          .option("ignoreTrailingWhiteSpace", "false").csv(out)
        back.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(expr("graft_polyhash32(text)")).as("text_hash"),
            sum(expr("graft_polyhash32(tag)")).as("tag_hash"))
      }),

    QueryDef(
      "i04_orc_roundtrip",
      Some(fidelityOracle),
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val out = tmp("graft-i04")
        // ORC: the second columnar lake format (predicate pushdown,
        // column pruning, splittable stripes — same scan properties the
        // parquet paths rely on)
        Catalog.t(s, d, "documents").write.mode("overwrite").orc(out)
        s.read.orc(out)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("sum_chars"),
            sum(expr("graft_polyhash32(text)")).as("text_hash"))
      }),

    // Raw media files on disk -> binary column: `binaryFile` is the
    // ingest path for image/audio corpora that arrive as loose files.
    // One payload file per sampled doc (UTF-8 text bytes standing in for
    // media, same stub contract as the m-series); the re-read joins
    // path-derived ids back to metadata and folds the payload bytes.
    // 100 TB stance: loose small files are a driver-side listing + task
    // scheduling tax — this op is the INGEST step whose output should
    // immediately be compacted into m05-style byte-capped shards; the
    // sample cap here (1 in 10) keeps the gate honest about that.
    QueryDef(
      "i05_binary_ingest",
      Some("""WITH s AS (SELECT * FROM documents WHERE doc_id % 10 = 0)
             |SELECT lang, count(*) AS n_files,
             |  CAST(sum(length(text)) AS BIGINT) AS sum_chars,
             |  CAST(sum(strlen(text)) AS BIGINT) AS sum_bytes
             |FROM s GROUP BY lang""".stripMargin),
      (s, d) => {
        val out = tmp("graft-i05")
        val sample = Catalog.t(s, d, "documents")
          .filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("lang"), col("text"))
        sample.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .collect() // bounded: 1-in-10 sample, fixture-construction step
          .foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(out, s"doc_${r.getLong(0)}.bin"),
              r.getAs[Array[Byte]]("payload"))
          }
        val files = s.read.format("binaryFile").load(out)
          .select(
            regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
              .cast("long").as("doc_id"),
            col("content"))
        // sum_chars from the metadata side (codepoints), sum_bytes from
        // the re-read payload (UTF-8 octets) — non-ASCII text keeps the
        // two distinct, so a lossy binary roundtrip cannot hash-match
        files.join(sample.select("doc_id", "lang", "text"), Seq("doc_id"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_files"),
            sum(length(col("text"))).as("sum_chars"),
            sum(expr("octet_length(content)")).as("sum_bytes"))
      }),

    QueryDef(
      "i03_partitioned_lake",
      Some("""SELECT lang, source, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents WHERE lang IN ('en', 'de')
             |GROUP BY lang, source""".stripMargin),
      (s, d) => {
        val out = tmp("graft-i03")
        Catalog.t(s, d, "documents")
          .write.mode("overwrite").partitionBy("lang").parquet(out)
        // Pruned read: only the lang=en / lang=de directories are opened
        // (PartitionFilters; IngestSpec asserts the pruned scan).
        s.read.parquet(out)
          .filter(col("lang").isin("en", "de"))
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      }))
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11 laws: the cross-engine asymmetries named by the round-10
  * advisory, each pinned by value so the class cannot ship again.
  *  - q71/st26 bucket math must FLOOR (DuckDB `//`), not truncate
  *    (Spark `div`): a negative cents value is the discriminating case.
  *  - p26's content hash must fold UTF-8 BYTES, not UTF-16 chars:
  *    supplementary-plane text is the discriminating case.
  */
class RoundElevenOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import scala.jdk.CollectionConverters._

  /** Driver-layout table: one parquet FILE named `<table>.parquet`
    * (the streaming readers glob on that exact name).
    */
  private def writeSingleFile(df: org.apache.spark.sql.DataFrame,
      dir: String, table: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-r11-part")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(fail(s"no part file written for $table"))
    java.nio.file.Files.move(part,
      java.nio.file.Paths.get(dir, s"$table.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("q71 buckets negative values by FLOOR division, matching the " +
    "oracle's // semantics") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-q71-neg")
    val baseUs = 1704067200000000L
    // cents −150, −50, 50, 150 → floor buckets −2, −1, 0, 1.
    // Truncating `div` would put −150 in −1 and −50 in 0 and report
    // p50 = 0; floor reports p50 = −1 (ceil-rank 2 of n = 4).
    val ev = Seq((1L, -1.5), (2L, -0.5), (3L, 0.5), (4L, 1.5))
      .map { case (i, v) => (i, baseUs + i * 1000000L, i % 2, "click", v, "{}") }
      .toDF("event_id", "tsu", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(tsu)")).drop("tsu")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    writeSingleFile(ev, dir, "events")
    val r = SparkEntry.queries("q71_sketch_quantiles")(s, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_events") == 4L)
    assert(r.head.getAs[Long]("p50_bucket") == -1L,
      "negative cents must floor to the lower bucket")
    assert(r.head.getAs[Long]("p95_bucket") == 1L)
    assert(r.head.getAs[Long]("p99_bucket") == 1L)
    // kappa equivalence holds on the hostile-sign corpus too: the
    // streaming sketch floors identically
    val st = SparkEntry.queries("st26_stream_quantiles")(s, dir).collect()
    assert(st.map(_.toSeq).toSeq == r.map(_.toSeq).toSeq)
  }

  test("graft_bytehash32 folds UTF-8 bytes — astral-plane text hashes " +
    "byte-exactly, where the char fold diverges") {
    val s = spark
    graft.functions.GraftFunctions.register(s)
    import org.apache.spark.sql.functions._
    // U+1F680 ROCKET: UTF-8 bytes F0 9F 9A 80 → hand-computed fold
    // ((240·31+159)·31+154)·31+128 = 7307541; UTF-16 is the surrogate
    // pair D83D DE80 → char fold 55357·31+56960 = 1773027. p26 hashes
    // whole documents, so it must use the byte fold the oracle can
    // mirror from hex(encode(text)).
    val row = s.range(1).select(
      expr("graft_bytehash32('🚀')").as("bh"),
      expr("graft_polyhash32('🚀')").as("ch")).head
    assert(row.getAs[Long]("bh") == 7307541L)
    assert(row.getAs[Long]("ch") == 1773027L)
    // interpreted (non-codegen) path agrees with the kernel
    assert(graft.functions.ByteHash32.hash(
      "🚀".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      == 7307541L)
    // ASCII text: byte fold == char fold (the documented equivalence)
    val ascii = s.range(1).select(
      expr("graft_bytehash32('hello world')").as("bh"),
      expr("graft_polyhash32('hello world')").as("ch")).head
    assert(ascii.getAs[Long]("bh") == ascii.getAs[Long]("ch"))
  }

  test("p26 diff classes survive astral-plane text (the round-10 " +
    "advisory's discriminating corpus)") {
    val s = spark; import s.implicits._
    val dir = TempDirs.create("graft-p26-astral")
    // doc 1 unchanged with emoji text; doc 2 (2 % 13 == 2) revised —
    // the unchanged doc's old/new hashes must AGREE even though the
    // text is pure supplementary-plane content
    Seq((1L, "🚀🎉 rocket party"),
      (2L, "🚀 launch notes"))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("p26_corpus_version_diff")(s, dir)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        x.getAs[String]("status")).toMap
    assert(r == Map(1L -> "unchanged", 2L -> "changed"))
  }
}

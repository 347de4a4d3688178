package graft

import graft.core.codec.Codecs.IntCodec
import graft.core.meta._
import graft.core.scan.RocksDbCheckpoints
import graft.state.{KeyedStateRow, Savepoints, StateRowEncoder}

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** S4: incremental (RocksDB-native) checkpoint reads, mirroring
  * RocksDBCheckpointReadingTest.java:47-68 — state lives in a real
  * RocksDB instance, one column family per state.
  */
class RocksDbCheckpointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def buildSavepoint(): SavepointMeta = {
    val dir = java.nio.file.Files.createTempDirectory("graft-rocks-sp").toString
    def row(name: String, k: Int, v: Int): KeyedStateRow =
      StateRowEncoder.valueRow(name, k, v, IntCodec, IntCodec, 128)
    val rows = Seq(
      row("Count", 1, 2), row("Count", 2, 1),
      row("Other", 7, 70), row("Other", 8, 80))
    RocksDbCheckpoints.createCheckpoint(s"$dir/rocks-0",
      rows.map(r => (r.stateName, r.keyAndNamespaceBytes, r.valueBytes)))
    val op = OperatorStateMeta("rocky", Identifiers.operatorId("rocky"),
      parallelism = 1, maxParallelism = 128, keyCodecId = Some("int"),
      states = Seq(
        StateMeta("Count", StateKind.Value, "int"),
        StateMeta("Other", StateKind.Value, "int")),
      compression = false,
      keyedFiles = Seq(KeyedFileHandle(0, "rocks-0", 0, 127, Seq.empty,
        KeyedFileHandle.RocksDbKind)))
    MetadataIO.write(dir, SavepointMeta(1L, dir, Seq(op)))
    Savepoints.load(dir)
  }

  test("read value-state KV pairs from a RocksDB checkpoint " +
    "(RocksDBCheckpointReadingTest.java:59-68)") {
    val meta = buildSavepoint()
    val r = Savepoints.reader(spark, meta, "rocky")
    assert(r.readValueStates[Int, Int]("Count").collect().toMap == Map(1 -> 2, 2 -> 1))
    assert(r.readValueStates[Int, Int]("Other").collect().toMap == Map(7 -> 70, 8 -> 80))
    assert(r.allKeyedStateRows.count() == 4)
  }

  test("column-family pushdown opens only matching states (S6 incremental path)") {
    val meta = buildSavepoint()
    // reader-level filter
    val rB = Savepoints.reader(spark, meta, "rocky", states = Set("Other"))
    assert(rB.allKeyedStateRows.collect().map(_.getString(0)).toSet == Set("Other"))
    // catalyst pushdown
    val df = Savepoints.reader(spark, meta, "rocky").allKeyedStateRows
      .filter(col("stateName") === "Count")
    assert(df.count() == 2)
    // direct CF-level check: keep=Some(Set("Count")) never touches Other
    val local = RocksDbCheckpoints.localize(s"${meta.basePath}/rocks-0")
    val scan = RocksDbCheckpoints.iterate(local.path, Some(Set("Count")))
    try assert(scan.map(_._1).toSet == Set("Count"))
    finally { scan.close(); local.close() }
  }

  test("rocksdb checkpoint state can be rewritten as a full savepoint (S4 -> S9)") {
    val meta = buildSavepoint()
    val dir2 = java.nio.file.Files.createTempDirectory("graft-rocks-out").toString
    val r = Savepoints.reader(spark, meta, "rocky")
    import spark.implicits._
    val doubled = r.readValueStates[Int, Int]("Count").map { case (k, v) => (k, v * 2) }
    val meta2 = Savepoints.writer(spark, meta, "rocky")
      .addValueState("Count", doubled)
      .addKeyedStateRows(r.getAllUnreadKeyedStateRows)
      .writeAll(dir2)
    val r2 = Savepoints.reader(spark, meta2, "rocky")
    assert(r2.readValueStates[Int, Int]("Count").collect().toMap == Map(1 -> 4, 2 -> 2))
    assert(r2.readValueStates[Int, Int]("Other").collect().toMap == Map(7 -> 70, 8 -> 80))
  }

  test("native RocksDB WRITE path (beyond reference): graft-dialect " +
    "savepoint with per-subtask checkpoint dirs roundtrips through S4") {
    import graft.core.codec.Codecs.LongCodec
    val values = (1L to 400L).map(k => (k, k * 13))
    val out = java.nio.file.Files.createTempDirectory("graft-rocks-native")
    java.nio.file.Files.delete(out)
    val meta = Savepoints
      .writer(spark, Savepoints.bootstrap("native-op", 4, 128), "native-op")
      .withKeyCodec(LongCodec)
      .withNativeRocksDb()
      .createNewValueState("V", values.toDS(), LongCodec)
      .writeAll(out.toString)
    val op = meta.operator("native-op")
    assert(op.keyedFiles.nonEmpty)
    assert(op.keyedFiles.forall(_.kind == KeyedFileHandle.RocksDbKind))
    assert(op.keyedFiles.map(_.subtaskIndex).distinct.size === op.keyedFiles.size)
    // reload from disk: metadata carries the dirs; S4 scan decodes
    val got = Savepoints.reader(spark, Savepoints.load(meta.basePath), "native-op")
      .readValueStates[Long, Long]("V").collect().toMap
    assert(got === values.toMap)
  }

  test("native RocksDB write under the FLINK dialect emits a real " +
    "INCREMENTAL_KEY_GROUPS handle that the S4 reader consumes") {
    import graft.core.codec.Codecs
    val values = (1L to 300L).map(k => (s"u-$k", k * 7))
    val out = java.nio.file.Files.createTempDirectory("graft-rocks-flink")
    java.nio.file.Files.delete(out)
    val meta = Savepoints
      .writer(spark, Savepoints.bootstrap("inc-w-op", 2, 128), "inc-w-op")
      .withDialect(Dialect.Flink)
      .withKeyCodec(Codecs.FlinkStringCodec)
      .withNativeRocksDb()
      .createNewValueState("V", values.toDS(), Codecs.LongCodec)
      .writeAll(out.toString)
    // the _metadata is a real Flink envelope; magic-sniff load resolves
    // codecs from the incremental handle's meta-state proxy
    val loaded = Savepoints.load(meta.basePath)
    val op = loaded.operator("inc-w-op")
    assert(op.keyCodecId === Some("flink-string"))
    assert(op.states.map(_.name) === Seq("V"))
    val got = Savepoints.reader(spark, loaded, "inc-w-op")
      .readValueStates[String, Long]("V").collect().toMap
    assert(got === values.toMap)
    // and the rescale path works FROM the incremental checkpoint: rows
    // re-shard into a plain stream savepoint without a pre-rewrite
    val out2 = java.nio.file.Files.createTempDirectory("graft-rocks-rescale")
    java.nio.file.Files.delete(out2)
    val rows = Savepoints.reader(spark, loaded, "inc-w-op").getAllUnreadKeyedStateRows
    val meta2 = Savepoints.writer(spark, loaded, "inc-w-op")
      .addKeyedStateRows(rows)
      .withParallelism(8, 512)
      .writeAll(out2.toString)
    val got2 = Savepoints.reader(spark, Savepoints.load(meta2.basePath), "inc-w-op")
      .readValueStates[String, Long]("V").collect().toMap
    assert(got2 === values.toMap)
  }
}

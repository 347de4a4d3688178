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
}

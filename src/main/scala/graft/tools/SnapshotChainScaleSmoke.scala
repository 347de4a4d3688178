package graft.tools

import graft.Catalog
import graft.streaming.StreamingQueries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100×-scale smoke for the versioned upsert sink (st24) and its vacuum
  * (st25): maintains a keyed snapshot of `nKeys` users (default 5M)
  * through a chain of merge batches and measures the properties the
  * operators claim at 100 TB:
  *
  *  1. MERGE COST IS FLAT IN HISTORY LENGTH: each batch b is
  *     `batchRows` synthetic events (uniform over the keyspace);
  *     v_b = full-outer(v_{b-1}, agg(batch b)) — wall time per batch
  *     must track |snapshot| + |batch|, NOT the number of prior
  *     versions (nothing ever rescans the event history).
  *  2. DRIVER HOLDS NOTHING: batches and snapshots are generated and
  *     merged distributively (spark.range → agg → join → parquet);
  *     the only driver values are the per-version byte/row counts.
  *  3. VACUUM IS A HANDLE DELETE: retiring versions v0..v_{B-3}
  *     reclaims their bytes in O(files) driver time, and the surviving
  *     head still decodes (count verified against the expected
  *     keyspace).
  *
  * Run: `sbt "runMain graft.tools.SnapshotChainScaleSmoke [nKeys] [batchRows] [nBatches]"`.
  * Prints one JSON line per batch plus a vacuum line; the record lands
  * in PLANS.md.
  */
object SnapshotChainScaleSmoke {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // deterministic JSON decimals
    val nKeys = if (args.length > 0) args(0).toLong else 5000000L
    val batchRows = if (args.length > 1) args(1).toLong else 5000000L
    val nBatches = if (args.length > 2) args(2).toInt else 4
    val b = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-snapshot-chain-scale-smoke")
      .config("spark.sql.shuffle.partitions", "32")
    Catalog.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files
      .createTempDirectory("graft-chain-smoke").toString
    val writeSnap = StreamingQueries.upsertSnapshotWriter(base)

    def dirBytes(p: String): Long = {
      val f = new java.io.File(p)
      if (!f.exists()) 0L
      else Option(f.listFiles()).toSeq.flatten.map(_.length()).sum
    }

    // synthetic batch b: batchRows events, keys uniform over the
    // keyspace via a deterministic hash; distinct event ids per batch
    def batch(bi: Long) =
      spark.range(batchRows).toDF("i").select(
        expr(s"pmod(hash(i, $bi), $nKeys)").cast("long").as("user_id"),
        (col("i") + lit(bi * batchRows)).as("event_id"),
        expr(s"concat('t', pmod(hash(i, $bi, 7), 5))").as("event_type"),
        expr(s"pmod(hash(i, $bi, 11), 10000)").cast("long").as("cents"),
        (lit(1704067200000L) + col("i") % 86400000L).as("ms"))

    (0 until nBatches).foreach { bi =>
      val t0 = System.nanoTime()
      writeSnap(batch(bi.toLong), bi.toLong)
      val s = (System.nanoTime() - t0) / 1e9
      val vDir = s"$base/v$bi"
      val rows = spark.read.parquet(vDir).count()
      println(s"""{"metric":"snapshot_chain_scale_smoke","batch":$bi,""" +
        s""""batch_rows":$batchRows,"snapshot_keys":$rows,""" +
        s""""snapshot_bytes":${dirBytes(vDir)},""" +
        s""""merge_s":${"%.1f".format(s)}}""")
    }

    // vacuum: retire all but the newest 2 versions (st25's policy)
    val retire = 0 until (nBatches - 2)
    val reclaimed = retire.map(bi => dirBytes(s"$base/v$bi")).sum
    val t0 = System.nanoTime()
    retire.foreach { bi =>
      StreamingQueries.deleteRecursively(java.nio.file.Paths.get(s"$base/v$bi"))
    }
    val vacS = (System.nanoTime() - t0) / 1e9
    val headRows = spark.read.parquet(s"$base/v${nBatches - 1}").count()
    println(s"""{"metric":"snapshot_chain_scale_smoke","vacuum":true,""" +
      s""""retired_versions":${retire.size},"reclaimed_bytes":$reclaimed,""" +
      s""""vacuum_s":${"%.1f".format(vacS)},"head_keys":$headRows}""")

    StreamingQueries.deleteRecursively(java.nio.file.Paths.get(base))
    spark.stop()
  }
}

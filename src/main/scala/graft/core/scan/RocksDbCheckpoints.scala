package graft.core.scan

import org.rocksdb._

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Incremental-checkpoint support (SURVEY.md §2.1 S4): state stored as a
  * real RocksDB instance, one column family per state name, iterated
  * with the JNI bindings — the graft analogue of the reference's
  * RocksDBCheckpointIterator.java:73-248 (transfer :92-148, open
  * :196-216, iterate :218-238).
  *
  * Beyond the reference (which only reads this format), graft also
  * WRITES it: `createCheckpoint` backs both fixture fabrication and the
  * native-format savepoint sink
  * ([[graft.state.OperatorStateWriter.withNativeRocksDb]]), so repaired
  * or rescaled state can restore through RocksDB's own file loading
  * instead of a stream-decode.
  */
object RocksDbCheckpoints {
  RocksDB.loadLibrary()

  /** Build a RocksDB checkpoint directory from raw state rows: one
    * column family per state name, key = keyAndNamespaceBytes,
    * value = valueBytes.
    */
  def createCheckpoint(
      targetDir: String,
      rows: Seq[(String, Array[Byte], Array[Byte])]): Unit =
    createCheckpoint(targetDir, rows.iterator)

  /** Streaming variant — rows never materialize in memory, so one
    * subtask's full state can flow straight from the shuffle into the
    * native files (the write-path analogue of the reference's streamed
    * read, RocksDBCheckpointIterator.java:218-238).
    */
  def createCheckpoint(
      targetDir: String,
      rows: Iterator[(String, Array[Byte], Array[Byte])]): Unit = {
    val work = Files.createTempDirectory("graft-rocks-work")
    val opts = new Options().setCreateIfMissing(true)
    val db = RocksDB.open(opts, work.toString)
    try {
      val handles = scala.collection.mutable.Map.empty[String, ColumnFamilyHandle]
      try {
        rows.foreach { case (state, k, v) =>
          val h = handles.getOrElseUpdate(state,
            db.createColumnFamily(new ColumnFamilyDescriptor(
              state.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
          db.put(h, k, v)
        }
        val cp = Checkpoint.create(db)
        try cp.createCheckpoint(targetDir) finally cp.close()
      } finally handles.values.foreach(_.close()) // CF handles before db
    } finally {
      db.close(); opts.close()
      deleteRecursively(work)
    }
  }

  /** Closeable scan over the kept column families of a checkpoint dir. */
  final class CheckpointScan(localDir: String, keep: Option[Set[String]])
      extends Iterator[(String, Array[Byte], Array[Byte])] with AutoCloseable {
    private val utf8 = java.nio.charset.StandardCharsets.UTF_8
    private val cfNames = {
      val listOpts = new Options()
      try RocksDB.listColumnFamilies(listOpts, localDir).asScala.toSeq
      finally listOpts.close()
    }
    // state-name pushdown: open ONLY the matching column families
    // (reference RocksDBCheckpointIterator.java:150-166); "default" must
    // always be opened per RocksDB contract but holds no graft state.
    private val wanted = cfNames.filter { n =>
      val name = new String(n, utf8)
      name == "default" || keep.forall(_.contains(name))
    }
    private val handles = new java.util.ArrayList[ColumnFamilyHandle]()
    private val dbOpts = new DBOptions()
    private val db = RocksDB.openReadOnly(dbOpts, localDir, wanted.map(
      new ColumnFamilyDescriptor(_)).asJava, handles)

    private val perCf = handles.asScala.toSeq.zip(wanted)
      .filter { case (_, n) => new String(n, utf8) != "default" }
    private var cfIdx = 0
    private var rit: RocksIterator = _
    private var curName: String = _
    private var closed = false

    private def advance(): Boolean = {
      while (true) {
        if (rit != null && rit.isValid) return true
        if (rit != null) { rit.close(); rit = null }
        if (cfIdx >= perCf.size) return false
        val (h, nameBytes) = perCf(cfIdx)
        cfIdx += 1
        curName = new String(nameBytes, utf8)
        rit = db.newIterator(h)
        rit.seekToFirst()
      }
      false
    }

    def hasNext: Boolean = !closed && advance()

    def next(): (String, Array[Byte], Array[Byte]) = {
      if (!hasNext) throw new NoSuchElementException
      val r = (curName, rit.key(), rit.value())
      rit.next()
      r
    }

    def close(): Unit = if (!closed) {
      closed = true
      if (rit != null) rit.close()
      handles.asScala.foreach(_.close()) // CF handles before db (RocksJava contract)
      db.close()
      dbOpts.close()
    }
  }

  /** `keep = None` reads every state (reference
    * RocksDBCheckpointIterator.java:73-248 iterate path).
    */
  def iterate(localDir: String, keep: Option[Set[String]]): CheckpointScan =
    new CheckpointScan(localDir, keep)

  /** A checkpoint directory usable from local disk; `close()` deletes it
    * iff it was downloaded (remote handles).
    */
  final case class LocalizedDir(path: String, downloaded: Boolean) extends AutoCloseable {
    def close(): Unit =
      if (downloaded) deleteRecursively(Paths.get(path))
  }

  /** A stub dir produced from a Flink incremental handle: small
    * (byte-stream) files materialized directly, plus this manifest
    * naming the remote sst/misc files still to be fetched — the
    * executor-side transfer step assembles the real checkpoint dir
    * (reference RocksDBCheckpointIterator.java:92-148 does the same
    * per-handle transfer).
    */
  val ManifestName = "_graft_manifest"

  /** Ensure the checkpoint directory is on local disk; if the handle
    * points at a distributed FS, download it first (the reference's
    * transfer step, RocksDBCheckpointIterator.java:92-148). A stub dir
    * containing [[ManifestName]] is always assembled into a fresh local
    * dir: local stub files are copied, manifest-listed files fetched
    * under their checkpoint-local names.
    */
  def localize(dir: String): LocalizedDir = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = p.getFileSystem(conf)
    val manifest = new org.apache.hadoop.fs.Path(p, ManifestName)
    if (fs.exists(manifest)) return assembleFromManifest(p, fs, conf)
    val scheme = Option(p.toUri.getScheme).getOrElse("file")
    if (scheme == "file" || fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]) {
      LocalizedDir(p.toUri.getPath, downloaded = false)
    } else {
      val local: Path = Files.createTempDirectory("graft-rocks-dl")
      fs.listStatus(p).foreach { st =>
        fs.copyToLocalFile(st.getPath,
          new org.apache.hadoop.fs.Path(local.resolve(st.getPath.getName).toString))
      }
      LocalizedDir(local.toString, downloaded = true)
    }
  }

  private def assembleFromManifest(
      stub: org.apache.hadoop.fs.Path,
      stubFs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration): LocalizedDir = {
    val local: Path = Files.createTempDirectory("graft-rocks-asm")
    // 1. copy the stub's materialized small files
    stubFs.listStatus(stub).foreach { st =>
      if (st.getPath.getName != ManifestName)
        stubFs.copyToLocalFile(st.getPath,
          new org.apache.hadoop.fs.Path(local.resolve(st.getPath.getName).toString))
    }
    // 2. fetch every manifest-listed file under its checkpoint-local name
    val in = stubFs.open(new org.apache.hadoop.fs.Path(stub, ManifestName))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
      finally in.close()
    lines.filter(_.nonEmpty).foreach { line =>
      val Array(name, uri) = line.split("\t", 2)
      val src = new org.apache.hadoop.fs.Path(uri)
      src.getFileSystem(conf).copyToLocalFile(src,
        new org.apache.hadoop.fs.Path(local.resolve(name).toString))
    }
    LocalizedDir(local.toString, downloaded = true)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
  }
}

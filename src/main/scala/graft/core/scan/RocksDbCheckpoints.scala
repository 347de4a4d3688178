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
        // flush to SSTs before checkpointing: data left in the WAL would
        // be invisible to later incremental writes' SST sharing
        val fo = new FlushOptions().setWaitForFlush(true)
        try handles.values.foreach(h => db.flush(fo, h)) finally fo.close()
        val cp = Checkpoint.create(db)
        try cp.createCheckpoint(targetDir) finally cp.close()
      } finally handles.values.foreach(_.close()) // CF handles before db
    } finally {
      db.close(); opts.close()
      deleteRecursively(work)
    }
  }

  /** Result of an incremental write: which checkpoint files were
    * re-used from the base (manifest references, never re-uploaded) and
    * which were newly materialized.
    */
  final case class IncrementalResult(shared: Seq[String], created: Seq[String])

  /** TRUE incremental checkpoint write — SST sharing across successive
    * checkpoints (beyond the reference, which only reads the shared/
    * private layout, RocksDBCheckpointIterator.java:92-148). The new
    * checkpoint is written as a stub dir: files the base checkpoint
    * already holds become [[ManifestName]] lines (`name\turi`) pointing
    * at the base's copy, so only the delta's new SSTs + the small
    * metadata files (MANIFEST/CURRENT/OPTIONS/log) are materialized.
    * Within one RocksDB lineage SST file numbers are never reused, so
    * same-name = same-bytes; a defensive length check enforces it.
    *
    * `delta`: (stateName, key, Some(value)) upserts, (stateName, key,
    * None) deletes. Auto-compaction is disabled on the work DB so an
    * unchanged base SST can never be rewritten under a new name.
    *
    * The existing read path consumes the stub transparently:
    * [[localize]] assembles materialized + manifest-listed files into
    * one local dir before the CF scan.
    */
  def createIncrementalCheckpoint(
      targetDir: String,
      baseDir: String,
      delta: Iterator[(String, Array[Byte], Option[Array[Byte]])]): IncrementalResult = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val conf = new org.apache.hadoop.conf.Configuration()

    // 1. what the base already stores, under its ORIGINAL uri (a stub
    // base contributes its manifest entries verbatim — the chain is
    // flattened, every reference points at a materialized file)
    val basePath = new org.apache.hadoop.fs.Path(baseDir)
    val baseFs = basePath.getFileSystem(conf)
    val baseFiles = scala.collection.mutable.Map.empty[String, (String, Long)]
    baseFs.listStatus(basePath).foreach { st =>
      if (st.getPath.getName != ManifestName)
        baseFiles(st.getPath.getName) =
          (st.getPath.toUri.toString, st.getLen)
    }
    val baseManifest = new org.apache.hadoop.fs.Path(basePath, ManifestName)
    if (baseFs.exists(baseManifest)) {
      val in = baseFs.open(baseManifest)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
        finally in.close()
      lines.filter(_.nonEmpty).foreach { line =>
        val Array(name, uri) = line.split("\t", 2)
        val p = new org.apache.hadoop.fs.Path(uri)
        baseFiles(name) = (uri, p.getFileSystem(conf).getFileStatus(p).getLen)
      }
    }

    // 2. writable work copy: hard-link the immutable SSTs (fallback:
    // copy), copy the small mutable metadata files
    val localized = localize(baseDir)
    val work = Files.createTempDirectory("graft-rocks-incr")
    try {
      Files.list(Paths.get(localized.path)).forEach { f =>
        val dst = work.resolve(f.getFileName.toString)
        if (f.getFileName.toString.endsWith(".sst"))
          try Files.createLink(dst, f)
          catch { case _: Exception => Files.copy(f, dst) }
        else Files.copy(f, dst)
      }
      localized.close()

      // 3. open read-write with every column family, apply the delta
      val cfOpts = new ColumnFamilyOptions().setDisableAutoCompactions(true)
      val listOpts = new Options()
      val cfNames =
        try RocksDB.listColumnFamilies(listOpts, work.toString).asScala.toSeq
        finally listOpts.close()
      val descs = cfNames.map(new ColumnFamilyDescriptor(_, cfOpts))
      val handles = new java.util.ArrayList[ColumnFamilyHandle]()
      val dbOpts = new DBOptions().setCreateIfMissing(false)
      val db = RocksDB.open(dbOpts, work.toString, descs.asJava, handles)
      val cpDir = work.resolveSibling(work.getFileName.toString + "-cp")
      try {
        val byName = handles.asScala.toSeq.zip(cfNames)
          .map { case (h, n) => new String(n, utf8) -> h }
        val cfMap = scala.collection.mutable.Map(byName: _*)
        delta.foreach { case (state, k, v) =>
          val h = cfMap.getOrElseUpdate(state,
            db.createColumnFamily(new ColumnFamilyDescriptor(state.getBytes(utf8), cfOpts)))
          v match {
            case Some(bytes) => db.put(h, k, bytes)
            case None => db.delete(h, k)
          }
        }
        // flush so the delta becomes SSTs (not WAL residue) before the
        // checkpoint hard-links the file set
        val fo = new FlushOptions().setWaitForFlush(true)
        try cfMap.values.foreach(h => db.flush(fo, h)) finally fo.close()
        val cp = Checkpoint.create(db)
        try cp.createCheckpoint(cpDir.toString) finally cp.close()
      } finally {
        handles.asScala.foreach(_.close())
        db.close(); dbOpts.close(); cfOpts.close()
      }

      // 4. stub write: share what the base already stores, materialize
      // the rest
      val target = new org.apache.hadoop.fs.Path(targetDir)
      val targetFs = target.getFileSystem(conf)
      targetFs.mkdirs(target)
      val shared = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val created = scala.collection.mutable.ArrayBuffer.empty[String]
      try {
        Files.list(cpDir).forEach { f =>
          val name = f.getFileName.toString
          val reusable = name.endsWith(".sst") &&
            baseFiles.get(name).exists(_._2 == Files.size(f))
          if (reusable) shared += name -> baseFiles(name)._1
          else {
            created += name
            targetFs.copyFromLocalFile(
              new org.apache.hadoop.fs.Path(f.toAbsolutePath.toString),
              new org.apache.hadoop.fs.Path(target, name))
          }
        }
        if (shared.nonEmpty) {
          val out = targetFs.create(
            new org.apache.hadoop.fs.Path(target, ManifestName), true)
          try out.write(shared.sortBy(_._1)
            .map { case (n, u) => s"$n\t$u" }.mkString("", "\n", "\n")
            .getBytes(utf8))
          finally out.close()
        }
      } finally deleteRecursively(cpDir)
      IncrementalResult(shared.map(_._1).toSeq.sorted, created.toSeq.sorted)
    } finally deleteRecursively(work)
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

  /** Every file URI a set of live checkpoint dirs still references via
    * their [[ManifestName]] stubs. Input for [[gcCheckpoint]].
    */
  def referencedUris(liveDirs: Seq[String]): Set[String] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    liveDirs.flatMap { dir =>
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(conf)
      val manifest = new org.apache.hadoop.fs.Path(p, ManifestName)
      if (!fs.exists(manifest)) Seq.empty[String]
      else {
        val in = fs.open(manifest)
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
          finally in.close()
        lines.filter(_.nonEmpty).map(_.split("\t", 2)(1))
      }
    }.toSet
  }

  final case class GcReport(deleted: Seq[String], retained: Seq[String])

  /** Ref-count GC of a DROPPED checkpoint dir: every file still listed
    * in a live checkpoint's manifest (`referenced`) survives in place —
    * a stub's manifest only ever points at materialized files, so
    * retaining exactly the referenced set keeps every live chain
    * restorable — and everything else (MANIFEST/CURRENT/OPTIONS/log +
    * unshared SSTs + the dropped stub's own manifest) is deleted. The
    * dir itself goes when nothing survives. This is the lifecycle
    * counterpart of [[createIncrementalCheckpoint]]: old checkpoints
    * retire at the cost of a listing, never a rewrite.
    */
  def gcCheckpoint(dropDir: String, referenced: Set[String]): GcReport = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new org.apache.hadoop.fs.Path(dropDir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return GcReport(Seq.empty, Seq.empty)
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    val retained = scala.collection.mutable.ArrayBuffer.empty[String]
    fs.listStatus(p).foreach { st =>
      val uri = st.getPath.toUri.toString
      if (referenced(uri)) retained += uri
      else { fs.delete(st.getPath, false); deleted += uri }
    }
    if (retained.isEmpty) fs.delete(p, true)
    GcReport(deleted.toSeq.sorted, retained.toSeq.sorted)
  }

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

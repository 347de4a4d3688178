package graft

/** Gate/bench temp-dir hygiene, shared by every roundtrip QueryDef
  * (state savepoints, ingest-format rewrites, streaming checkpoints):
  * dirs are deleted on JVM exit — not earlier, because the RESULT
  * DataFrame of a roundtrip query lazily re-reads them on every action
  * — so repeated bench/verify runs do not accumulate output on disk.
  */
object TempDirs {

  private val dirs =
    java.util.Collections.synchronizedList(new java.util.ArrayList[java.nio.file.Path]())

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    dirs.forEach { p =>
      try {
        if (java.nio.file.Files.exists(p)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      } catch { case _: Throwable => }
    }))

  /** Create a temp directory deleted (recursively) on JVM exit. */
  def create(prefix: String): String =
    track(java.nio.file.Files.createTempDirectory(prefix)).toString

  /** Register an existing path for exit-time recursive deletion. */
  def track(p: java.nio.file.Path): java.nio.file.Path = { dirs.add(p); p }

  /** Delete a path tree immediately — for gates that must prove a
    * result no longer depends on it (e.g. sp36's chain retirement).
    */
  def deleteNow(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
}

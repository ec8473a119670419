package graft.sources

import java.nio.file.{Files, Path}
import java.util.Comparator

/** JVM-lifetime temp directories with guaranteed cleanup. Every staging
  * dir the engine creates (streaming file-stream sources, persisted
  * sketch/index artifacts round-tripping through disk) is made here, so
  * a correctness-gate or bench sweep no longer leaks one full-table
  * parquet copy per query run into /tmp — the shutdown hook removes
  * them all when the driver JVM exits. */
object TempDirs {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach(deleteRecursively(_))
  }, "graft-tempdir-cleanup"))

  /** A fresh temp directory, registered for deletion at JVM exit. */
  def create(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => try Files.deleteIfExists(f) catch { case _: Throwable => () })
      finally walk.close()
    }
}

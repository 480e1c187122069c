package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** JVM-exit cleanup for memoized temp index roots. [[TextIndex]] and
  * [[AnnIndex]] memoize one on-disk index tree per (JVM, corpus); without
  * cleanup, repeated JVM runs accumulate trees under /tmp (r13 advice).
  * A single shutdown hook (registered lazily on first use) deletes every
  * registered root recursively. Production callers point the index at a
  * managed directory instead; this covers the dev/verify/test JVMs that
  * use the temp-dir default. */
object TempRoots {
  private val roots = scala.collection.mutable.ArrayBuffer.empty[Path]
  private var hooked = false

  /** Register `dir` (a temp root) for recursive deletion at JVM exit. */
  def register(dir: String): Unit = synchronized {
    roots += Paths.get(dir)
    if (!hooked) {
      hooked = true
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteAll()))
    }
  }

  private def deleteAll(): Unit = synchronized {
    roots.foreach { root =>
      try {
        if (Files.exists(root)) {
          val stream = Files.walk(root)
          try stream.sorted(Comparator.reverseOrder[Path]())
            .forEach(p => { try Files.deleteIfExists(p) catch { case _: java.io.IOException => () } })
          finally stream.close()
        }
      } catch { case _: java.io.IOException => () }
    }
    roots.clear()
  }
}

package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Shared scratch-space allocator for queries that materialize
  * intermediate tables (catalog demos, bucketed joins, stream sinks).
  *
  * Every dir handed out is tracked and recursively deleted when the JVM
  * exits, so repeated Verify/Bench runs don't accumulate disk — and the
  * write side effects stay inside one run's lifetime. Deletion is
  * best-effort (exceptions swallowed: the OS tmp reaper is the
  * backstop).
  */
object Scratch {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach(deleteRecursively(_))
  }, "graft-scratch-cleaner"))

  /** A fresh tracked temp directory; deleted on JVM exit. */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }

  private def deleteRecursively(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
      }
    } catch { case _: Exception => () }
}

package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Temp directories that clean themselves up at JVM exit — Verify/Bench
  * create a handful of staging dirs per run (meta stores, destinations,
  * stream landing zones) that would otherwise pile up dataset-sized
  * garbage in /tmp across rounds.
  */
object TempDirs {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { p =>
      try
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => { val _ = Files.deleteIfExists(f) })
      catch { case _: Throwable => () }
    }
  }))

  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}

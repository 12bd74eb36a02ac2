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

  /** Scratch root. These dirs hold EPHEMERAL state — demo-drain streaming
    * checkpoints, staging zones, per-query sinks — that is created, read
    * once, and deleted at JVM exit, so a RAM-backed filesystem is the
    * right home when one exists: each streaming drain commits dozens of
    * small WAL/state/sink files whose create+rename round trips otherwise
    * hit disk (the single biggest fixed cost of an AvailableNow
    * micro-batch at toy scale). Overridable via GRAFT_TMP_ROOT; falls back
    * to java.io.tmpdir when no RAM fs is present. Durable outputs (a real
    * deployment's checkpoints and destinations) never come from here —
    * callers pass those paths explicitly.
    */
  /** Minimum free bytes the IMPLICIT /dev/shm default must have before we
    * prefer it over disk tmp. tmpfs is typically capped at 50% of RAM; a
    * larger-SF sweep that spills shuffle + streaming state there can
    * ENOSPC mid-run where plain disk would have survived. 8 GiB covers
    * the sf0.1 sweep's observed peak with wide margin while still
    * rejecting a nearly-full or tiny tmpfs. An EXPLICIT `GRAFT_TMP_ROOT`
    * is exempt: the user named that filesystem on purpose (maybe for a
    * run that needs far less than 8 GiB), and silently discarding their
    * override would be an invisible performance regression — it is only
    * validated for existence/writability.
    */
  private val MinFastRootFreeBytes: Long = 8L << 30

  private val fastRoot: Option[Path] = {
    val explicit = sys.env.get("GRAFT_TMP_ROOT")
    val cand = java.nio.file.Paths.get(explicit.getOrElse("/dev/shm"))
    val usable =
      Files.isDirectory(cand) && Files.isWritable(cand) &&
        (explicit.isDefined ||
          (try Files.getFileStore(cand).getUsableSpace >= MinFastRootFreeBytes
           catch { case _: Throwable => false }))
    if (usable) Some(cand) else None
  }

  /** The scratch root currently in effect — RAM fs, explicit override, or
    * disk tmp. Diagnostic only (bench artifacts stamp it so a run that
    * silently fell back from /dev/shm to disk is identifiable from the
    * artifact alone).
    */
  def rootDescription: String =
    fastRoot.map(_.toString)
      .getOrElse(sys.props.getOrElse("java.io.tmpdir", "java.io.tmpdir"))

  def create(prefix: String): String = {
    val p = fastRoot match {
      case Some(root) => Files.createTempDirectory(root, prefix)
      case None => Files.createTempDirectory(prefix)
    }
    created.add(p)
    p.toString
  }
}

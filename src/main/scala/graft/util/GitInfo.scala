package graft.util

/** The working tree's HEAD commit, for bench-artifact provenance.
  *
  * Two timed runs that carry the SAME sha ran the same binary against the
  * same data — a per-query drift between them cannot be a plan
  * regression, only host noise. Stamping the sha into every bench
  * artifact lets `tools/bench_trend.py` apply that discriminator
  * mechanically (its `same_tree_drift` rule) instead of a human
  * adjudicating each flag against commit history.
  *
  * Read from `.git` directly (HEAD → loose ref → packed-refs) — no
  * subprocess, so a bench run never forks `git` or depends on it being
  * installed. Any failure degrades to "unknown", which the trend tool
  * treats as "cannot apply the rule", never as a match.
  */
object GitInfo {

  def headSha(repoRoot: String = "."): String =
    try {
      val git = java.nio.file.Paths.get(repoRoot, ".git")
      val head = java.nio.file.Files.readString(git.resolve("HEAD")).trim
      if (!head.startsWith("ref: ")) head.take(12)
      else {
        val ref = head.stripPrefix("ref: ").trim
        val loose = git.resolve(ref)
        if (java.nio.file.Files.isRegularFile(loose))
          java.nio.file.Files.readString(loose).trim.take(12)
        else {
          val packed = git.resolve("packed-refs")
          if (!java.nio.file.Files.isRegularFile(packed)) "unknown"
          else
            scala.jdk.CollectionConverters.ListHasAsScala(
              java.nio.file.Files.readAllLines(packed)).asScala
              .find(l => !l.startsWith("#") && l.endsWith(" " + ref))
              .map(_.split(" ")(0).take(12))
              .getOrElse("unknown")
        }
      }
    } catch { case _: Throwable => "unknown" }
}

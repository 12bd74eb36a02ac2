package graft.util

/** The working tree's HEAD commit — and its `src/` content stamp — for
  * bench-artifact provenance.
  *
  * Two timed runs that carry the SAME sha ran the same binary against the
  * same data — a per-query drift between them cannot be a plan
  * regression, only host noise. Stamping the sha into every bench
  * artifact lets `tools/bench_trend.py` apply that discriminator
  * mechanically (its `same_tree_drift` rule) instead of a human
  * adjudicating each flag against commit history.
  *
  * HEAD alone is not the whole tree: a bench run on a DIRTY tree (edit
  * `src/` → run bench → commit later — the iteration loop USAGE.md
  * describes) still carries the pre-edit sha, so two artifacts could
  * share a sha while running different engine code — and conversely a
  * docs-only commit changes the sha while the binary is bit-identical.
  * [[srcHash]] is therefore the identity the same-tree rule keys on: a
  * content digest of `src/main` plus the build config, stamped beside
  * the sha (which remains as provenance). Artifacts from round 19 on
  * carry it; for older pairs the sha-only rule applies, sound there
  * because every archived artifact came from a committed tree.
  *
  * Read from `.git` directly (HEAD → loose ref → packed-refs) — no
  * subprocess, so a bench run never forks `git` or depends on it being
  * installed. The repo root is discovered by walking parent directories
  * from the process CWD (like git itself), so a run forked with a
  * different working directory still stamps correctly. Any failure
  * degrades to "unknown" — noted once on stderr so silently-unstamped
  * artifacts are noticeable — which the trend tool treats as "cannot
  * apply the rule", never as a match.
  */
object GitInfo {

  @volatile private var warnedUnknown = false

  private def noteUnknown(what: String): String = {
    if (!warnedUnknown) {
      warnedUnknown = true
      System.err.println(s"[gitinfo] $what could not be determined — " +
        "artifact will carry 'unknown' and the same-tree rule cannot apply to it")
    }
    "unknown"
  }

  /** Nearest ancestor of `start` (inclusive) containing a `.git` entry —
    * the repo root, found the way git finds it.
    */
  private[util] def findRepoRoot(start: String): Option[java.nio.file.Path] = {
    var p = java.nio.file.Paths.get(start).toAbsolutePath.normalize()
    while (p != null && !java.nio.file.Files.exists(p.resolve(".git"))) p = p.getParent
    Option(p)
  }

  def headSha(repoRoot: String = "."): String =
    try {
      findRepoRoot(repoRoot) match {
        case None => noteUnknown("repo root (no .git in any parent)")
        case Some(root) =>
          val git = root.resolve(".git")
          val head = java.nio.file.Files.readString(git.resolve("HEAD")).trim
          if (!head.startsWith("ref: ")) head.take(12)
          else {
            val ref = head.stripPrefix("ref: ").trim
            val loose = git.resolve(ref)
            if (java.nio.file.Files.isRegularFile(loose))
              java.nio.file.Files.readString(loose).trim.take(12)
            else {
              val packed = git.resolve("packed-refs")
              if (!java.nio.file.Files.isRegularFile(packed)) noteUnknown("HEAD ref")
              else
                scala.jdk.CollectionConverters.ListHasAsScala(
                  java.nio.file.Files.readAllLines(packed)).asScala
                  .find(l => !l.startsWith("#") && l.endsWith(" " + ref))
                  .map(_.split(" ")(0).take(12))
                  .getOrElse(noteUnknown("HEAD ref"))
            }
          }
      }
    } catch { case _: Throwable => noteUnknown("HEAD sha") }

  /** Engine-content digest (first 12 hex of SHA-1): every regular file
    * under `src/main`, path-sorted, (relative path + NUL + bytes) per
    * file, then the build config (`build.sbt`,
    * `project/build.properties` — they shape the binary as surely as
    * source does, and a build-flag edit leaves `src/main` untouched).
    * This is the identity the same-binary claim rests on: it changes
    * with any engine edit whether or not the edit is committed (the
    * dirty-tree discriminator), and it does NOT change across docs-only
    * commits — which is why `bench_trend.py` keys its same-tree rule on
    * this stamp and records the sha only as provenance. Degrades to
    * "unknown" when the tree has no `src/main` (e.g. a jar deployment),
    * which the trend tool treats as non-matching against a known stamp.
    */
  def srcHash(repoRoot: String = "."): String =
    try {
      findRepoRoot(repoRoot) match {
        case Some(root) if java.nio.file.Files.isDirectory(root.resolve("src").resolve("main")) =>
          val srcMain = root.resolve("src").resolve("main")
          val md = java.security.MessageDigest.getInstance("SHA-1")
          val files = {
            val s = java.nio.file.Files.walk(srcMain)
            try {
              scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
                .filter(java.nio.file.Files.isRegularFile(_))
                .toVector.sortBy(_.toString)
            } finally s.close()
          }
          files.foreach { f =>
            md.update(srcMain.relativize(f).toString.getBytes("UTF-8"))
            md.update(0.toByte)
            md.update(java.nio.file.Files.readAllBytes(f))
          }
          Seq("build.sbt", "project/build.properties").foreach { rel =>
            val f = root.resolve(rel)
            if (java.nio.file.Files.isRegularFile(f)) {
              md.update(rel.getBytes("UTF-8"))
              md.update(0.toByte)
              md.update(java.nio.file.Files.readAllBytes(f))
            }
          }
          files.length match {
            case 0 => noteUnknown("src hash (src/main empty)")
            case _ => md.digest().map(b => f"$b%02x").mkString.take(12)
          }
        case _ => noteUnknown("src hash (no src/main under the repo root)")
      }
    } catch { case _: Throwable => noteUnknown("src hash") }
}

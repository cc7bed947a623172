package graft.operators

import java.nio.file.{Files, Path}

/** Temp-dir registry for operator scratch snapshots (k-core rounds,
  * candidate-graph materializations, DPP rewrites). Every dir created
  * here is deleted by ONE JVM shutdown hook, so repeated runs of the
  * bench / verify / test suites leave no orphan `/tmp/graft-*` dirs
  * behind — operators still accept an explicit `scratchDir` override
  * (CC/PageRank/KCore) when the caller wants the snapshots kept.
  *
  * Two tiers, because the bench sweep needs slot isolation:
  *
  *  - [[dir]]: PER-QUERY scratch. A query allocates a fresh dir per
  *    invocation and nothing outlives the call, so [[sweep]] may
  *    reclaim these between timed bench slots — without it, 400
  *    queries' staged tables/manifests/indexes pile up in /tmp and
  *    the page-cache/GC pressure bleeds into NEIGHBORS' timed slots
  *    (the r10 in-suite inflation: q272 4.96 s in-suite vs 1.55 s
  *    isolated).
  *  - [[pinned]]: SHARED fixtures whose paths are memoized across
  *    queries (the AnnIndex stores, the CandidateGraph snapshots).
  *    These survive [[sweep]] and go only at JVM exit — sweeping them
  *    would dangle the memoized paths.
  */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private val keepDirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach(d => delete(d.toFile))
      keepDirs.forEach(d => delete(d.toFile))
    }))

  private def delete(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(delete)
    f.delete()
    ()
  }

  /** A fresh per-query temp dir: removed at JVM exit, and eligible for
    * [[sweep]] between bench slots.
    */
  def dir(prefix: String): String = {
    hookInstalled
    val d = Files.createTempDirectory(prefix)
    dirs.add(d)
    d.toString
  }

  /** A fresh temp dir for a MEMOIZED shared fixture: removed only at
    * JVM exit, never by [[sweep]] — callers cache the returned path.
    */
  def pinned(prefix: String): String = {
    hookInstalled
    val d = Files.createTempDirectory(prefix)
    keepDirs.add(d)
    d.toString
  }

  /** Reclaim every per-query dir allocated so far (pinned fixtures
    * stay). Safe between queries by the [[dir]] contract — no caller
    * holds a [[dir]] path across invocations.
    */
  def sweep(): Unit = {
    var d = dirs.poll()
    while (d != null) { delete(d.toFile); d = dirs.poll() }
  }
}

package graft.operators

import java.nio.file.{Files, Path}

/** Temp-dir registry for operator scratch snapshots (k-core rounds,
  * candidate-graph materializations, DPP rewrites). Every dir created
  * here is deleted by ONE JVM shutdown hook, so repeated runs of the
  * bench / verify / test suites leave no orphan `/tmp/graft-*` dirs
  * behind — operators still accept an explicit `scratchDir` override
  * (CC/PageRank/KCore) when the caller wants the snapshots kept.
  */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach(d => delete(d.toFile))
    }))

  private def delete(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(delete)
    f.delete()
    ()
  }

  /** A fresh temp dir that is removed at JVM exit. */
  def dir(prefix: String): String = {
    hookInstalled
    val d = Files.createTempDirectory(prefix)
    dirs.add(d)
    d.toString
  }
}

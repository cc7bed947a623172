package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The durable manifest log's advertised guarantee is two-PROCESS
  * exclusion on the storage the repo actually runs on (a local
  * filesystem). Same-JVM tests can't prove it — GraftFs's JVM-wide
  * gate serializes them — so this spec launches two REAL JVMs that
  * race [[GraftFs.createExclusive]] over the same entry names and
  * asserts exactly one winner per entry with intact bytes. This is
  * the test that fails under rename-based publication on POSIX
  * (rename(2) replaces an existing destination, so both racers
  * report success and one payload is silently lost) and passes under
  * hard-link publication (link(2) fails atomically with EEXIST).
  */
class GraftFsCrossProcessSpec extends AnyFunSuite {
  private def javaBin: String =
    s"${System.getProperty("java.home")}/bin/java"

  test("createExclusive is a true cross-process CAS on the local filesystem") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cas-race").toFile
    val n = 300
    val cp = System.getProperty("java.class.path")

    def launch(id: String): Process =
      new ProcessBuilder(
        javaBin, "-cp", cp, "graft.sources.CasRaceMain", dir.getAbsolutePath, id, n.toString
      ).redirectErrorStream(false).start()

    val pa = launch("A")
    val pb = launch("B")
    // both processes spin on this marker, so their attempt loops overlap
    java.nio.file.Files.write(dir.toPath.resolve("go"), Array.emptyByteArray)

    def wins(p: Process): Set[Int] = {
      val src = scala.io.Source.fromInputStream(p.getInputStream)
      try src.getLines().collect { case s if s.startsWith("won ") => s.stripPrefix("won ").toInt }.toSet
      finally src.close()
    }
    val winsA = wins(pa)
    val winsB = wins(pb)
    assert(pa.waitFor() == 0 && pb.waitFor() == 0)

    // exactly one winner per entry: no double-wins (the rename-replace
    // failure mode), no lost entries (both attempted every number)
    assert((winsA & winsB).isEmpty, s"double-won entries: ${(winsA & winsB).toSeq.sorted.take(10)}")
    assert(winsA.size + winsB.size == n, s"${winsA.size} + ${winsB.size} != $n")

    // every surviving file's bytes are exactly its claimed winner's
    // payload — intact, untorn, not overwritten by the loser
    (0 until n).foreach { i =>
      val bytes = new String(
        java.nio.file.Files.readAllBytes(dir.toPath.resolve(s"entry-$i.json")), "UTF-8")
      val expectId = if (winsA.contains(i)) "A" else "B"
      assert(
        bytes == s"""{"winner":"$expectId","entry":$i,"pad":"${"x" * 64}","eof":true}""",
        s"entry $i: content does not match winner $expectId"
      )
    }

    // no stranded temp files: winners and losers both clean up
    val leftovers = dir.listFiles().map(_.getName).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, leftovers.mkString(","))

    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(dir)
  }
}

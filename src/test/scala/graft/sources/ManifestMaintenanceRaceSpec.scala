package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import ManifestLog.{Committed, FileRef}

/** The concurrent-maintenance matrix ACROSS REAL PROCESSES — the
  * Delta isolation table over one shared table directory: two JVMs,
  * one playing OPTIMIZE (compaction planned at a pre-race version),
  * one playing dynamic INSERT OVERWRITE (strict recompute loop), race
  * through the durable log's storage CAS.
  *
  *   - DISJOINT partitions land on both sides (the compaction rebases
  *     past the overwrite's commits).
  *   - The OVERLAPPING partition serializes: either the compaction
  *     lands first and the overwrite's recompute replaces its output,
  *     or the overwrite lands first and the compaction ABORTS LOUDLY
  *     (its inputs are gone). In both interleavings the final state is
  *     the overwrite's — never a resurrect, never a lost update.
  *
  * The in-process, census-earning version of this matrix is
  * q445_maintenance_matrix; this spec proves the exclusion holds with
  * the JVM-wide gate out of the picture.
  */
class ManifestMaintenanceRaceSpec extends AnyFunSuite {
  private def javaBin: String = s"${System.getProperty("java.home")}/bin/java"

  test("OPTIMIZE vs dynamic INSERT OVERWRITE across two JVMs: disjoint lands, overlap serializes to the overwrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-maint-race").toFile.getAbsolutePath
    val log = DurableManifestLog.open(dir)
    // fixture: 4 partitions × 2 files, two appends
    def refsOf(f: String): Seq[FileRef] = (0 to 3).map(p => FileRef(s"p=$p", s"$f.parquet"))
    assert(log.tryCommit("main", 0L, "append", add = refsOf("f1")).isInstanceOf[Committed])
    assert(log.tryCommit("main", log.head(), "append", add = refsOf("f2")).isInstanceOf[Committed])
    val v0 = log.head()

    val cp = System.getProperty("java.class.path")
    val goFile = s"$dir/go"
    def launch(role: String): Process =
      new ProcessBuilder(javaBin, "-cp", cp, "graft.sources.MaintenanceRaceMain", dir, role, goFile)
        .redirectErrorStream(false)
        .start()
    val pa = launch("A")
    val pb = launch("B")
    Thread.sleep(300) // let both open the log and read the pre-race head
    java.nio.file.Files.write(java.nio.file.Paths.get(goFile), Array.emptyByteArray)

    def lines(p: Process): Map[String, String] = {
      val src = scala.io.Source.fromInputStream(p.getInputStream)
      try src.getLines().map { l => val a = l.split(" ", 2); a(0) -> a(1) }.toMap
      finally src.close()
    }
    val outA = lines(pa)
    val outB = lines(pb)
    assert(pa.waitFor() == 0, s"A failed: $outA")
    assert(pb.waitFor() == 0, s"B failed: $outB")

    // disjoint pair: both land regardless of interleaving
    assert(outA("a_p0") == "committed", s"disjoint compaction must land: $outA")
    assert(outB("b_p1") == "committed", s"disjoint overwrite must land: $outB")
    // overlapping pair: the overwrite always lands; the compaction
    // either landed first (and was then replaced) or aborted loudly
    assert(outB("b_p2") == "committed", s"the strict recompute overwrite must land: $outB")
    assert(
      outA("a_p2") == "committed" || outA("a_p2") == "aborted",
      s"the racing compaction must commit-or-abort loudly, never linger: $outA"
    )

    // the FINAL state is identical in both interleavings: p=0 is the
    // compaction output, p=1/p=2 are the overwrites, p=3 untouched
    val fresh = DurableManifestLog.open(dir)
    val live = fresh.liveFiles(fresh.head())
    assert(live.filter(_.dir == "copt-a0") === Set(FileRef("copt-a0", "c.parquet")))
    assert(live.filter(_.dir.startsWith("ow-b1")) === Set(FileRef("ow-b1", "o.parquet")))
    assert(live.filter(_.dir.startsWith("ow-b2")) === Set(FileRef("ow-b2", "o.parquet")))
    assert(live.filter(_.dir == "p=3") === Set(FileRef("p=3", "f1.parquet"), FileRef("p=3", "f2.parquet")))
    assert(live.forall(r => r.dir != "p=0" && r.dir != "p=1" && r.dir != "p=2"), s"replaced originals must be gone: $live")
    // every retained version still replays — no interleaving corrupts history
    fresh.versions.foreach(v => fresh.liveFiles(v))
    assert(fresh.liveFiles(v0) === (0 to 3).flatMap(p => Seq(FileRef(s"p=$p", "f1.parquet"), FileRef(s"p=$p", "f2.parquet"))).toSet)
  }
}

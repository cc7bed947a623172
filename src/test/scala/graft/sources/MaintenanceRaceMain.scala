package graft.sources

import ManifestLog.{Committed, Conflicted, FileRef, Outcome}

/** Subprocess entry point for the two-JVM concurrent-maintenance
  * matrix (see [[ManifestMaintenanceRaceSpec]]): role A plays
  * OPTIMIZE (compaction commits planned at the PRE-RACE version —
  * the stale-read posture the Delta isolation table describes), role
  * B plays dynamic INSERT OVERWRITE (the catalog's strict
  * recompute-per-attempt loop). Both race over one shared table
  * directory through the durable log's storage CAS — no Spark, the
  * matrix is a LOG protocol property.
  *
  * Args: tableDir, role (A|B), goFile. Prints one line per op:
  * `<op> committed|aborted|failed`.
  */
object MaintenanceRaceMain {
  private def outcome(o: Outcome): String = o match {
    case Committed(_, _)  => "committed"
    case Conflicted(ov, _) => if (ov.nonEmpty) "aborted" else "failed"
    case other             => s"failed:$other"
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val role = args(1)
    val go = new java.io.File(args(2))
    val log = DurableManifestLog.open(dir)
    val v0 = log.head() // the pre-race head both planners read
    def liveIn(part: String): Seq[FileRef] =
      log.liveFiles(v0).toSeq.filter(_.dir == part).sortBy(_.file)
    val p0 = liveIn("p=0")
    val p2 = liveIn("p=2")
    while (!go.exists()) Thread.onSpinWait()
    if (role == "A") {
      // OPTIMIZE: each group commits non-strict from the PRE-RACE
      // version — disjoint interveners rebase, an overwrite of the
      // same partition's files aborts loudly (stale inputs)
      val r0 = log.tryCommit(
        "main", v0, "compact", add = Seq(FileRef("copt-a0", "c.parquet")), remove = p0, maxAttempts = 16)
      println(s"a_p0 ${outcome(r0)}")
      val r2 = log.tryCommit(
        "main", v0, "compact", add = Seq(FileRef("copt-a2", "c.parquet")), remove = p2, maxAttempts = 16)
      println(s"a_p2 ${outcome(r2)}")
    } else {
      // dynamic INSERT OVERWRITE: the catalog's strict
      // recompute-per-attempt loop — the remove set is re-derived
      // from the refreshed head every try, so it replaces whatever is
      // live (including a compaction output that landed mid-race)
      def overwrite(part: String, addDir: String): String = {
        var i = 0
        while (i < 64) {
          i += 1
          val h = log.head()
          val rm = log.liveFiles(h).toSeq.filter(_.dir == part).sortBy(_.file)
          log.tryCommit(
            "main", h, "overwrite_partitions",
            add = Seq(FileRef(addDir, "o.parquet")), remove = rm, maxAttempts = 1, strict = true
          ) match {
            case Committed(_, _) => return "committed"
            case _               => () // head moved: recompute
          }
        }
        "failed"
      }
      println(s"b_p1 ${overwrite("p=1", "ow-b1")}")
      println(s"b_p2 ${overwrite("p=2", "ow-b2")}")
    }
  }
}

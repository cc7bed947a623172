package graft.sources

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestLog.{Committed, Conflicted, FileRef}

/** Property-based invariants of the manifest log under RANDOM command
  * sequences — the protocol claims q404–q417 lean on, explored beyond
  * the hand-written conflict matrix:
  *
  *  - a Conflicted outcome NEVER changes the log (same head, same
  *    live set): aborts are trace-free;
  *  - liveFiles replayed from the chain equals a driver-side model
  *    fold of the same accepted commands (the log loses nothing and
  *    invents nothing);
  *  - expiration preserves every retained version's live set and
  *    orphans only files outside them.
  */
class ManifestLogPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  // a command: add some files from a universe, remove some existing
  private val fileNames = (0 until 20).map(i => s"f$i")
  private case class Cmd(adds: Set[String], removes: Set[String], stale: Boolean)

  private val cmds: Gen[List[Cmd]] = Gen.listOfN(
    12,
    for {
      adds <- Gen.someOf(fileNames).map(_.toSet)
      removes <- Gen.someOf(fileNames).map(_.toSet)
      stale <- Gen.oneOf(true, false) // commit from an old read version?
    } yield Cmd(adds, removes, stale)
  )

  private def f(n: String) = FileRef("d", n)

  test("random command streams: aborts are trace-free and the log never diverges from the model") {
    check(Prop.forAll(cmds) { sequence =>
      val log = new ManifestLog
      var model = Set.empty[String] // driver-side fold of ACCEPTED commands
      var removedEver = Set.empty[String]
      var lastAccepted = 0L
      sequence.foreach { c =>
        // removes must name files that exist in the writer's view;
        // restrict to the model so the command is well-formed
        val rm = c.removes.intersect(model)
        val readV = if (c.stale) 0L else log.head()
        val headBefore = log.head()
        val liveBefore = log.liveFiles(headBefore)
        log.tryCommit("main", readV, "op", add = c.adds.toSeq.sorted.map(f), remove = rm.toSeq.sorted.map(f)) match {
          case Committed(v, _) =>
            // a stale commit may only land if its removes are disjoint
            // from everything removed since its read point
            model = (model -- rm) ++ c.adds
            removedEver ++= rm
            lastAccepted = v
          case Conflicted(overlap, _) =>
            // abort: the overlap really was removed before, and the
            // log did not move
            assert(overlap.forall(r => removedEver.contains(r.file)))
            assert(log.head() == headBefore)
            assert(log.liveFiles(log.head()) == liveBefore)
        }
      }
      log.liveFiles(log.head()) == model.map(f)
    })
  }

  test("random histories: expiration preserves every retained version and orphans only outside them") {
    check(Prop.forAll(cmds, Gen.choose(1, 10)) { (sequence, cut) =>
      val log = new ManifestLog
      var model = Set.empty[String]
      sequence.foreach { c =>
        val rm = c.removes.intersect(model)
        log.tryCommit("main", log.head(), "op", add = c.adds.toSeq.sorted.map(f), remove = rm.toSeq.sorted.map(f))
        model = (model -- rm) ++ c.adds
      }
      val head = log.head()
      val horizon = math.min(cut.toLong, head)
      val retained = (horizon to head).map(v => v -> log.liveFiles(v)).toMap
      val orphans = log.expireBefore(horizon)
      val preserved = retained.forall { case (v, live) => log.liveFiles(v) == live }
      val orphansOutside = orphans.forall(o => retained.values.forall(live => !live.contains(o)))
      preserved && orphansOutside
    })
  }
}

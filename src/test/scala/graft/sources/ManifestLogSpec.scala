package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestLog.{Committed, Conflicted, FileRef}

/** The manifest log's commit protocol, pure driver-side — no Spark
  * session needed. The conflict matrix q404 relies on, the change
  * derivation q405 reads, and the ref semantics q406 exposes are each
  * pinned here as properties:
  *
  *  - OCC: first writer wins outright; a later writer whose removed
  *    set is DISJOINT from everything removed since its read rebases
  *    and commits; an OVERLAPPING writer aborts with the exact overlap.
  *  - Tags are immutable pins; branches are movable heads; vacuum's
  *    retention set is reachability from ANY ref.
  *  - Fast-forward is legal only onto an ancestor.
  */
class ManifestLogSpec extends AnyFunSuite {

  private def f(n: String) = FileRef("d", n)

  private def init(log: ManifestLog, files: String*): Long =
    log.tryCommit("main", 0L, "init", add = files.map(f)) match {
      case Committed(v, _) => v
      case other           => fail(s"init failed: $other")
    }

  test("conflict matrix: append vs append — both land, no lost update") {
    val log = new ManifestLog
    val v1 = init(log, "a", "b")
    val oA = log.tryCommit("main", v1, "append", add = Seq(f("c")))
    val oB = log.tryCommit("main", v1, "append", add = Seq(f("d")))
    assert(oA === Committed(2L, 1))
    assert(oB === Committed(3L, 1))
    assert(log.liveFiles(log.head()) === Set(f("a"), f("b"), f("c"), f("d")))
  }

  test("conflict matrix: disjoint remove sets — loser rebases and commits") {
    val log = new ManifestLog
    val v1 = init(log, "a", "b", "c")
    assert(log.tryCommit("main", v1, "rewrite", add = Seq(f("a2")), remove = Seq(f("a"))).isInstanceOf[Committed])
    val o = log.tryCommit("main", v1, "rewrite", add = Seq(f("b2")), remove = Seq(f("b")))
    o match {
      case Committed(v, _) =>
        // rebased: the commit's parent is the intervener, not the read point
        assert(log.chain(v).last.parent === 2L)
      case x => fail(s"disjoint loser must commit, got $x")
    }
    assert(log.liveFiles(log.head()) === Set(f("a2"), f("b2"), f("c")))
  }

  test("conflict matrix: overlapping remove sets — loser aborts with the overlap") {
    val log = new ManifestLog
    val v1 = init(log, "a", "b")
    assert(log.tryCommit("main", v1, "rewrite", add = Seq(f("a2")), remove = Seq(f("a"))).isInstanceOf[Committed])
    log.tryCommit("main", v1, "delete", add = Seq(f("a3")), remove = Seq(f("a"))) match {
      case Conflicted(overlap, _) => assert(overlap === Set(f("a")))
      case x                      => fail(s"overlapping writer must abort, got $x")
    }
    // the abort left no trace: head still the first rewrite
    assert(log.liveFiles(log.head()) === Set(f("a2"), f("b")))
  }

  test("concurrent racers: N threads appending from the same read version all land exactly once") {
    val log = new ManifestLog
    val v1 = init(log, "seed")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[ManifestLog.Outcome]()
    val threads = (1 to 8).map { i =>
      new Thread(() => { results.add(log.tryCommit("main", v1, "append", add = Seq(f(s"n$i")))); () })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val outcomes = { import scala.jdk.CollectionConverters._; results.asScala.toVector }
    assert(outcomes.forall(_.isInstanceOf[Committed]))
    assert(log.liveFiles(log.head()) === (Set(f("seed")) ++ (1 to 8).map(i => f(s"n$i"))))
    // 8 commits → 8 distinct versions, one per racer
    assert(outcomes.collect { case Committed(v, _) => v }.toSet.size === 8)
  }

  test("tags are immutable pins; branches move; reachability keeps a pinned file through head removal") {
    val log = new ManifestLog
    val v1 = init(log, "a", "b")
    log.tag("audit", v1)
    assertThrows[IllegalArgumentException](log.tag("audit", v1))
    // main rewrites a away — but the tag still reaches it
    log.tryCommit("main", v1, "rewrite", add = Seq(f("a2")), remove = Seq(f("a")))
    assert(!log.liveFiles(log.head()).contains(f("a")))
    assert(log.liveFiles(log.tagVersion("audit")).contains(f("a")))
    assert(log.reachableFiles.contains(f("a")))
  }

  test("branch staging is invisible to main; fast-forward only onto an ancestor") {
    val log = new ManifestLog
    val v1 = init(log, "a")
    log.createBranch("wap", v1)
    log.tryCommit("wap", v1, "stage", add = Seq(f("s")))
    assert(!log.liveFiles(log.head("main")).contains(f("s")))
    // main at v1 is an ancestor of wap's head: publish is one ref move
    val pub = log.fastForward("main", "wap")
    assert(log.head("main") === pub)
    assert(log.liveFiles(log.head("main")).contains(f("s")))
    // diverged heads cannot fast-forward
    val log2 = new ManifestLog
    val w1 = init(log2, "x")
    log2.createBranch("wap", w1)
    log2.tryCommit("wap", w1, "stage", add = Seq(f("s2")))
    log2.tryCommit("main", w1, "append", add = Seq(f("y")))
    assertThrows[IllegalArgumentException](log2.fastForward("main", "wap"))
  }

  test("change derivation inputs: commitsBetween is exactly the half-open chain, oldest first") {
    val log = new ManifestLog
    val v1 = init(log, "a")
    val Committed(v2, _) = log.tryCommit("main", v1, "append", add = Seq(f("b"))): @unchecked
    val Committed(v3, _) =
      log.tryCommit("main", v2, "rewrite", add = Seq(f("a2")), remove = Seq(f("a"))): @unchecked
    val cs = log.commitsBetween(v1, v3)
    assert(cs.map(_.version) === Vector(v2, v3))
    assert(cs.map(_.op) === Vector("append", "rewrite"))
    assertThrows[IllegalArgumentException](log.commitsBetween(99L, v3))
  }

  test("expireBefore: refuses while a ref pins expired history, then squashes and orphans exactly") {
    val log = new ManifestLog
    val v1 = init(log, "a", "b")
    log.tag("pin", v1)
    val Committed(v2, _) =
      log.tryCommit("main", v1, "rewrite", add = Seq(f("a2")), remove = Seq(f("a"))): @unchecked
    val Committed(v3, _) = log.tryCommit("main", v2, "append", add = Seq(f("c"))): @unchecked
    // the tag pins v1 < v2: refuse
    assertThrows[IllegalArgumentException](log.expireBefore(v2))
    log.dropTag("pin")
    val pre2 = log.liveFiles(v2)
    val pre3 = log.liveFiles(v3)
    val orphans = log.expireBefore(v2)
    // 'a' was added at v1, removed by v2, pinned by nothing: orphaned
    assert(orphans === Set(f("a")))
    // retained versions replay bit-identically off the checkpoint
    assert(log.liveFiles(v2) === pre2)
    assert(log.liveFiles(v3) === pre3)
    // expired version fails by construction
    assertThrows[RuntimeException](log.liveFiles(v1))
    // the checkpoint keeps DV continuity and further commits still work
    assert(log.tryCommit("main", v3, "append", add = Seq(f("d"))).isInstanceOf[Committed])
  }

  test("expireBefore: refuses when a branch FORKS from expired history, and the refusal mutates nothing") {
    val log = new ManifestLog
    val v1 = init(log, "a")
    log.createBranch("wap", v1)
    val Committed(w2, _) = log.tryCommit("wap", v1, "stage", add = Seq(f("s"))): @unchecked
    val Committed(v3, _) = log.tryCommit("main", v1, "append", add = Seq(f("b"))): @unchecked
    val Committed(v4, _) = log.tryCommit("main", v3, "append", add = Seq(f("c"))): @unchecked
    // wap's head (w2) is above the horizon but its chain passes
    // through v1 < v4 without passing v4: squashing would dangle it
    assertThrows[IllegalArgumentException](log.expireBefore(v4))
    // the refusal left the log fully intact — every read still works
    assert(log.liveFiles(log.head("wap")) === Set(f("a"), f("s")))
    assert(log.liveFiles(v1) === Set(f("a")))
    // after the branch publishes (rebase) and retires, expiration
    // proceeds and the published read is unaffected
    log.tryCommit("main", v4, "publish", add = Seq(f("s")))
    log.dropBranch("wap")
    log.expireBefore(v4)
    assert(log.liveFiles(log.head("main")) === Set(f("a"), f("b"), f("c"), f("s")))
    assertThrows[RuntimeException](log.liveFiles(v1))
  }

  test("expireBefore keeps accumulated DV files in the checkpoint") {
    val log = new ManifestLog
    val v1 = init(log, "a")
    val Committed(v2, _) =
      log.tryCommit("main", v1, "delete_dv", dvAdd = Seq(FileRef("dv", "t0"))): @unchecked
    val Committed(v3, _) = log.tryCommit("main", v2, "append", add = Seq(f("b"))): @unchecked
    log.expireBefore(v2)
    assert(log.dvFiles(v2) === Set(FileRef("dv", "t0")))
    assert(log.dvFiles(v3) === Set(FileRef("dv", "t0")))
  }

  test("restore as a forward commit: file-set delta returns the target content, history intact") {
    val log = new ManifestLog
    val v1 = init(log, "a", "b")
    val Committed(v2, _) = log.tryCommit("main", v1, "append", add = Seq(f("bad"))): @unchecked
    val Committed(v3, _) =
      log.tryCommit("main", v2, "rewrite", add = Seq(f("b2")), remove = Seq(f("b"))): @unchecked
    val target = log.liveFiles(v1)
    val head = log.liveFiles(v3)
    val Committed(v4, _) = log.tryCommit(
      "main",
      v3,
      "restore",
      add = (target -- head).toSeq,
      remove = (head -- target).toSeq
    ): @unchecked
    assert(log.liveFiles(v4) === target)
    // audit trail: all five commits (incl. genesis) still replay
    assert(log.chain(v4).map(_.op) === Vector("genesis", "init", "append", "rewrite", "restore"))
  }

  test("liveStats: zone maps follow their files through rewrite and survive expiration via the checkpoint") {
    val log = new ManifestLog
    val v1 = log.tryCommit("main", 0L, "init", add = Seq(f("a"), f("b")),
      stats = Map(f("a") -> ManifestLog.FileStats(0L, 9L, 10L), f("b") -> ManifestLog.FileStats(10L, 19L, 10L))) match {
      case Committed(v, _) => v
      case o               => fail(s"init failed: $o")
    }
    // rewrite b → b2 with a new zone map; a's stats persist untouched
    val Committed(v2, _) = log.tryCommit("main", v1, "rewrite", add = Seq(f("b2")),
      remove = Seq(f("b")), stats = Map(f("b2") -> ManifestLog.FileStats(10L, 15L, 6L))): @unchecked
    assert(log.liveStats(v2) === Map(f("a") -> ManifestLog.FileStats(0L, 9L, 10L), f("b2") -> ManifestLog.FileStats(10L, 15L, 6L)))
    // removed file's stats drop out of the live view
    assert(!log.liveStats(v2).contains(f("b")))
    // stats ride the expiration checkpoint
    val Committed(v3, _) = log.tryCommit("main", v2, "append", add = Seq(f("c")),
      stats = Map(f("c") -> ManifestLog.FileStats(20L, 29L, 10L))): @unchecked
    log.expireBefore(v2)
    assert(log.liveStats(v2) === Map(f("a") -> ManifestLog.FileStats(0L, 9L, 10L), f("b2") -> ManifestLog.FileStats(10L, 15L, 6L)))
    assert(log.liveStats(v3)(f("c")) === ManifestLog.FileStats(20L, 29L, 10L))
  }

  test("dv files accumulate along the chain and count as reachable") {
    val log = new ManifestLog
    val v1 = init(log, "a")
    val Committed(v2, _) =
      log.tryCommit("main", v1, "delete_dv", dvAdd = Seq(FileRef("dv", "t0"))): @unchecked
    assert(log.dvFiles(v1) === Set.empty)
    assert(log.dvFiles(v2) === Set(FileRef("dv", "t0")))
    assert(log.reachableFiles.contains(FileRef("dv", "t0")))
  }
}

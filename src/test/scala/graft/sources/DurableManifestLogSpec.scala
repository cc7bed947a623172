package graft.sources

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestLog.{Committed, Conflicted, FileRef, FileStats}

/** The durable manifest log's cross-instance guarantees — everything
  * [[ManifestLogSpec]] pins for the in-JVM transport, re-proven with
  * TWO (or more) independent `DurableManifestLog` instances over ONE
  * shared directory, plus the recovery stories only a durable log
  * has: replay-on-open, crash-shaped torn tails, and checkpointed
  * expiration. No Spark session needed — the log is driver metadata.
  */
class DurableManifestLogSpec extends AnyFunSuite {

  private def f(n: String) = FileRef("d", n)

  private def freshDir(): String = graft.operators.Scratch.dir("graft-dlog")

  private def init(log: DurableManifestLog, files: String*): Long =
    log.tryCommit("main", 0L, "init", add = files.map(f)) match {
      case Committed(v, _) => v
      case other           => fail(s"init failed: $other")
    }

  test("replay on open: a fresh instance sees everything a prior instance committed") {
    val dir = freshDir()
    val a = DurableManifestLog.open(dir)
    val v1 = init(a, "a", "b")
    a.tag("audit", v1)
    assert(a.tryCommit("main", v1, "append", add = Seq(f("c"))).isInstanceOf[Committed])
    val b = DurableManifestLog.open(dir)
    assert(b.head() === a.head())
    assert(b.liveFiles(b.head()) === Set(f("a"), f("b"), f("c")))
    assert(b.tagVersion("audit") === v1)
    assert(b.chain(b.head()).map(_.op) === Vector("genesis", "init", "append"))
  }

  test("two instances: appends from both land — the storage CAS rebases the loser") {
    val dir = freshDir()
    val a = DurableManifestLog.open(dir)
    val b = DurableManifestLog.open(dir) // opened at genesis, BEFORE a's commits
    val v1 = init(a, "seed")
    // b's view is stale; its tryCommit refreshes, validates, lands
    val ob = b.tryCommit("main", v1, "append", add = Seq(f("fromB")))
    val oa = a.tryCommit("main", v1, "append", add = Seq(f("fromA")))
    assert(ob.isInstanceOf[Committed] && oa.isInstanceOf[Committed])
    assert(a.liveFiles(a.head()) === Set(f("seed"), f("fromA"), f("fromB")))
    assert(b.liveFiles(b.head()) === a.liveFiles(a.head()))
  }

  test("two instances: disjoint remove sets rebase, overlapping ones abort with the overlap") {
    val dir = freshDir()
    val a = DurableManifestLog.open(dir)
    val b = DurableManifestLog.open(dir)
    val v1 = init(a, "x", "y", "z")
    assert(a.tryCommit("main", v1, "rewrite", add = Seq(f("x2")), remove = Seq(f("x"))).isInstanceOf[Committed])
    // b staged against v1; its removes are disjoint from a's → rebases
    b.tryCommit("main", v1, "rewrite", add = Seq(f("y2")), remove = Seq(f("y"))) match {
      // rebased: the commit's parent is a's intervening rewrite (v2),
      // not the stale read point v1
      case Committed(v, _) => assert(b.chain(v).last.parent === 2L)
      case o               => fail(s"disjoint cross-instance loser must rebase and commit, got $o")
    }
    // a second b-writer whose remove overlaps a's rewrite → aborts
    b.tryCommit("main", v1, "delete", add = Seq(f("x3")), remove = Seq(f("x"))) match {
      case Conflicted(ov, _) => assert(ov === Set(f("x")))
      case o                 => fail(s"overlapping cross-instance writer must abort, got $o")
    }
    assert(a.liveFiles(a.head()) === Set(f("x2"), f("y2"), f("z")))
  }

  test("N real threads over TWO instances: every append lands exactly once, versions distinct") {
    val dir = freshDir()
    val a = DurableManifestLog.open(dir)
    val b = DurableManifestLog.open(dir)
    val v1 = init(a, "seed")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[ManifestLog.Outcome]()
    val threads = (1 to 8).map { i =>
      val log = if (i % 2 == 0) a else b
      new Thread(() => { results.add(log.tryCommit("main", v1, "append", add = Seq(f(s"n$i")), maxAttempts = 32)); () })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val outcomes = { import scala.jdk.CollectionConverters._; results.asScala.toVector }
    assert(outcomes.forall(_.isInstanceOf[Committed]), outcomes.toString)
    assert(outcomes.collect { case Committed(v, _) => v }.toSet.size === 8)
    val expected = Set(f("seed")) ++ (1 to 8).map(i => f(s"n$i"))
    assert(a.liveFiles(a.head()) === expected)
    assert(DurableManifestLog.open(dir).liveFiles(a.head()) === expected)
  }

  test("torn tail: a crash-shaped partial entry is ignored on replay and recovered by the next writer") {
    val dir = freshDir()
    val a = DurableManifestLog.open(dir)
    val v1 = init(a, "a")
    val headBefore = a.head()
    // a writer died mid-write: half a JSON object at the next seq
    val torn = """{"kind":"commit","branch":"main","commit":{"version":99,"pa"""
    assert(GraftFs.createExclusive(f"$dir/_log/${2L}%020d.json", torn.getBytes(StandardCharsets.UTF_8)))
    // a fresh instance replays past it: the crash simply didn't commit
    val b = DurableManifestLog.open(dir)
    assert(b.head() === headBefore)
    assert(b.liveFiles(b.head()) === Set(f("a")))
    // the next writer reclaims the torn number and lands
    assert(b.tryCommit("main", v1, "append", add = Seq(f("b"))).isInstanceOf[Committed])
    assert(b.liveFiles(b.head()) === Set(f("a"), f("b")))
    assert(DurableManifestLog.open(dir).liveFiles(b.head()) === Set(f("a"), f("b")))
  }

  test("torn recovery is lock-serialized: a held rec-lock blocks deletion; a stale one is taken over") {
    val dir = freshDir()
    val a = DurableManifestLog.open(dir)
    val v1 = init(a, "a")
    val torn = """{"kind":"commit","branch":"main","commit":{"version":99,"pa"""
    assert(GraftFs.createExclusive(f"$dir/_log/${2L}%020d.json", torn.getBytes(StandardCharsets.UTF_8)))
    // another recoverer "holds" the lock (fresh mtime): no writer may
    // delete the torn entry or claim its number while it stands
    assert(GraftFs.createExclusive(f"$dir/_log/rec-${2L}%020d.lock", "other".getBytes(StandardCharsets.UTF_8)))
    val b = DurableManifestLog.open(dir)
    val blocked = b.tryCommit("main", v1, "append", add = Seq(f("b")), maxAttempts = 3)
    assert(blocked.isInstanceOf[Conflicted], s"a held recovery lock must block the claim, got $blocked")
    assert(GraftFs.exists(f"$dir/_log/${2L}%020d.json"), "the torn entry must NOT be deleted under a held lock")
    // the lock goes stale (its owner crashed): the takeover grace
    // elapses and the next writer recovers and lands
    val oldGrace = DurableManifestLog.recoveryGraceMs
    DurableManifestLog.recoveryGraceMs = -1L
    try {
      val out = b.tryCommit("main", v1, "append", add = Seq(f("b")), maxAttempts = 5)
      assert(out.isInstanceOf[Committed], out.toString)
    } finally DurableManifestLog.recoveryGraceMs = oldGrace
    assert(b.liveFiles(b.head()) === Set(f("a"), f("b")))
    assert(!GraftFs.exists(f"$dir/_log/rec-${2L}%020d.lock"), "the recovery lock must be released")
    assert(DurableManifestLog.open(dir).liveFiles(b.head()) === Set(f("a"), f("b")))
  }

  test("a commit mixing deletion vectors with file adds/removes refuses at COMMIT time on both transports") {
    val dir = freshDir()
    val d = DurableManifestLog.open(dir)
    val v1 = init(d, "a")
    val eD = intercept[IllegalArgumentException](
      d.tryCommit("main", v1, "mixed", add = Seq(f("n")), dvAdd = Seq(FileRef("dv", "x")))
    )
    assert(eD.getMessage.contains("pure-DV or pure-file"), eD.getMessage)
    val m = new ManifestLog
    val eM = intercept[IllegalArgumentException](
      m.tryCommit("main", 0L, "mixed", remove = Seq(f("a")), dvAdd = Seq(FileRef("dv", "x")))
    )
    assert(eM.getMessage.contains("pure-DV or pure-file"), eM.getMessage)
    // pure shapes still land: DV-only and file-only
    assert(d.tryCommit("main", v1, "dv_only", dvAdd = Seq(FileRef("dv", "x"))).isInstanceOf[Committed])
    assert(d.tryCommit("main", d.head(), "file_only", add = Seq(f("n"))).isInstanceOf[Committed])
  }

  test("idempotent txn watermarks: a replayed (app, version) is AlreadyApplied — cross-instance, and across expiration") {
    val dir = freshDir()
    val a = DurableManifestLog.open(dir)
    assert(a.tryCommit("main", 0L, "append", add = Seq(f("b0")), txn = Some(("app", 0L))).isInstanceOf[Committed])
    assert(a.tryCommit("main", a.head(), "append", add = Seq(f("b1")), txn = Some(("app", 1L))).isInstanceOf[Committed])
    assert(a.txnVersion("app") === Some(1L))
    // the crash-restart shape: a FRESH instance replays batch 1
    val b = DurableManifestLog.open(dir)
    b.tryCommit("main", b.head(), "append", add = Seq(f("b1x")), txn = Some(("app", 1L))) match {
      case ManifestLog.AlreadyApplied(wm, _) => assert(wm === 1L)
      case other                             => fail(s"replay must be AlreadyApplied, got $other")
    }
    assert(b.liveFiles(b.head()) === Set(f("b0"), f("b1")), "the replay must publish nothing")
    // an UNRELATED app is not blocked; a HIGHER version lands
    assert(b.tryCommit("main", b.head(), "append", add = Seq(f("c0")), txn = Some(("other", 0L))).isInstanceOf[Committed])
    assert(b.tryCommit("main", b.head(), "append", add = Seq(f("b2")), txn = Some(("app", 2L))).isInstanceOf[Committed])
    // watermarks survive snapshot expiration via the checkpoint
    val head = b.head()
    b.expireBefore(head)
    val c = DurableManifestLog.open(dir)
    assert(c.txnVersion("app") === Some(2L), "the checkpoint must carry the accumulated watermark")
    assert(c.txnVersion("other") === Some(0L))
    c.tryCommit("main", c.head(), "append", add = Seq(f("b2x")), txn = Some(("app", 2L))) match {
      case ManifestLog.AlreadyApplied(wm, _) => assert(wm === 2L)
      case other                             => fail(s"post-expiration replay must be AlreadyApplied, got $other")
    }
  }

  test("torn entry with complete entries AFTER it is corruption, not a skip — fails loudly") {
    val dir = freshDir()
    val a = DurableManifestLog.open(dir)
    val v1 = init(a, "a")
    a.tryCommit("main", v1, "append", add = Seq(f("b")))
    // truncate the MIDDLE entry in place (storage corruption, not a crash)
    val p = f"$dir/_log/${1L}%020d.json"
    val bytes = GraftFs.readBytes(p)
    GraftFs.delete(p)
    val out = new java.io.FileOutputStream(p.stripPrefix("file:"))
    out.write(bytes, 0, bytes.length / 2); out.close()
    val e = intercept[RuntimeException](DurableManifestLog.open(dir))
    assert(e.getMessage.contains("corruption"), e.getMessage)
  }

  test("tag immutability holds ACROSS instances: the second tagger refuses pre-persist") {
    val dir = freshDir()
    val a = DurableManifestLog.open(dir)
    val b = DurableManifestLog.open(dir)
    val v1 = init(a, "a")
    a.tag("audit", v1)
    assertThrows[IllegalArgumentException](b.tag("audit", v1))
    // and the refusal persisted nothing: a fresh open has one tag op
    assert(DurableManifestLog.open(dir).refs === Map("main" -> v1, "audit" -> v1))
  }

  test("branch staging and fast-forward publish work across instances") {
    val dir = freshDir()
    val a = DurableManifestLog.open(dir)
    val v1 = init(a, "a")
    a.createBranch("wap", v1)
    val b = DurableManifestLog.open(dir)
    val Committed(w2, _) = b.tryCommit("wap", v1, "stage", add = Seq(f("s"))): @unchecked
    assert(!a.liveFiles(a.head("main")).contains(f("s")))
    val pub = a.fastForward("main", "wap")
    assert(pub === w2)
    assert(DurableManifestLog.open(dir).liveFiles(pub) === Set(f("a"), f("s")))
  }

  test("expiration checkpoints: replay comes off the checkpoint, expired reads refuse, orphans match") {
    val dir = freshDir()
    val a = DurableManifestLog.open(dir)
    val v1 = init(a, "a", "b")
    val Committed(v2, _) =
      a.tryCommit("main", v1, "rewrite", add = Seq(f("a2")), remove = Seq(f("a")),
        stats = Map(f("a2") -> FileStats(0L, 9L, 10L))): @unchecked
    val Committed(v3, _) = a.tryCommit("main", v2, "append", add = Seq(f("c"))): @unchecked
    val orphans = a.expireBefore(v2)
    assert(orphans === Set(f("a")))
    // the squashed-away entry files are gone; a fresh open replays
    // from the checkpoint alone and serves every retained version
    val names = GraftFs.listFiles(s"$dir/_log")
    assert(names.exists(_.startsWith("chk-")), names.toString)
    assert(!names.contains(f"${1L}%020d.json"), s"squashed entries must be cleaned up: $names")
    val b = DurableManifestLog.open(dir)
    assert(b.liveFiles(v2) === Set(f("a2"), f("b")))
    assert(b.liveFiles(v3) === Set(f("a2"), f("b"), f("c")))
    assert(b.liveStats(v2) === Map(f("a2") -> FileStats(0L, 9L, 10L)))
    assertThrows[RuntimeException](b.liveFiles(v1))
    // and the log keeps accepting commits after the squash
    assert(b.tryCommit("main", v3, "append", add = Seq(f("d"))).isInstanceOf[Committed])
    assert(a.liveFiles(a.head()) === Set(f("a2"), f("b"), f("c"), f("d")))
  }

  test("expiration refusals (pinned ref / forked branch) persist nothing — other instances unaffected") {
    val dir = freshDir()
    val a = DurableManifestLog.open(dir)
    val v1 = init(a, "a")
    val Committed(v2, _) = a.tryCommit("main", v1, "append", add = Seq(f("b"))): @unchecked
    a.tag("pin", v1)
    val seqBefore = a.entrySeq
    assertThrows[IllegalArgumentException](a.expireBefore(v2))
    assert(a.entrySeq === seqBefore)
    val b = DurableManifestLog.open(dir)
    assert(b.liveFiles(v1) === Set(f("a")))
  }

  test("parity under expiration: random streams with periodic expire+reopen keep both transports identical") {
    val dir = freshDir()
    val mem = new ManifestLog
    var dur = DurableManifestLog.open(dir)
    val rnd = new scala.util.Random(7)
    var live = Set.empty[String]
    (1 to 24).foreach { i =>
      val adds = (0 until 1 + rnd.nextInt(2)).map(j => s"f${i}_$j").toSet
      val removes = rnd.shuffle(live.toList).take(rnd.nextInt(2)).toSet
      val om = mem.tryCommit("main", mem.head(), "op", add = adds.toSeq.sorted.map(f), remove = removes.toSeq.sorted.map(f))
      val od = dur.tryCommit("main", dur.head(), "op", add = adds.toSeq.sorted.map(f), remove = removes.toSeq.sorted.map(f))
      assert(om === od, s"step $i diverged")
      live = (live -- removes) ++ adds
      if (i % 8 == 0) {
        val horizon = mem.head() - 2
        if (horizon > 0) {
          val orphM = mem.expireBefore(horizon)
          val orphD = dur.expireBefore(horizon)
          assert(orphM === orphD, s"expire at $horizon diverged")
          // reopen from disk: the checkpointed replay must agree
          dur = DurableManifestLog.open(dir)
          assert(dur.head() === mem.head())
          assert(dur.versions.toSet === mem.versions.toSet)
          mem.versions.foreach(v => assert(dur.liveFiles(v) === mem.liveFiles(v), s"v$v diverged after reopen"))
        }
      }
    }
    assert(DurableManifestLog.open(dir).liveFiles(dur.head()) === mem.liveFiles(mem.head()))
  }

  test("parity: a random command stream lands identically on the in-JVM and durable transports") {
    val dir = freshDir()
    val mem = new ManifestLog
    val dur = DurableManifestLog.open(dir)
    val rnd = new scala.util.Random(42)
    var live = Set.empty[String]
    (1 to 30).foreach { i =>
      val adds = (0 until rnd.nextInt(3)).map(j => s"f${i}_$j").toSet
      val removes = rnd.shuffle(live.toList).take(rnd.nextInt(2)).toSet
      val stale = rnd.nextBoolean()
      val readV = if (stale && mem.head() > 1) mem.head() - 1 else mem.head()
      // the r13 metadata fields ride some commits: a pinned wall-clock
      // (monotone) and an occasional schema action — both must land
      // and replay identically on the two transports
      val ts = i * 1000L
      val schemaJson = if (i % 7 == 0) Some(s"""{"v":$i}""") else None
      val om = mem.tryCommit(
        "main", readV, "op",
        add = adds.toSeq.sorted.map(f), remove = removes.toSeq.sorted.map(f), ts = ts, schemaJson = schemaJson)
      val od = dur.tryCommit(
        "main", readV, "op",
        add = adds.toSeq.sorted.map(f), remove = removes.toSeq.sorted.map(f), ts = ts, schemaJson = schemaJson)
      assert(om === od, s"step $i: transports diverged ($om vs $od)")
      om match {
        case Committed(_, _) => live = (live -- removes) ++ adds
        case _               => ()
      }
    }
    assert(mem.liveFiles(mem.head()) === dur.liveFiles(dur.head()))
    val reopened = DurableManifestLog.open(dir)
    assert(reopened.liveFiles(dur.head()) === mem.liveFiles(mem.head()))
    // ts and schema actions replay identically from disk: timestamp
    // resolution and per-version schemas agree across transports
    (1L to mem.head()).foreach { v =>
      assert(reopened.schemaAt(v) === mem.schemaAt(v), s"schemaAt($v) diverged after replay")
    }
    Seq(500L, 1000L, 15500L, 30000L, 99999L).foreach { t =>
      val a = try Right(mem.versionAtTimestamp(t)) catch { case e: RuntimeException => Left(e.getMessage != null) }
      val b = try Right(reopened.versionAtTimestamp(t)) catch { case e: RuntimeException => Left(e.getMessage != null) }
      assert(a === b, s"versionAtTimestamp($t) diverged after replay")
    }
  }
}

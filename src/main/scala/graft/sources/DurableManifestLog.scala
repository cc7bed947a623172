package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import ManifestLog.{Commit, Committed, Conflicted, FileRef, FileStats, Outcome}

/** The [[ManifestLog]] made DURABLE and CROSS-PROCESS: the same OCC /
  * change-derivation / named-refs semantics, with the compare-and-set
  * moved from an in-JVM `AtomicReference` onto SHARED STORAGE — so two
  * driver PROCESSES over one table directory contend through the
  * filesystem instead of silently forking private logs (the r11
  * verdict's top gap).
  *
  * Storage layout (all under `<dir>/_log/`, via the [[GraftFs]] seam
  * so the same code runs on HDFS/S3A/GCS):
  *
  *   - `%020d.json` — one numbered ENTRY per mutation, in claim
  *     order: a data commit, a ref operation, or an expiration. The
  *     entry number namespace is the CAS: a writer computes its
  *     intent against the replayed state at entry N and publishes by
  *     `create-fails-if-exists` of entry N+1 ([[GraftFs.createExclusive]]
  *     — one namenode op on HDFS, a conditional PUT on an object
  *     store). A loser's create fails; it re-reads the new entries,
  *     re-VALIDATES (the exact [[ManifestLog]] conflict rule: disjoint
  *     removed sets rebase, overlapping ones abort loudly), and
  *     retries with the next number. This is Delta's `_delta_log`
  *     commit protocol with graft's validation semantics.
  *   - `chk-%020d.json` — a full-state checkpoint written after an
  *     expiration entry lands, so replay cost stays bounded by the
  *     RETAINED history: open loads the newest verified checkpoint
  *     and replays only the entries after it, and the squashed-away
  *     entry files are deleted (after the checkpoint is read back and
  *     verified, so no crash window can strand a reader).
  *
  * Crash safety: every entry ends with a terminal `"eof":true` field.
  * A writer that dies mid-write leaves a TORN file; replay ignores a
  * torn entry at the TAIL (the crash simply didn't commit — exactly
  * a lost CAS) and the next writer deletes it before re-claiming the
  * number. A torn entry with entries AFTER it can only mean storage
  * corruption — that fails loudly, never a silent skip.
  *
  * Concurrency model: cross-instance (and cross-process) safety comes
  * from the storage CAS alone. Within one instance, mutations and
  * refreshes are `synchronized` — the log is driver-side metadata
  * (a handful of file names and longs per entry), so a monitor is
  * cheap and keeps the replayed cache trivially consistent.
  *
  * All query semantics — conflict validation, live-set replay, zone
  * maps, refs, expiration planning — are DELEGATED to an inner
  * replayed [[ManifestLog]], so the two transports cannot drift:
  * there is exactly one implementation of the protocol, and this
  * class only adds persistence and recovery around it.
  *
  * Reference shape: `app.py:649-740`'s retry-the-insert loop, now
  * retry-the-commit against shared storage.
  */
final class DurableManifestLog private (val dir: String) {
  private val logDir = s"$dir/_log"
  private val mapper = new ObjectMapper()

  // replayed state: the entry seq the inner log reflects, the inner
  // log itself, and (if present) the torn tail entry awaiting recovery
  // — its number AND the exact bytes observed, so recovery can refuse
  // to delete anything it did not itself diagnose as torn
  private var seq: Long = 0L
  private var inner: ManifestLog = new ManifestLog
  private var tornTail: Option[(Long, Array[Byte])] = None

  GraftFs.mkdirs(logDir)
  refresh()

  private def entryPath(n: Long): String = f"$logDir/$n%020d.json"
  private def chkPath(n: Long): String = f"$logDir/chk-$n%020d.json"

  // ---------- encoding ----------

  private def refArr(fs: Iterable[FileRef]): ArrayNode = {
    val a = mapper.createArrayNode()
    fs.foreach { r =>
      val o = a.addObject()
      o.put("d", r.dir)
      o.put("f", r.file)
      ()
    }
    a
  }

  private def readRefs(n: JsonNode): Vector[FileRef] = {
    val b = Vector.newBuilder[FileRef]
    n.forEach(o => b += FileRef(o.get("d").asText(), o.get("f").asText()))
    b.result()
  }

  private def commitNode(c: Commit): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("version", c.version)
    o.put("parent", c.parent)
    o.put("op", c.op)
    o.put("ts", c.ts)
    c.schemaJson.foreach { sj => o.put("schema", sj); () }
    if (c.txns.nonEmpty) {
      val tx = o.putObject("txns")
      c.txns.toSeq.sortBy(_._1).foreach { case (app, v) => tx.put(app, v); () }
    }
    o.set[JsonNode]("added", refArr(c.added))
    o.set[JsonNode]("removed", refArr(c.removed))
    o.set[JsonNode]("dvAdded", refArr(c.dvAdded))
    o.set[JsonNode]("cdc", refArr(c.cdc))
    val st = o.putArray("stats")
    c.stats.toSeq.sortBy(e => (e._1.dir, e._1.file)).foreach { case (r, s) =>
      val e = st.addObject()
      e.put("d", r.dir); e.put("f", r.file)
      e.put("min", s.min); e.put("max", s.max); e.put("rows", s.rows)
      if (s.bytes > 0L) { e.put("bytes", s.bytes); () }
      if (s.cols.nonEmpty) {
        val ca = e.putArray("cols")
        s.cols.toSeq.sortBy(_._1).foreach { case (cn, cs) =>
          val co = ca.addObject()
          co.put("c", cn); co.put("mn", cs.min); co.put("mx", cs.max); co.put("nl", cs.nulls)
          ()
        }
      }
      ()
    }
    val dv = o.putArray("dvRows")
    c.dvRows.toSeq.sortBy(e => (e._1.dir, e._1.file)).foreach { case (r, n) =>
      val e = dv.addObject()
      e.put("d", r.dir); e.put("f", r.file); e.put("n", n)
      ()
    }
    o
  }

  private def readCommit(o: JsonNode): Commit = {
    val stats = Map.newBuilder[FileRef, FileStats]
    o.get("stats").forEach { e =>
      val cols = Map.newBuilder[String, ManifestLog.ColStats]
      if (e.hasNonNull("cols"))
        e.get("cols").forEach { co =>
          cols += co.get("c").asText() ->
            ManifestLog.ColStats(co.get("mn").asLong(), co.get("mx").asLong(), co.get("nl").asLong())
        }
      stats += FileRef(e.get("d").asText(), e.get("f").asText()) ->
        FileStats(
          e.get("min").asLong(), e.get("max").asLong(), e.get("rows").asLong(), cols.result(),
          bytes = if (e.hasNonNull("bytes")) e.get("bytes").asLong() else 0L)
    }
    val dvRows = Map.newBuilder[FileRef, Long]
    o.get("dvRows").forEach { e =>
      dvRows += FileRef(e.get("d").asText(), e.get("f").asText()) -> e.get("n").asLong()
    }
    Commit(
      o.get("version").asLong(),
      o.get("parent").asLong(),
      o.get("op").asText(),
      readRefs(o.get("added")),
      readRefs(o.get("removed")),
      readRefs(o.get("dvAdded")),
      stats.result(),
      dvRows.result(),
      readRefs(o.get("cdc")),
      ts = if (o.hasNonNull("ts")) o.get("ts").asLong() else 0L,
      schemaJson = if (o.hasNonNull("schema")) Some(o.get("schema").asText()) else None,
      txns = if (!o.hasNonNull("txns")) Map.empty
      else {
        val b = Map.newBuilder[String, Long]
        o.get("txns").properties().forEach(e => b += e.getKey -> e.getValue.asLong())
        b.result()
      }
    )
  }

  /** Serialize with the torn-write guard LAST: Jackson preserves field
    * insertion order, so `"eof":true` is physically the final bytes —
    * a partial write cannot parse AND carry it.
    */
  private def sealed_(o: ObjectNode): Array[Byte] = {
    o.put("eof", true)
    mapper.writeValueAsBytes(o)
  }

  private def parseEntry(bytes: Array[Byte]): Option[JsonNode] =
    try {
      val n = mapper.readTree(bytes)
      if (n != null && n.hasNonNull("eof") && n.get("eof").asBoolean()) Some(n) else None
    } catch { case _: Exception => None }

  // ---------- replay ----------

  /** Apply one parsed entry to `log` — the single dispatch both
    * replay-on-open and post-persist application run, so a replayed
    * log and the writer's live view cannot diverge.
    */
  private def applyEntry(log: ManifestLog, e: JsonNode): Unit = e.get("kind").asText() match {
    case "commit"     => log.install(e.get("branch").asText(), readCommit(e.get("commit")))
    case "tag"        => log.tag(e.get("name").asText(), e.get("version").asLong())
    case "dropTag"    => log.dropTag(e.get("name").asText())
    case "branch"     => log.createBranch(e.get("name").asText(), e.get("at").asLong())
    case "dropBranch" => log.dropBranch(e.get("name").asText())
    case "fastForward" =>
      log.fastForward(e.get("to").asText(), e.get("from").asText())
      ()
    case "expire" =>
      log.expireBefore(e.get("horizon").asLong())
      ()
    case other => sys.error(s"unknown manifest log entry kind '$other'")
  }

  /** Bring the replayed state up to the storage head: list the log
    * dir once, load a newer checkpoint if one landed, then apply
    * every complete entry after our seq in order. A torn entry at the
    * tail is remembered for recovery and NOT applied; a torn entry
    * with complete entries after it is corruption and fails loudly.
    * A file deleted between list and read (a concurrent checkpoint
    * cleanup) restarts the replay — bounded retries, then loud.
    */
  private def refresh(): Unit = synchronized {
    var retries = 0
    var done = false
    while (!done) {
      try {
        val names = GraftFs.listFiles(logDir)
        val entrySeqs = names.collect { case s if s.matches("\\d{20}\\.json") => s.stripSuffix(".json").toLong }.sorted
        val chkSeqs = names.collect { case s if s.matches("chk-\\d{20}\\.json") => s.stripPrefix("chk-").stripSuffix(".json").toLong }.sorted
        // a checkpoint newer than our replay: reload state from it
        // (it may describe a squash that DELETED entries we'd need)
        chkSeqs.reverse.find(_ > seq).foreach { cs =>
          parseEntry(GraftFs.readBytes(chkPath(cs))) match {
            case Some(chk) =>
              val commits = Map.newBuilder[Long, Commit]
              chk.get("commits").forEach(c => commits += c.get("version").asLong() -> readCommit(c))
              val branches = Map.newBuilder[String, Long]
              chk.get("branches").properties().forEach(e => branches += e.getKey -> e.getValue.asLong())
              val tags = Map.newBuilder[String, Long]
              chk.get("tags").properties().forEach(e => tags += e.getKey -> e.getValue.asLong())
              val l = new ManifestLog
              l.installState(commits.result(), branches.result(), tags.result(), chk.get("nextVersion").asLong())
              inner = l
              seq = cs
            case None => () // torn checkpoint: ignore — entries still replay
          }
        }
        val pending = entrySeqs.filter(_ > seq)
        tornTail = None
        pending.zipWithIndex.foreach { case (n, i) =>
          val bytes = GraftFs.readBytes(entryPath(n))
          parseEntry(bytes) match {
            case Some(e) =>
              require(n == seq + 1, s"manifest log gap: expected entry ${seq + 1}, found $n")
              applyEntry(inner, e)
              seq = n
            case None =>
              if (i == pending.length - 1) tornTail = Some((n, bytes)) // crash-shaped tail: not committed
              else sys.error(s"manifest log corruption: torn entry $n has complete entries after it")
          }
        }
        done = true
      } catch {
        case _: java.io.FileNotFoundException if retries < 5 => retries += 1
      }
    }
  }

  /** Claim entry `n` with `bytes` — recovering a known torn tail at
    * `n` first (crash recovery: the dead writer never committed, its
    * half-written claim is void). Returns whether WE created it.
    *
    * Recovery is SERIALIZED through a one-shot lock file
    * (`rec-<n>.lock`, claimed by the same createExclusive CAS as
    * entries), because a bare read-then-delete races other RECOVERERS:
    * two processes that both observed the same torn entry could
    * interleave so that A re-reads it as still-torn while B deletes it
    * and publishes a VALID entry at `n` — then A's delete erases B's
    * acknowledged commit (the r13 advice finding). Under the marker:
    * no in-protocol writer can delete (and hence no valid entry can
    * land at a torn `n`) without first winning the lock, and the
    * winner additionally re-reads and deletes ONLY byte-identical
    * still-torn content. A recoverer that crashes holding the lock is
    * taken over after a grace window ([[DurableManifestLog
    * .recoveryGraceMs]]) — the sole residual window is an in-protocol
    * recoverer stalling LONGER than the grace between its byte-check
    * and delete, plus writers already outside the protocol (under the
    * write-temp-then-link publication a torn entry can never appear
    * at a final name in-protocol; this path exists for their debris).
    */
  private def claim(n: Long, bytes: Array[Byte]): Boolean = {
    tornTail match {
      case Some((tn, observed)) if tn == n =>
        tornTail = None
        if (!recoverTorn(n, observed)) return false // lost CAS: caller refreshes and re-observes
      case _ => ()
    }
    GraftFs.createExclusive(entryPath(n), bytes)
  }

  /** Recover the torn entry at `n` (observed as `observed` bytes) —
    * true iff the entry number is now free to claim. See [[claim]].
    */
  private def recoverTorn(n: Long, observed: Array[Byte]): Boolean = {
    val marker = f"$logDir/rec-$n%020d.lock"
    if (!GraftFs.createExclusive(marker, java.util.UUID.randomUUID().toString.getBytes("UTF-8"))) {
      // another recoverer holds the lock; steal only a stale one (its
      // owner crashed mid-recovery) after the grace window
      val mt = GraftFs.modificationTime(marker)
      if (mt > 0L && System.currentTimeMillis() - mt > DurableManifestLog.recoveryGraceMs) {
        GraftFs.delete(marker)
        ()
      }
      return false
    }
    try {
      val now =
        try Some(GraftFs.readBytes(entryPath(n)))
        catch { case _: java.io.IOException => None }
      now match {
        case None => true // already recovered and not yet re-claimed: free
        case Some(b) =>
          if (parseEntry(b).isDefined) false // a valid entry landed at n — lost CAS
          else if (!java.util.Arrays.equals(b, observed)) false // different torn content: re-observe first
          else {
            GraftFs.delete(entryPath(n)) // still the exact torn debris we diagnosed, and we hold the lock
            true
          }
      }
    } finally {
      GraftFs.delete(marker)
      ()
    }
  }

  // ---------- mutations ----------

  /** OCC publish, cross-process: validate against the replayed head,
    * stamp the next version, claim the next entry number. A lost
    * claim re-reads and re-validates — the same rebase-or-abort
    * matrix as [[ManifestLog.tryCommit]], with storage as the CAS.
    */
  def tryCommit(
      branch: String,
      readVersion: Long,
      op: String,
      add: Seq[FileRef] = Seq.empty,
      remove: Seq[FileRef] = Seq.empty,
      dvAdd: Seq[FileRef] = Seq.empty,
      maxAttempts: Int = 10,
      stats: Map[FileRef, FileStats] = Map.empty,
      dvRows: Map[FileRef, Long] = Map.empty,
      cdc: Seq[FileRef] = Seq.empty,
      strict: Boolean = false,
      // commit wall-clock (epoch millis): -1 = stamp from the clock
      // seam at publish time; an explicit value pins it (fixtures)
      ts: Long = -1L,
      schemaJson: Option[String] = None,
      // idempotent-writer claim (appId, batchVersion): refused as
      // [[ManifestLog.AlreadyApplied]] when the replayed chain's
      // watermark is already ≥ batchVersion. Re-checked after every
      // lost claim, so the check is atomic with the storage CAS.
      txn: Option[(String, Long)] = None
  ): Outcome = synchronized {
    ManifestLog.requirePureShape(op, add, remove, dvAdd)
    val stamp = if (ts >= 0L) ts else DurableManifestLog.clockNow()
    var attempts = 0
    while (attempts < maxAttempts) {
      attempts += 1
      refresh()
      inner.validateCommit(branch, readVersion, remove.toSet, strict) match {
        case Left(overlap) => return Conflicted(overlap, attempts)
        case Right(headV) =>
          txn.foreach { case (app, bv) =>
            val wm = inner.txnWatermarksIn(inner.chain(headV)).getOrElse(app, Long.MinValue)
            if (wm >= bv) return ManifestLog.AlreadyApplied(wm, attempts)
          }
          val commit = Commit(
            inner.nextVersionNow, headV, op,
            add.toVector, remove.toVector, dvAdd.toVector, stats, dvRows, cdc.toVector,
            ts = stamp, schemaJson = schemaJson,
            txns = txn.map { case (app, bv) => Map(app -> bv) }.getOrElse(Map.empty)
          )
          val o = mapper.createObjectNode()
          o.put("kind", "commit")
          o.put("branch", branch)
          o.set[JsonNode]("commit", commitNode(commit))
          if (claim(seq + 1, sealed_(o))) {
            inner.install(branch, commit)
            seq += 1
            return Committed(commit.version, attempts)
          }
        // lost the storage CAS: loop — refresh sees the winner
      }
    }
    Conflicted(Set.empty, maxAttempts)
  }

  /** A ref/maintenance op: DRY-RUN on a clone (an invalid op throws
    * here, before anything is persisted), then claim the entry, then
    * adopt the clone. A lost claim re-runs the dry-run against the
    * refreshed state — so e.g. a tag that another PROCESS just created
    * refuses loudly instead of double-landing.
    */
  private def logged[A](mk: ManifestLog => A)(entry: ObjectNode): A = synchronized {
    while (true) {
      refresh()
      val clone = inner.cloneLog
      val result = mk(clone) // throws pre-persist on an invalid op
      if (claim(seq + 1, sealed_(entry.deepCopy()))) {
        inner = clone
        seq += 1
        return result
      }
    }
    sys.error("unreachable")
  }

  def tag(name: String, version: Long): Unit = {
    val o = mapper.createObjectNode()
    o.put("kind", "tag"); o.put("name", name); o.put("version", version)
    logged(_.tag(name, version))(o)
  }

  def createBranch(name: String, at: Long): Unit = {
    val o = mapper.createObjectNode()
    o.put("kind", "branch"); o.put("name", name); o.put("at", at)
    logged(_.createBranch(name, at))(o)
  }

  def fastForward(toBranch: String, fromBranch: String): Long = {
    val o = mapper.createObjectNode()
    o.put("kind", "fastForward"); o.put("to", toBranch); o.put("from", fromBranch)
    logged(_.fastForward(toBranch, fromBranch))(o)
  }

  def dropTag(name: String): Unit = {
    val o = mapper.createObjectNode()
    o.put("kind", "dropTag"); o.put("name", name)
    logged(_.dropTag(name))(o)
  }

  def dropBranch(name: String): Unit = {
    val o = mapper.createObjectNode()
    o.put("kind", "dropBranch"); o.put("name", name)
    logged(_.dropBranch(name))(o)
  }

  /** Snapshot expiration, durable: the entry records only the horizon
    * (replay re-derives the squash deterministically), and once it
    * lands a full-state CHECKPOINT is written so future opens never
    * replay the squashed-away prefix — whose entry files are then
    * deleted, AFTER the checkpoint is read back and verified (a crash
    * between checkpoint and cleanup leaves a recoverable log either
    * way). Returns the vacuum-eligible set, exactly
    * [[ManifestLog.expireBefore]]'s.
    */
  def expireBefore(horizon: Long): Set[FileRef] = synchronized {
    val o = mapper.createObjectNode()
    o.put("kind", "expire"); o.put("horizon", horizon)
    val orphans = logged(_.expireBefore(horizon))(o)
    // checkpoint at the expire entry's seq; content is a pure function
    // of the log state, so a concurrent writer of the same name would
    // write identical bytes — a lost create is ignorable
    val (commits, branches, tags, nextVersion) = inner.stateSnapshot
    val chk = mapper.createObjectNode()
    chk.put("kind", "chk")
    chk.put("seq", seq)
    val ca = chk.putArray("commits")
    commits.toSeq.sortBy(_._1).foreach { case (_, c) => ca.add(commitNode(c)); () }
    val bo = chk.putObject("branches")
    branches.foreach { case (k, v) => bo.put(k, v); () }
    val to = chk.putObject("tags")
    tags.foreach { case (k, v) => to.put(k, v); () }
    chk.put("nextVersion", nextVersion)
    val path = chkPath(seq)
    if (!GraftFs.exists(path)) {
      GraftFs.createExclusive(path, sealed_(chk))
      ()
    }
    // cleanup only once the checkpoint verifiably replays
    if (parseEntry(GraftFs.readBytes(path)).isDefined) {
      GraftFs.listFiles(logDir).foreach { n =>
        if (n.matches("\\d{20}\\.json") && n.stripSuffix(".json").toLong <= seq)
          GraftFs.delete(s"$logDir/$n")
        // earlier checkpoints are superseded too
        if (n.matches("chk-\\d{20}\\.json") && n.stripPrefix("chk-").stripSuffix(".json").toLong < seq)
          GraftFs.delete(s"$logDir/$n")
      }
    }
    orphans
  }

  // ---------- reads (refresh, then delegate to the replayed log) ----------

  private def view: ManifestLog = synchronized { refresh(); inner }

  def head(branch: String = "main"): Long = view.head(branch)
  def tagVersion(name: String): Long = view.tagVersion(name)
  def versionAtTimestamp(tsMillis: Long, branch: String = "main"): Long =
    view.versionAtTimestamp(tsMillis, branch)
  def schemaAt(version: Long): Option[String] = view.schemaAt(version)
  def txnVersion(appId: String, branch: String = "main"): Option[Long] = view.txnVersion(appId, branch)
  def versions: Seq[Long] = view.versions
  def chain(version: Long): Vector[Commit] = view.chain(version)
  def liveFiles(version: Long): Set[FileRef] = view.liveFiles(version)
  def dvFiles(version: Long): Set[FileRef] = view.dvFiles(version)
  def liveStats(version: Long): Map[FileRef, FileStats] = view.liveStats(version)
  def liveDvRows(version: Long): Map[FileRef, Long] = view.liveDvRows(version)
  def commitsBetween(vFrom: Long, vTo: Long): Vector[Commit] = view.commitsBetween(vFrom, vTo)
  def reachableFiles: Set[FileRef] = view.reachableFiles
  def refs: Map[String, Long] = view.refs

  /** The highest entry number applied — test/introspection surface. */
  def entrySeq: Long = synchronized { refresh(); seq }
}

object DurableManifestLog {
  /** Open (or initialize) the log for the table rooted at `dir`:
    * replays `<dir>/_log` — from the newest verified checkpoint if
    * one exists — and is immediately consistent with every entry any
    * other instance (or process) has landed.
    */
  def open(dir: String): DurableManifestLog = new DurableManifestLog(dir)

  /** The commit-timestamp clock seam — `TIMESTAMP AS OF`'s write
    * side. Production leaves it alone (wall clock); a test or a
    * deterministic fixture INSTALLS a clock so commit timestamps are
    * pinned, not sampled (the determinism discipline), and restores
    * it after. JVM-global because the SQL write path reaches commits
    * through catalog-owned log instances a fixture never sees.
    */
  /** How long a crashed recoverer may hold `rec-<n>.lock` before
    * another writer takes it over (mtime-based, the vacuum-grace
    * pattern). Test seam: shrink to exercise the takeover path.
    */
  @volatile private[sources] var recoveryGraceMs: Long = 60000L

  @volatile private var clockOverride: Option[() => Long] = None
  def clockNow(): Long = clockOverride.map(_()).getOrElse(System.currentTimeMillis())
  def withClock[A](clock: () => Long)(body: => A): A = {
    clockOverride = Some(clock)
    try body
    finally clockOverride = None
  }
}

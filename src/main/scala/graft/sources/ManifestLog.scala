package graft.sources

import java.util.concurrent.atomic.AtomicReference

/** A driver-held table-format manifest log — the metadata layer the
  * lakehouse queries (q379/q396/q400/q402) each rebuilt ad hoc, now
  * one component with the three properties a real format (Delta,
  * Iceberg) actually guarantees:
  *
  *  1. OPTIMISTIC CONCURRENCY (q404). A commit is staged against the
  *     version its writer READ; publishing is one compare-and-set on
  *     the whole log state. A loser does not blindly retry: it
  *     re-validates its conflict scope against every commit that
  *     landed in between — a writer whose removed-file set is
  *     DISJOINT from the interveners' rebases and retries (its
  *     rewrite is still based on live bytes), while an OVERLAPPING
  *     writer aborts loudly (its rewrite was derived from files that
  *     no longer exist; retrying would resurrect deleted rows). This
  *     is `app.py:649-740`'s retry-the-insert loop upgraded to
  *     retry-the-commit-with-validation.
  *  2. CHANGE DERIVATION (q405). Every commit records WHAT it did —
  *     files added, files removed, deletion-vector files attached,
  *     and an operation tag — so a change-data-feed reader can
  *     reconstruct inserts/deletes/update pre/post images between any
  *     two versions from the commit records alone, touching only the
  *     files those commits name: O(|changed files|), never a table
  *     diff.
  *  3. NAMED REFS (q406). Versions form a parent tree, not a line;
  *     refs are names pointing at versions. Tags are immutable pins
  *     (the audit convention), branches move with each commit (the
  *     WAP staging surface), and reachability-from-any-ref is the
  *     retention rule vacuum enforces — so a tag genuinely protects
  *     its files and a staged branch stays invisible to `main`.
  *
  * Scale shape: the log is metadata — a handful of [[FileRef]]s and
  * longs per commit, shared by reference. Reads broadcast a live-file
  * name set; no operation here ever touches data-file contents. In a
  * real deployment the AtomicReference becomes a CAS on the log's
  * storage (an atomic rename on HDFS, a conditional PUT on S3) — the
  * validation logic is identical.
  */
object ManifestLog {
  /** One data (or deletion-vector) file: a dir under the table root
    * plus the file name within it.
    */
  final case class FileRef(dir: String, file: String)

  /** One column's footer-derived statistics: (min, max) zone plus the
    * null count — the Iceberg `lower_bounds`/`upper_bounds`/
    * `null_value_counts` triple for INT64 columns.
    */
  final case class ColStats(min: Long, max: Long, nulls: Long)

  /** Writer-computed per-file statistics — the Iceberg/Delta
    * file-stats convention: the (min, max) zone map of the table's
    * cluster key plus the file's row count, all derived during the
    * write (never a second scan). Zone maps drive planning-time file
    * skipping (q413); row counts make COUNT(*) and the key's MIN/MAX
    * answerable from the log alone (q416). `cols` generalizes the
    * zone map to EVERY integral column of the file (q432): without
    * it, skipping is blind to any predicate not on the cluster key —
    * Iceberg/Delta carry per-column bounds for exactly this reason.
    * The top-level (min, max) stay authoritative for the cluster key
    * (kept for wire compatibility with pre-cols commit records).
    */
  final case class FileStats(
      min: Long,
      max: Long,
      rows: Long,
      cols: Map[String, ColStats] = Map.empty,
      // the staged file's on-disk size, recorded at commit (one
      // getFileStatus at WRITE time) so the scan reports exact
      // post-pruning statistics to Catalyst without a planning-time
      // stat per file; 0 = unrecorded (pre-bytes commit records).
      // A file with NO recorded key zone carries the EMPTY zone
      // min = 0 > max = −1; consumers treat it as "unknown".
      bytes: Long = 0L
  )

  /** One published commit. `parent` is the version the commit applied
    * on top of — versions form a tree (branches), not a line.
    * `dvAdded` names deletion-vector files (q400's positional
    * tombstones) attached by this commit; they subtract rows from the
    * files they reference without rewriting them. `stats` carries
    * optional per-added-file [[FileStats]] so a reader can prune —
    * or outright ANSWER metadata-only aggregates — from the log,
    * never opening a footer. `dvRows` is the Delta convention that
    * keeps COUNT(*) metadata-answerable under tombstones: the number
    * of rows a DV commit tombstones PER TARGET FILE (so the count is
    * Σ file rows − Σ dvRows; MIN/MAX stay honestly ineligible).
    * `cdc` names writer-produced change-data files (Delta's
    * `_change_data`): a rewrite commit that wants to be streamable
    * stages its pre/post images as explicit rows, so a CDF reader
    * never has to key-join removed×added files at read time.
    */
  final case class Commit(
      version: Long,
      parent: Long,
      op: String,
      added: Vector[FileRef],
      removed: Vector[FileRef],
      dvAdded: Vector[FileRef],
      stats: Map[FileRef, FileStats] = Map.empty,
      dvRows: Map[FileRef, Long] = Map.empty,
      cdc: Vector[FileRef] = Vector.empty,
      // commit wall-clock (epoch millis) — `TIMESTAMP AS OF`'s axis.
      // INJECTED by the writer (the durable log stamps it from its
      // clock seam, so tests pin deterministic values), never sampled
      // here; 0 = unstamped (genesis, and pre-timestamp history),
      // which timestamp resolution treats as minus-infinity.
      ts: Long = 0L,
      // SCHEMA EVOLUTION as a metadata action, versioned like files
      // (the Delta metaData-action convention): a commit carrying
      // Some(schema JSON) sets the table schema from this version on;
      // None inherits. [[schemaAt]] resolves per version, so VERSION
      // AS OF reads serve the schema that version actually had.
      schemaJson: Option[String] = None,
      // IDEMPOTENT WRITER WATERMARKS (Delta's `txn` action): appId →
      // the highest batch version that app has applied. A writer
      // commit sets one entry; the expiration checkpoint accumulates
      // the per-app maxima so watermarks survive history squash. A
      // commit claiming (app, v) with v ≤ the chain's watermark is
      // refused as [[AlreadyApplied]] — the exactly-once contract a
      // crashed foreachBatch writer needs on restart.
      txns: Map[String, Long] = Map.empty
  )

  /** A publish attempt's outcome: the committed version and how many
    * CAS/validation rounds it took, or the overlap that killed it.
    */
  sealed trait Outcome { def attempts: Int }
  final case class Committed(version: Long, attempts: Int) extends Outcome
  final case class Conflicted(overlap: Set[FileRef], attempts: Int) extends Outcome
  /** The commit's (appId, version) watermark was already at-or-past
    * its claim — a replayed batch after a crash-restart. Nothing was
    * published; `watermark` is the chain's existing high-water mark.
    */
  final case class AlreadyApplied(watermark: Long, attempts: Int) extends Outcome

  private final case class State(
      commits: Map[Long, Commit],
      branches: Map[String, Long],
      tags: Map[String, Long],
      nextVersion: Long
  )

  /** A commit is PURE-DV (tombstones only) or PURE-FILE (adds/removes
    * only), never both — the change-feed reader derives images per
    * commit shape and a mixed commit (a rewrite that also stacks a
    * fresh DV) has no derivable change set. Enforced HERE, at commit
    * time on both transports, so a writer cannot construct the shape
    * the reader refuses (previously a reader-side `require` — the
    * invariant belongs to the log, r13 verdict nit #3).
    */
  private[sources] def requirePureShape(
      op: String,
      add: Seq[FileRef],
      remove: Seq[FileRef],
      dvAdd: Seq[FileRef]
  ): Unit =
    require(
      dvAdd.isEmpty || (add.isEmpty && remove.isEmpty),
      s"commit '$op' mixes deletion vectors (${dvAdd.size}) with file adds/removes " +
        s"(${add.size}/${remove.size}) — a commit must be pure-DV or pure-file"
    )
}

final class ManifestLog {
  import ManifestLog._

  // version 0 is the empty genesis every chain roots at
  private val state = new AtomicReference[State](
    State(
      commits = Map(0L -> Commit(0L, -1L, "genesis", Vector.empty, Vector.empty, Vector.empty)),
      branches = Map("main" -> 0L),
      tags = Map.empty,
      nextVersion = 1L
    )
  )

  def head(branch: String = "main"): Long = state.get().branches(branch)
  def tagVersion(name: String): Long = state.get().tags(name)

  /** Every version still in the log (all replayable — expiration's
    * squash keeps only resolvable commits), ascending. Vacuum's
    * retention walk and history introspection.
    */
  def versions: Seq[Long] = state.get().commits.keys.toSeq.sorted

  /** The commit chain from `version` back to genesis, oldest first. */
  def chain(version: Long): Vector[Commit] = chainIn(state.get().commits, version)

  /** Files live at `version`: replay the parent chain, each commit
    * removing then adding. Metadata-cardinality driver work.
    */
  def liveFiles(version: Long): Set[FileRef] =
    chain(version).foldLeft(Set.empty[FileRef])((live, c) => (live -- c.removed) ++ c.added)

  /** Deletion-vector files in force at `version` (tombstones
    * accumulate along the chain; a DV whose target file was removed
    * is inert but harmless — the anti-join finds nothing).
    */
  def dvFiles(version: Long): Set[FileRef] =
    chain(version).foldLeft(Set.empty[FileRef])((dvs, c) => dvs ++ c.dvAdded)

  /** Per-file zone maps for the files LIVE at `version` — replayed
    * from the commit records like [[liveFiles]]. The planning-time
    * file-skipping input: a range predicate keeps only files whose
    * (min, max) intersects it, without opening any footer. The fold
    * DROPS stats for files a commit removes, so a file removed and
    * later re-added by a stats-less commit serves NO zone map (the
    * reader degrades to keep-the-file) instead of the earlier
    * incarnation's — stale stats would silently mis-prune if the
    * re-added path held different bytes.
    */
  def liveStats(version: Long): Map[FileRef, FileStats] = {
    val live = liveFiles(version)
    chain(version).foldLeft(Map.empty[FileRef, FileStats])((m, c) => (m -- c.removed) ++ c.stats).filter {
      case (f, _) => live.contains(f)
    }
  }

  /** Per-live-file tombstone CARDINALITY in force at `version` —
    * accumulated like [[dvFiles]] (two DVs on one file sum), dropped
    * when the target file itself is removed (a rewrite absorbs its
    * tombstones). The metadata-only COUNT(*) input: Σ rows − Σ dvRows.
    */
  def liveDvRows(version: Long): Map[FileRef, Long] =
    chain(version).foldLeft(Map.empty[FileRef, Long]) { (m, c) =>
      val kept = m -- c.removed
      c.dvRows.foldLeft(kept) { case (acc, (fr, n)) => acc + (fr -> (acc.getOrElse(fr, 0L) + n)) }
    }

  /** The schema in force AT `version`: the latest schema-bearing
    * commit on its chain, None when no commit ever evolved it (the
    * caller falls back to the table's genesis schema). One chain walk
    * — metadata cardinality.
    */
  def schemaAt(version: Long): Option[String] =
    chain(version).flatMap(_.schemaJson).lastOption

  /** The idempotent-writer watermark for `appId` on `branch`: the
    * highest batch version that app ever recorded on the chain (the
    * Delta `txnVersion` read). None = the app never committed. One
    * chain walk — metadata cardinality.
    */
  def txnVersion(appId: String, branch: String = "main"): Option[Long] =
    txnWatermarksIn(chain(head(branch))).get(appId)

  private[sources] def txnWatermarksIn(c: Vector[Commit]): Map[String, Long] =
    c.foldLeft(Map.empty[String, Long]) { (m, cm) =>
      cm.txns.foldLeft(m) { case (acc, (app, v)) => acc + (app -> math.max(acc.getOrElse(app, Long.MinValue), v)) }
    }

  /** `TIMESTAMP AS OF` resolution on `branch` — the Delta/Iceberg
    * convention: the LATEST version whose commit wall-clock is
    * at-or-before `tsMillis`. A timestamp before the first stamped
    * commit refuses loudly (there was no table yet — serving genesis
    * would silently read an empty table); a timestamp after the head's
    * commit serves the head (that version WAS current then). Unstamped
    * commits (ts = 0: genesis, pre-timestamp history) resolve for any
    * query timestamp — they are at-or-before everything — except that
    * a chain with NO stamped, at-or-before commit beyond genesis
    * refuses rather than serving the empty genesis.
    */
  def versionAtTimestamp(tsMillis: Long, branch: String = "main"): Long = {
    val c = chain(head(branch))
    val eligible = c.filter(x => x.ts <= tsMillis)
    val resolved = eligible.lastOption.map(_.version).getOrElse(
      sys.error(
        s"no version at-or-before timestamp $tsMillis ms on '$branch' " +
          s"(earliest commit is at ${c.find(_.version > 0L).map(_.ts).getOrElse(0L)} ms)"
      )
    )
    require(
      resolved > 0L || c.length == 1,
      s"timestamp $tsMillis ms precedes the first commit " +
        s"(${c.find(_.version > 0L).map(_.ts).getOrElse(0L)} ms) — the table did not exist yet"
    )
    resolved
  }

  /** Commits strictly after `vFrom` up to and including `vTo`, oldest
    * first — the change-data-feed's input. `vFrom` must be an
    * ancestor of `vTo`.
    */
  def commitsBetween(vFrom: Long, vTo: Long): Vector[Commit] = {
    val c = chain(vTo)
    require(c.exists(_.version == vFrom), s"version $vFrom is not an ancestor of $vTo")
    c.dropWhile(_.version != vFrom).drop(1)
  }

  /** OCC publish onto `branch`: stage (op, add, remove, dv) as read
    * at `readVersion`, then commit with validation. If the branch
    * head moved past the read point, the intervening commits'
    * REMOVED files are the conflict scope: disjoint ⇒ rebase onto the
    * new head and retry (bounded by `maxAttempts`); overlapping ⇒
    * [[ManifestLog.Conflicted]] — the caller's rewrite is stale and
    * must be rebuilt from current bytes.
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
      ts: Long = 0L,
      schemaJson: Option[String] = None,
      // idempotent-writer claim: (appId, batchVersion). Refused as
      // [[AlreadyApplied]] when the chain's watermark for appId is
      // already ≥ batchVersion — checked ATOMICALLY with the CAS, so
      // a crash-restart replay can never double-apply.
      txn: Option[(String, Long)] = None
  ): Outcome = {
    ManifestLog.requirePureShape(op, add, remove, dvAdd)
    var attempts = 0
    while (attempts < maxAttempts) {
      attempts += 1
      val st = state.get()
      validateIn(st, branch, readVersion, remove.toSet, strict) match {
        case Left(overlap) => return Conflicted(overlap, attempts)
        case Right(headV) =>
          txn.foreach { case (app, bv) =>
            val wm = txnWatermarksIn(chainIn(st.commits, headV)).getOrElse(app, Long.MinValue)
            if (wm >= bv) return AlreadyApplied(wm, attempts)
          }
          val v = st.nextVersion
          val commit =
            Commit(
              v, headV, op, add.toVector, remove.toVector, dvAdd.toVector,
              stats, dvRows, cdc.toVector, ts, schemaJson,
              txns = txn.map { case (app, bv) => Map(app -> bv) }.getOrElse(Map.empty))
          val next = st.copy(
            commits = st.commits + (v -> commit),
            branches = st.branches + (branch -> v),
            nextVersion = v + 1L
          )
          if (state.compareAndSet(st, next)) return Committed(v, attempts)
      }
    }
    Conflicted(Set.empty, maxAttempts)
  }

  /** The OCC validation alone, against an explicit state: Right(head)
    * when the commit may apply on the branch's current head (possibly
    * a rebase past interveners whose removed sets are disjoint from
    * ours), Left(overlap) when it must abort. `strict` refuses ANY
    * intervening commit — the whole-table-replace posture (a
    * group-based MERGE/UPDATE/DELETE rewrote every row it scanned, so
    * even a commuting append in the window is a lost update). Shared
    * by [[tryCommit]] and the durable log's persist-then-apply
    * protocol, so the two transports can never drift on conflict
    * semantics.
    */
  private def validateIn(
      st: State,
      branch: String,
      readVersion: Long,
      remove: Set[FileRef],
      strict: Boolean = false
  ): Either[Set[FileRef], Long] = {
    val headV = st.branches.getOrElse(branch, sys.error(s"no branch '$branch'"))
    if (headV != readVersion) {
      if (strict) return Left(remove)
      val c = chainIn(st.commits, headV)
      if (!c.exists(_.version == readVersion))
        return Left(remove) // divergent history: cannot validate
      val intervening = c.dropWhile(_.version != readVersion).drop(1)
      val removedSince = intervening.flatMap(_.removed).toSet
      val overlap = remove.intersect(removedSince)
      if (overlap.nonEmpty) return Left(overlap)
    }
    Right(headV)
  }

  /** [[validateIn]] against the live state — the durable log's
    * pre-persist check.
    */
  private[sources] def validateCommit(
      branch: String,
      readVersion: Long,
      remove: Set[FileRef],
      strict: Boolean = false
  ): Either[Set[FileRef], Long] = validateIn(state.get(), branch, readVersion, remove, strict)

  /** The next version number a commit would take — the durable log
    * stamps its entry with this BEFORE persisting.
    */
  private[sources] def nextVersionNow: Long = state.get().nextVersion

  /** Install a fully-specified commit VERBATIM (version and parent
    * from the record, never recomputed) — the durable log's replay
    * primitive. Refuses a version collision loudly: replay applies
    * each persisted entry exactly once.
    */
  private[sources] def install(branch: String, commit: Commit): Unit = {
    val st = state.get()
    require(!st.commits.contains(commit.version), s"version ${commit.version} already in the log")
    val next = st.copy(
      commits = st.commits + (commit.version -> commit),
      branches = st.branches + (branch -> commit.version),
      nextVersion = math.max(st.nextVersion, commit.version + 1L)
    )
    if (!state.compareAndSet(st, next)) install(branch, commit)
  }

  /** A structural copy sharing the immutable state — the durable
    * log's dry-run surface (validate an expire/ref op on the clone;
    * persist only what succeeded).
    */
  private[sources] def cloneLog: ManifestLog = {
    val l = new ManifestLog
    l.state.set(state.get())
    l
  }

  /** The full (commits, branches, tags, nextVersion) quadruple — the
    * durable log's checkpoint payload.
    */
  private[sources] def stateSnapshot: (Map[Long, Commit], Map[String, Long], Map[String, Long], Long) = {
    val st = state.get()
    (st.commits, st.branches, st.tags, st.nextVersion)
  }

  /** Overwrite the whole state — checkpoint restore on replay. */
  private[sources] def installState(
      commits: Map[Long, Commit],
      branches: Map[String, Long],
      tags: Map[String, Long],
      nextVersion: Long
  ): Unit = state.set(State(commits, branches, tags, nextVersion))

  /** Immutable pin: refuses to move an existing tag. */
  def tag(name: String, version: Long): Unit = {
    val st = state.get()
    require(!st.tags.contains(name), s"tag '$name' already exists (tags are immutable)")
    require(st.commits.contains(version), s"no version $version")
    if (!state.compareAndSet(st, st.copy(tags = st.tags + (name -> version)))) tag(name, version)
  }

  /** A movable head starting at `at` — the WAP staging surface. */
  def createBranch(name: String, at: Long): Unit = {
    val st = state.get()
    require(!st.branches.contains(name), s"branch '$name' already exists")
    require(st.commits.contains(at), s"no version $at")
    if (!state.compareAndSet(st, st.copy(branches = st.branches + (name -> at)))) createBranch(name, at)
  }

  /** Fast-forward publish: move `toBranch` to `fromBranch`'s head,
    * legal only if the target's head is an ancestor (nothing on the
    * target would be abandoned) — the WAP publish verb.
    */
  def fastForward(toBranch: String, fromBranch: String): Long = {
    val st = state.get()
    val target = st.branches(toBranch)
    val src = st.branches(fromBranch)
    require(
      chain(src).exists(_.version == target),
      s"$toBranch@$target is not an ancestor of $fromBranch@$src — fast-forward impossible"
    )
    if (!state.compareAndSet(st, st.copy(branches = st.branches + (toBranch -> src))))
      fastForward(toBranch, fromBranch)
    else src
  }

  /** Files reachable from ANY ref (branch heads and tags) — vacuum's
    * retention set: deleting anything outside it can break no read
    * addressed by name. Change-data files of every commit on a
    * reachable chain count too: a CDF reader addresses them by
    * version for as long as the version replays.
    */
  def reachableFiles: Set[FileRef] = {
    val st = state.get()
    (st.branches.values ++ st.tags.values).toSet.flatMap((v: Long) =>
      liveFiles(v) ++ dvFiles(v) ++ chain(v).flatMap(_.cdc)
    )
  }

  def refs: Map[String, Long] = {
    val st = state.get()
    st.branches ++ st.tags
  }

  /** Remove a tag (the audit that pinned a version is complete). The
    * version itself stays until [[expireBefore]] reclaims it.
    */
  def dropTag(name: String): Unit = {
    val st = state.get()
    require(st.tags.contains(name), s"no tag '$name'")
    if (!state.compareAndSet(st, st.copy(tags = st.tags - name))) dropTag(name)
  }

  /** Remove a branch head (its published work lives on wherever it
    * was merged; unpublished commits become expiration-eligible).
    * `main` is permanent.
    */
  def dropBranch(name: String): Unit = {
    require(name != "main", "the main branch is permanent")
    val st = state.get()
    require(st.branches.contains(name), s"no branch '$name'")
    if (!state.compareAndSet(st, st.copy(branches = st.branches - name))) dropBranch(name)
  }

  /** A commit chain walked in an explicit commits map — shared by
    * [[chain]] (live state) and [[expireBefore]] (pre-CAS planning).
    */
  private def chainIn(cs: Map[Long, Commit], version: Long): Vector[Commit] = {
    var acc = List.empty[Commit]
    var v = version
    while (v >= 0L) {
      val c = cs.getOrElse(v, sys.error(s"no version $v in the log (walking from $version)"))
      acc = c :: acc
      v = c.parent
    }
    acc.toVector
  }

  /** SNAPSHOT EXPIRATION — squash every commit strictly OLDER than
    * `horizon` into one checkpoint commit carrying horizon's live
    * files and DVs, so the log stops growing with history while every
    * retained version replays exactly as before. REFUSES loudly —
    * BEFORE any mutation — if any ref (tag or branch) would lose its
    * history: a ref that points at an expired version, AND a ref
    * whose chain passes THROUGH an expired version without passing
    * the horizon (a side branch forked below it — squashing would
    * orphan its parent pointer and corrupt every read of that
    * branch). The caller must first retire such refs ([[dropTag]]).
    * Returns the vacuum-eligible set: files added only by expired
    * history and live in NO surviving version (checking ref heads
    * alone is not enough — a file re-added after the horizon and
    * re-removed before the head is live in an intermediate RETAINED
    * version; both rules were pinned by the random-history property
    * suite). Reads of expired versions now fail by construction.
    * All planning happens BEFORE the CAS, so a refused or failed
    * expiration leaves the log untouched. Metadata-cardinality driver
    * work throughout.
    */
  def expireBefore(horizon: Long): Set[FileRef] = {
    val st = state.get()
    val hChain = chainIn(st.commits, horizon)
    val dropped = hChain.filter(_.version < horizon).map(_.version).toSet
    val refsAll = st.branches ++ st.tags
    val pinnedBelow = refsAll.filter { case (_, v) => dropped.contains(v) }
    require(
      pinnedBelow.isEmpty,
      s"refusing to expire below $horizon: ref(s) ${pinnedBelow.keys.mkString(", ")} pin expired version(s) — retire them first"
    )
    // a ref ABOVE the horizon is only safe if its chain passes the
    // horizon itself (so the checkpoint re-roots it); a side branch
    // forked below the horizon would be left with a dangling parent
    val forkedBelow = refsAll.filter { case (_, rv) =>
      val c = chainIn(st.commits, rv)
      !c.exists(_.version == horizon) && c.exists(x => dropped.contains(x.version))
    }
    require(
      forkedBelow.isEmpty,
      s"refusing to expire below $horizon: ref(s) ${forkedBelow.keys.mkString(", ")} fork from expired history — " +
        "publish or retire them first"
    )
    val live = hChain.foldLeft(Set.empty[FileRef])((l, c) => (l -- c.removed) ++ c.added)
    val dvs = hChain.flatMap(_.dvAdded).toVector
    // zone maps for surviving files ride the checkpoint, so stats-
    // based pruning keeps working on expired-away history (same
    // removed-files-drop-their-stats fold as liveStats)
    val liveStats0 = hChain.foldLeft(Map.empty[FileRef, FileStats])((m, c) => (m -- c.removed) ++ c.stats).filter {
      case (f, _) => live.contains(f)
    }
    // accumulated tombstone cardinalities ride too — metadata-only
    // COUNT(*) keeps working on expired-away history
    val dvRowsAcc = hChain.foldLeft(Map.empty[FileRef, Long]) { (m, c) =>
      val kept = m -- c.removed
      c.dvRows.foldLeft(kept) { case (acc, (fr, n)) => acc + (fr -> (acc.getOrElse(fr, 0L) + n)) }
    }
    // the checkpoint inherits the horizon commit's wall-clock (so
    // TIMESTAMP AS OF keeps resolving across the squash) and the
    // schema in force at the horizon (so evolved reads survive it)
    val horizonTs = hChain.last.ts
    val horizonSchema = hChain.flatMap(_.schemaJson).lastOption
    val checkpoint =
      Commit(
        horizon, -1L, "checkpoint", live.toVector, Vector.empty, dvs, liveStats0, dvRowsAcc,
        ts = horizonTs, schemaJson = horizonSchema,
        // idempotent-writer watermarks survive the squash: the
        // checkpoint accumulates each app's maximum, so a replayed
        // batch stays refusable after its original commit expires
        txns = txnWatermarksIn(hChain))
    val afterSquash = (st.commits -- dropped) + (horizon -> checkpoint)
    // an UNREFERENCED side commit forked below the horizon (its branch
    // was dropped) would survive the squash with a dangling parent:
    // nothing names it, so drop it from the log rather than leave an
    // unresolvable version behind
    def resolvableIn(cs: Map[Long, Commit], v: Long): Boolean = {
      var cur = v
      while (cur >= 0L) cs.get(cur) match {
        case Some(c) => cur = c.parent
        case None    => return false
      }
      true
    }
    val nextCommits = afterSquash.filter { case (v, _) => resolvableIn(afterSquash, v) }
    // vacuum-eligible = added only by squashed-away history AND live
    // in NO surviving version — computed against the POST-squash
    // commit map but BEFORE the CAS, so nothing here can fail after a
    // mutation. "Squashed-away" is EVERY commit the squash deletes
    // from the log, not just the horizon chain's prefix: an
    // unreferenced side-branch commit pruned by the resolvableIn
    // filter disappears from the log too, and since nothing can ever
    // re-report its files, they must be returned as vacuum-eligible
    // NOW or the physical bytes leak permanently.
    val removedCommits = (st.commits.keySet -- nextCommits.keySet).map(st.commits)
    val everAdded = removedCommits.flatMap(c => c.added ++ c.dvAdded ++ c.cdc)
    val retainedLive = nextCommits.keySet.foldLeft(Set.empty[FileRef]) { (acc, v) =>
      val c = chainIn(nextCommits, v)
      acc ++ c.foldLeft(Set.empty[FileRef])((l, x) => (l -- x.removed) ++ x.added) ++
        c.flatMap(_.dvAdded) ++ c.flatMap(_.cdc)
    }
    val orphans = everAdded -- retainedLive
    if (!state.compareAndSet(st, st.copy(commits = nextCommits))) expireBefore(horizon)
    else orphans
  }
}

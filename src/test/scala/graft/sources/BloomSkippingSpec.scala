package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.manifestGlue

import graft.SparkSpec

/** Per-file bloom sidecars on the manifest catalog — file-level
  * skipping for equality/IN/DPP probes on a high-cardinality column
  * whose values scatter across every file's full zone range (where
  * min/max pruning is powerless). Sidecars are built at commit from
  * the staged files, consulted at scan planning strictly after the
  * zone pass, and absence (pre-bloom history, compaction output)
  * degrades to never-pruned — correctness never depends on them.
  */
class BloomSkippingSpec extends SparkSpec {

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_mfst", classOf[ManifestCatalog].getName)

  private def wh = ManifestCatalog.defaultWarehouse

  private def scannedFiles(df: DataFrame): Int = {
    df.collect()
    manifestGlue.scanInputFiles(df.queryExecution.executedPlan).distinct.size
  }

  /** Four files, each holding k ≡ i (mod 4) over the FULL 1..400
    * range — zones are useless, the bloom is the only index.
    */
  private def fixture(name: String): Unit = {
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS graft_mfst.db.$name")
    spark.sql(
      s"CREATE TABLE graft_mfst.db.$name (k BIGINT, v BIGINT) TBLPROPERTIES ('bloom_col'='k')")
    (0 until 4).foreach { i =>
      (1L to 400L).filter(_ % 4 == i).map(k => (k, k * 7)).toDF("k", "v")
        .createOrReplaceTempView(s"${name}_src")
      spark.sql(s"INSERT INTO graft_mfst.db.$name SELECT /*+ COALESCE(1) */ k, v FROM ${name}_src")
    }
  }

  test("equality and IN probes skip files zones cannot") {
    useCatalog()
    fixture("bl1")
    // every file's k zone is ~[1..400]; only the bloom knows 42 lives
    // in the k%4==2 file (bloom hashing is deterministic — no flake)
    val eq = spark.sql("SELECT count(*) AS n, sum(v) AS vv FROM graft_mfst.db.bl1 WHERE k = 42")
    assert(eq.collect()(0).getLong(0) === 1L)
    assert(scannedFiles(eq) === 1, "equality probe should touch exactly the one matching file")
    val in = spark.sql(
      "SELECT count(*) AS n, sum(v) AS vv FROM graft_mfst.db.bl1 WHERE k IN (42, 171)")
    val r = in.collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === (42L + 171L) * 7)
    assert(scannedFiles(in) === 2, "IN probe should touch the two matching files")
    // a miss probes zero files (405 is in range but nowhere)
    val miss = spark.sql("SELECT count(*) AS n FROM graft_mfst.db.bl1 WHERE k = 399999")
    assert(miss.collect()(0).getLong(0) === 0L)
  }

  test("DPP key sets consult the bloom: join-driven skipping beyond zones") {
    useCatalog()
    import spark.implicits._
    fixture("bl2")
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.bl2d")
    spark.sql("CREATE TABLE graft_mfst.db.bl2d (k BIGINT, tag BIGINT)")
    Seq((42L, 1L), (44L, 0L)).toDF("k", "tag").createOrReplaceTempView("bl2_dim")
    spark.sql("INSERT INTO graft_mfst.db.bl2d SELECT k, tag FROM bl2_dim")
    val join = spark.sql(
      "SELECT count(*) AS n FROM graft_mfst.db.bl2 f JOIN graft_mfst.db.bl2d d ON f.k = d.k " +
        "WHERE d.tag = 1")
    join.collect()
    val factFiles = manifestGlue
      .scanInputFiles(join.queryExecution.executedPlan)
      .distinct
      .filter(_.contains("/bl2/"))
    assert(join.collect()(0).getLong(0) === 1L)
    assert(factFiles.size === 1, s"DPP+bloom kept ${factFiles.size} fact files (want 1)")
  }

  test("absence degrades safely: deleting sidecars disables pruning, never correctness") {
    useCatalog()
    fixture("bl3")
    // destroy every sidecar (simulating pre-bloom history)
    val dir = s"$wh/db/bl3"
    GraftFs.listDirs(dir).filterNot(_ == "_log").foreach { d =>
      GraftFs.listDataFiles(s"$dir/$d").foreach { f =>
        val sc = s"$dir/$d/$f.bloom"
        if (GraftFs.exists(sc)) GraftFs.delete(sc)
      }
    }
    val eq = spark.sql("SELECT count(*) AS n, sum(v) AS vv FROM graft_mfst.db.bl3 WHERE k = 42")
    val r = eq.collect()(0)
    assert(r.getLong(0) === 1L && r.getLong(1) === 42L * 7)
    assert(scannedFiles(eq) === 4, "no sidecar -> no pruning, all files scanned")
  }

  test("OPTIMIZE rebuilds the sidecars: bloom pruning survives compaction") {
    useCatalog()
    fixture("bl5")
    val dir = s"$wh/db/bl5"
    val log = DurableManifestLog.open(dir)
    val schema = spark.table("graft_mfst.db.bl5").schema
    val groups = ManifestMaintenance.compact(
      dir, log, schema, clusterKey = None, groupSize = 2, bloomCol = Some("k"))
    assert(groups.size === 2) // 4 files -> 2 outputs
    // every live file (the compaction outputs) has a fresh sidecar
    val live = log.liveFiles(log.head()).toSeq
    assert(live.size === 2)
    live.foreach(r => assert(GraftFs.exists(s"$dir/${r.dir}/${r.file}.bloom"), s"${r.dir}/${r.file}"))
    val eq = spark.sql("SELECT count(*) AS n, sum(v) AS vv FROM graft_mfst.db.bl5 WHERE k = 42")
    val r = eq.collect()(0)
    assert(r.getLong(0) === 1L && r.getLong(1) === 42L * 7)
    assert(scannedFiles(eq) === 1, "post-compaction bloom should still prune to the one matching file")
  }

  test("vacuum reclaims a dead file's sidecar with it") {
    useCatalog()
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.bl4")
    spark.sql("CREATE TABLE graft_mfst.db.bl4 (k BIGINT) TBLPROPERTIES ('bloom_col'='k')")
    spark.sql("INSERT INTO graft_mfst.db.bl4 VALUES (1), (2)")
    val dir = s"$wh/db/bl4"
    val log = DurableManifestLog.open(dir)
    val before = GraftFs.listDirs(dir).filterNot(_ == "_log")
      .flatMap(d => GraftFs.listDataFiles(s"$dir/$d").map(f => s"$dir/$d/$f"))
    assert(before.nonEmpty && before.forall(p => GraftFs.exists(s"$p.bloom")))
    // truncate, expire history to the head, vacuum graceless
    spark.sql("DELETE FROM graft_mfst.db.bl4")
    log.expireBefore(log.head())
    val deleted = ManifestMaintenance.vacuum(dir, log, graceMs = 0L)
    assert(deleted.nonEmpty)
    before.foreach(p => assert(!GraftFs.exists(p) && !GraftFs.exists(s"$p.bloom"), p))
  }
}

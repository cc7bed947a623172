package graft.sources

import graft.SparkSpec

/** SHALLOW CLONE — zero-copy tables whose genesis references the
  * source's files by relative path: one metadata commit, no data
  * movement, independent evolution afterward, stats (and therefore
  * pruning) carried over, constraints inherited.
  */
class ShallowCloneSpec extends SparkSpec {

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_mfst", classOf[ManifestCatalog].getName)

  private def wh = ManifestCatalog.defaultWarehouse

  test("clone serves the snapshot with ZERO data files of its own; evolution is independent") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.cl1s")
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.cl1t")
    spark.sql("CREATE TABLE graft_mfst.db.cl1s (k BIGINT, v BIGINT) TBLPROPERTIES ('cluster_key'='k')")
    spark.sql("INSERT INTO graft_mfst.db.cl1s SELECT id, id * 3 FROM range(1, 101)")
    spark.sql("INSERT INTO graft_mfst.db.cl1s SELECT id, id * 3 FROM range(101, 201)")

    val v = ManifestMaintenance.shallowClone(s"$wh/db/cl1s", s"$wh/db/cl1t")
    assert(v === 1L)
    // zero data bytes under the clone: only the log and _table.json
    assert(GraftFs.listDirs(s"$wh/db/cl1t").forall(_ == "_log"))
    assert(spark.table("graft_mfst.db.cl1t").count() === 200L)
    assert(
      spark.sql("SELECT sum(v) FROM graft_mfst.db.cl1t").collect()(0).getLong(0) ===
        (1L to 200L).map(_ * 3).sum)

    // independent: insert into the clone; delete from the source
    spark.sql("INSERT INTO graft_mfst.db.cl1t VALUES (999, 9)")
    spark.sql("DELETE FROM graft_mfst.db.cl1s WHERE k <= 100")
    assert(spark.table("graft_mfst.db.cl1s").count() === 100L)
    assert(spark.table("graft_mfst.db.cl1t").count() === 201L)
    // the clone's v1 time-travels to the cloned snapshot
    assert(
      spark.sql("SELECT count(*) FROM graft_mfst.db.cl1t VERSION AS OF 1").collect()(0).getLong(0)
        === 200L)
  }

  test("stats carry over: zone pruning fires on the clone's scan") {
    useCatalog()
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.cl2s")
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.cl2t")
    spark.sql("CREATE TABLE graft_mfst.db.cl2s (k BIGINT, v BIGINT) TBLPROPERTIES ('cluster_key'='k')")
    (0 until 4).foreach { i =>
      (i * 100L + 1L to (i + 1) * 100L).map(k => (k, k)).toDF("k", "v")
        .createOrReplaceTempView("cl2_src")
      spark.sql("INSERT INTO graft_mfst.db.cl2s SELECT /*+ COALESCE(1) */ k, v FROM cl2_src")
    }
    ManifestMaintenance.shallowClone(s"$wh/db/cl2s", s"$wh/db/cl2t")
    val df = spark.sql("SELECT count(*) AS n FROM graft_mfst.db.cl2t WHERE k BETWEEN 150 AND 250")
    assert(df.collect()(0).getLong(0) === 101L)
    val scanned = org.apache.spark.sql.graft.manifestGlue
      .scanInputFiles(df.queryExecution.executedPlan).distinct
    assert(scanned.size === 2, s"clone scan read ${scanned.size} files (want 2 of 4)")
  }

  test("clone of a PINNED version; constraints inherit; partitioned and DV'd sources refuse") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.cl3s")
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.cl3t")
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.cl3p")
    spark.sql("CREATE TABLE graft_mfst.db.cl3s (k BIGINT)")
    spark.sql("INSERT INTO graft_mfst.db.cl3s VALUES (1), (2)") // v1
    spark.sql("ALTER TABLE graft_mfst.db.cl3s ADD CONSTRAINT k_pos CHECK (k > 0)") // v2
    spark.sql("INSERT INTO graft_mfst.db.cl3s VALUES (3)") // v3
    ManifestMaintenance.shallowClone(s"$wh/db/cl3s", s"$wh/db/cl3t", version = Some(1L))
    // the pinned clone holds v1's two rows...
    assert(spark.table("graft_mfst.db.cl3t").count() === 2L)
    // ...but carries the source's constraint metadata? NO — v1 predates
    // the constraint; the clone inherits the metadata IN FORCE AT the
    // cloned version, so a negative insert lands
    spark.sql("INSERT INTO graft_mfst.db.cl3t VALUES (-1)")
    assert(spark.table("graft_mfst.db.cl3t").count() === 3L)
    // cloning the HEAD (constraint in force) carries it
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.cl3u")
    ManifestMaintenance.shallowClone(s"$wh/db/cl3s", s"$wh/db/cl3u")
    assertThrows[Exception](spark.sql("INSERT INTO graft_mfst.db.cl3u VALUES (-2)"))
    assert(spark.table("graft_mfst.db.cl3u").count() === 3L)

    spark.sql("CREATE TABLE graft_mfst.db.cl3p (k BIGINT, p BIGINT) PARTITIONED BY (p)")
    val e = intercept[Exception](
      ManifestMaintenance.shallowClone(s"$wh/db/cl3p", s"$wh/db/cl3q"))
    assert(e.getMessage.contains("PARTITIONED"), e.getMessage)
  }

  test("vacuum on the clone never touches the source's files") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.cl4s")
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.cl4t")
    spark.sql("CREATE TABLE graft_mfst.db.cl4s (k BIGINT)")
    spark.sql("INSERT INTO graft_mfst.db.cl4s VALUES (1), (2)")
    ManifestMaintenance.shallowClone(s"$wh/db/cl4s", s"$wh/db/cl4t")
    // overwrite the clone so the cloned refs leave its live set, then
    // vacuum with zero grace: nothing physical lives under the clone
    // except its own new file — the source files stay untouched
    spark.sql("DELETE FROM graft_mfst.db.cl4t") // truncate-all metadata delete
    spark.sql("INSERT INTO graft_mfst.db.cl4t VALUES (9)")
    val deleted = ManifestMaintenance.vacuum(
      s"$wh/db/cl4t", DurableManifestLog.open(s"$wh/db/cl4t"), graceMs = 0L)
    assert(deleted.isEmpty, s"vacuum deleted $deleted")
    assert(spark.table("graft_mfst.db.cl4s").count() === 2L)
    assert(spark.table("graft_mfst.db.cl4t").count() === 1L)
  }
}

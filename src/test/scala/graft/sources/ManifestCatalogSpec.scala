package graft.sources

import graft.SparkSpec

/** The manifest-backed DSv2 catalog: SQL reads/writes and VERSION AS
  * OF over REAL FILE TABLES whose truth is the durable log, plus the
  * plan-level guarantee the r11 verdict asked for — zone-map file
  * skipping visible INSIDE the scan (the BatchScan's file index holds
  * only the kept files), not driver arithmetic beside it.
  */
class ManifestCatalogSpec extends SparkSpec {

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_mfst", classOf[ManifestCatalog].getName)

  test("SQL lifecycle: CREATE / INSERT / SELECT / DROP over a file table backed by the log") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.mspec1")
    spark.sql("CREATE TABLE graft_mfst.db.mspec1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft_mfst.db.mspec1 VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft_mfst.db.mspec1 VALUES (3, 'c')")
    val got = spark.table("graft_mfst.db.mspec1").orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the truth is the LOG: two appends → two versions past genesis
    assert(spark.sql("SELECT count(*) FROM graft_mfst.db.mspec1 VERSION AS OF 1").collect()(0).getLong(0) === 2L)
    assert(spark.sql("SELECT count(*) FROM graft_mfst.db.mspec1 VERSION AS OF 2").collect()(0).getLong(0) === 3L)
    assert(spark.sql("DROP TABLE graft_mfst.db.mspec1").collect().isEmpty)
    assertThrows[Exception](spark.table("graft_mfst.db.mspec1").collect())
  }

  test("VERSION AS OF: pinned reads survive later writes; missing refuses; past rejects writes at analysis") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.mspec2")
    spark.sql("CREATE TABLE graft_mfst.db.mspec2 (k BIGINT)")
    spark.sql("INSERT INTO graft_mfst.db.mspec2 VALUES (1)") // v1
    spark.sql("INSERT INTO graft_mfst.db.mspec2 VALUES (2)") // v2
    assert(spark.sql("SELECT sum(k) FROM graft_mfst.db.mspec2 VERSION AS OF 1").collect()(0).getLong(0) === 1L)
    spark.sql("INSERT INTO graft_mfst.db.mspec2 VALUES (3)") // v3
    assert(spark.sql("SELECT sum(k) FROM graft_mfst.db.mspec2 VERSION AS OF 1").collect()(0).getLong(0) === 1L)
    assert(spark.sql("SELECT sum(k) FROM graft_mfst.db.mspec2").collect()(0).getLong(0) === 6L)
    val e = intercept[Exception](spark.sql("SELECT * FROM graft_mfst.db.mspec2 VERSION AS OF 42").collect())
    assert(e.getMessage.contains("42"), e.getMessage)
    assertThrows[Exception](
      spark.sql("INSERT INTO graft_mfst.db.mspec2 VERSION AS OF 1 VALUES (9)")
    )
  }

  test("cross-process shape: a table written through SQL reads back through a SECOND log instance") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.mspec3")
    spark.sql("CREATE TABLE graft_mfst.db.mspec3 (k BIGINT)")
    spark.sql("INSERT INTO graft_mfst.db.mspec3 SELECT explode(sequence(1, 100))")
    val dir = s"${ManifestCatalog.defaultWarehouse}/db/mspec3"
    val other = DurableManifestLog.open(dir) // a fresh instance, disk-only replay
    assert(other.head() === 1L)
    val live = other.liveFiles(other.head())
    assert(live.nonEmpty)
    val paths = live.toSeq.map(r => s"$dir/${r.dir}/${r.file}")
    assert(spark.read.parquet(paths: _*).count() === 100L)
  }

  test("zone-map skipping: the scan's file index holds ONLY the files whose zones intersect the predicate") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.mspec4")
    spark.sql("CREATE TABLE graft_mfst.db.mspec4 (k BIGINT, v BIGINT) TBLPROPERTIES ('cluster_key'='k')")
    // four appends = four files with disjoint known zones
    (0 until 4).foreach { i =>
      spark.sql(
        s"INSERT INTO graft_mfst.db.mspec4 SELECT /*+ COALESCE(1) */ id AS k, id * 10 AS v " +
          s"FROM range(${i * 100}, ${i * 100 + 100})"
      )
    }
    val df = spark.sql("SELECT sum(v) FROM graft_mfst.db.mspec4 WHERE k BETWEEN 150 AND 250")
    val expected = (150L to 250L).map(_ * 10).sum
    assert(df.collect()(0).getLong(0) === expected)
    val scanned = org.apache.spark.sql.graft.manifestGlue.scanInputFiles(df.queryExecution.executedPlan)
    assert(scanned.size === 2, s"zones [100,199] and [200,299] must survive, got: $scanned")
    // an equality predicate prunes to one file
    val df1 = spark.sql("SELECT v FROM graft_mfst.db.mspec4 WHERE k = 42")
    assert(df1.collect()(0).getLong(0) === 420L)
    assert(org.apache.spark.sql.graft.manifestGlue.scanInputFiles(df1.queryExecution.executedPlan).size === 1)
    // no predicate: all four files scanned, nothing silently dropped
    val dfAll = spark.table("graft_mfst.db.mspec4")
    assert(dfAll.count() === 400L)
    assert(org.apache.spark.sql.graft.manifestGlue.scanInputFiles(dfAll.queryExecution.executedPlan).size === 4)
  }

  test("pruned scans stay correct at the boundary: predicates touching zone edges over-read, never wrong-answer") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.mspec5")
    spark.sql("CREATE TABLE graft_mfst.db.mspec5 (k BIGINT) TBLPROPERTIES ('cluster_key'='k')")
    spark.sql("INSERT INTO graft_mfst.db.mspec5 SELECT /*+ COALESCE(1) */ id FROM range(0, 10)")
    spark.sql("INSERT INTO graft_mfst.db.mspec5 SELECT /*+ COALESCE(1) */ id FROM range(10, 20)")
    def cnt(pred: String): Long =
      spark.sql(s"SELECT count(*) FROM graft_mfst.db.mspec5 WHERE $pred").collect()(0).getLong(0)
    assert(cnt("k >= 10") === 10L)
    assert(cnt("k > 9") === 10L)
    assert(cnt("k <= 9") === 10L)
    assert(cnt("k < 10") === 10L)
    assert(cnt("k = 9 OR k = 10") === 2L)
    assert(cnt("k IN (3, 17)") === 2L)
    assert(cnt("k IN (25, 99)") === 0L)
  }

  test("concurrent INSERTs commute through the log's OCC — both land, none lost") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.mspec6")
    spark.sql("CREATE TABLE graft_mfst.db.mspec6 (k BIGINT)")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        try { spark.sql(s"INSERT INTO graft_mfst.db.mspec6 VALUES ($i)"); () }
        catch { case t: Throwable => errors.add(t); () }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errors.isEmpty, s"concurrent INSERT threw: ${Option(errors.peek()).map(_.toString)}")
    assert(spark.table("graft_mfst.db.mspec6").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
  }
}

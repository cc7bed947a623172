package graft.sources

import graft.SparkSpec

/** Column mapping on the durable catalog ([[ColumnMapping]]): RENAME
  * and DROP COLUMN as metadata-only schema commits over files written
  * once under stable physical names — per-version reads, zone pruning
  * in the logical namespace, physical-named rewrites, and the OCC
  * serialization of an ALTER racing an INSERT.
  */
class ManifestColumnMappingSpec extends SparkSpec {

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_mfst", classOf[ManifestCatalog].getName)

  test("add → rename → drop → re-add lifecycle: every version serves ITS schema over the same bytes") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.cmap1")
    spark.sql(
      "CREATE TABLE graft_mfst.db.cmap1 (k BIGINT, a BIGINT, b BIGINT) " +
        "TBLPROPERTIES ('cluster_key'='k', 'column_mapping'='name')"
    )
    spark.sql("INSERT INTO graft_mfst.db.cmap1 VALUES (1, 10, 100), (2, 20, 200)") // v1
    spark.sql("ALTER TABLE graft_mfst.db.cmap1 RENAME COLUMN a TO amount") // v2
    // old files serve the renamed column — same physical bytes
    assert(
      spark.sql("SELECT sum(amount) FROM graft_mfst.db.cmap1").collect()(0).getLong(0) === 30L
    )
    spark.sql("INSERT INTO graft_mfst.db.cmap1 VALUES (3, 30, 300)") // v3, written post-rename
    assert(
      spark.sql("SELECT sum(amount), sum(b) FROM graft_mfst.db.cmap1").collect()(0).toSeq === Seq(60L, 600L)
    )
    spark.sql("ALTER TABLE graft_mfst.db.cmap1 DROP COLUMN b") // v4
    assert(spark.table("graft_mfst.db.cmap1").schema.fieldNames.toSeq === Seq("k", "amount"))
    spark.sql("INSERT INTO graft_mfst.db.cmap1 VALUES (4, 40)") // v5
    // re-ADD of the dropped logical name: a FRESH physical column —
    // the dropped bytes must NOT resurrect; all rows read null
    spark.sql("ALTER TABLE graft_mfst.db.cmap1 ADD COLUMN b BIGINT") // v6
    val head = spark
      .sql("SELECT count(*), sum(amount), count(b) FROM graft_mfst.db.cmap1")
      .collect()(0)
    assert((head.getLong(0), head.getLong(1), head.getLong(2)) === ((4L, 100L, 0L)))
    // per-version reads serve each version's OWN logical names
    val v1 = spark.sql("SELECT * FROM graft_mfst.db.cmap1 VERSION AS OF 1")
    assert(v1.schema.fieldNames.toSeq === Seq("k", "a", "b"))
    assert(v1.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq((1L, 10L, 100L), (2L, 20L, 200L)))
    val v3 = spark.sql("SELECT sum(amount), sum(b) FROM graft_mfst.db.cmap1 VERSION AS OF 3").collect()(0)
    assert((v3.getLong(0), v3.getLong(1)) === ((60L, 600L)))
  }

  test("zone pruning works in the LOGICAL namespace after a rename") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.cmap2")
    spark.sql(
      "CREATE TABLE graft_mfst.db.cmap2 (k BIGINT, v BIGINT) " +
        "TBLPROPERTIES ('cluster_key'='k', 'column_mapping'='name')"
    )
    (0 until 4).foreach { i =>
      spark.sql(
        s"INSERT INTO graft_mfst.db.cmap2 SELECT /*+ COALESCE(1) */ id, id * 10 " +
          s"FROM range(${i * 100}, ${i * 100 + 100})"
      )
    }
    spark.sql("ALTER TABLE graft_mfst.db.cmap2 RENAME COLUMN v TO val")
    val df = spark.sql("SELECT sum(val) FROM graft_mfst.db.cmap2 WHERE k BETWEEN 150 AND 250")
    assert(df.collect()(0).getLong(0) === (150L to 250L).map(_ * 10).sum)
    val scanned = org.apache.spark.sql.graft.manifestGlue.scanInputFiles(df.queryExecution.executedPlan)
    assert(scanned.size === 2, s"zone pruning must survive the rename, got: $scanned")
    // …and a predicate on the RENAMED column prunes by its zones too
    val df2 = spark.sql("SELECT count(*) FROM graft_mfst.db.cmap2 WHERE val >= 3500")
    assert(df2.collect()(0).getLong(0) === 50L)
    val scanned2 = org.apache.spark.sql.graft.manifestGlue.scanInputFiles(df2.queryExecution.executedPlan)
    assert(scanned2.size === 1, s"renamed-column zones must prune, got: $scanned2")
  }

  test("row-level UPDATE after a rename stages physical-named files; the feed of versions stays readable") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.cmap3")
    spark.sql(
      "CREATE TABLE graft_mfst.db.cmap3 (k BIGINT, a BIGINT) " +
        "TBLPROPERTIES ('cluster_key'='k', 'column_mapping'='name')"
    )
    spark.sql("INSERT INTO graft_mfst.db.cmap3 VALUES (1, 10), (2, 20), (3, 30)")
    spark.sql("ALTER TABLE graft_mfst.db.cmap3 RENAME COLUMN a TO amount")
    spark.sql("UPDATE graft_mfst.db.cmap3 SET amount = amount + 1 WHERE k >= 2")
    assert(
      spark.table("graft_mfst.db.cmap3").orderBy("k").collect().map(_.getLong(1)).toSeq
        === Seq(10L, 21L, 31L)
    )
    // the pre-rename version still reads with its own column name
    assert(
      spark.sql("SELECT sum(a) FROM graft_mfst.db.cmap3 VERSION AS OF 1").collect()(0).getLong(0) === 60L
    )
  }

  test("refusals: RENAME/DROP need the mapping; the cluster key is anchored; partitioned tables refuse the property") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.cmap4")
    spark.sql("CREATE TABLE graft_mfst.db.cmap4 (k BIGINT, a BIGINT)") // NOT mapped
    val e1 = intercept[Exception](spark.sql("ALTER TABLE graft_mfst.db.cmap4 RENAME COLUMN a TO b"))
    assert(e1.getMessage.contains("column_mapping"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql("ALTER TABLE graft_mfst.db.cmap4 DROP COLUMN a"))
    assert(e2.getMessage.contains("column_mapping"), e2.getMessage)
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.cmap5")
    spark.sql(
      "CREATE TABLE graft_mfst.db.cmap5 (k BIGINT, a BIGINT) " +
        "TBLPROPERTIES ('cluster_key'='k', 'column_mapping'='name')"
    )
    val e3 = intercept[Exception](spark.sql("ALTER TABLE graft_mfst.db.cmap5 RENAME COLUMN k TO kk"))
    assert(e3.getMessage.contains("cluster key"), e3.getMessage)
    val e4 = intercept[Exception](spark.sql("ALTER TABLE graft_mfst.db.cmap5 DROP COLUMN k"))
    assert(e4.getMessage.contains("cluster key"), e4.getMessage)
    val e5 = intercept[Exception](
      spark.sql(
        "CREATE TABLE graft_mfst.db.cmap6 (k BIGINT, p BIGINT) PARTITIONED BY (p) " +
          "TBLPROPERTIES ('column_mapping'='name')"
      )
    )
    assert(e5.getMessage.contains("partitioned"), e5.getMessage)
  }

  test("OCC: a RENAME racing an INSERT serializes through the log — both land, neither is lost") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.cmap7")
    spark.sql(
      "CREATE TABLE graft_mfst.db.cmap7 (k BIGINT, a BIGINT) " +
        "TBLPROPERTIES ('cluster_key'='k', 'column_mapping'='name')"
    )
    spark.sql("INSERT INTO graft_mfst.db.cmap7 VALUES (1, 10)")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tAlter = new Thread(() => {
      try { spark.sql("ALTER TABLE graft_mfst.db.cmap7 RENAME COLUMN a TO amount"); () }
      catch { case t: Throwable => errors.add(t); () }
    })
    val tInsert = new Thread(() => {
      try { spark.sql("INSERT INTO graft_mfst.db.cmap7 VALUES (2, 20)"); () }
      catch { case t: Throwable => errors.add(t); () }
    })
    tAlter.start(); tInsert.start()
    tAlter.join(); tInsert.join()
    assert(errors.isEmpty, s"race threw: ${Option(errors.peek()).map(_.toString)}")
    val got = spark.sql("SELECT k, amount FROM graft_mfst.db.cmap7").orderBy("k").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 10L), (2L, 20L)))
    val log = DurableManifestLog.open(s"${ManifestCatalog.defaultWarehouse}/db/cmap7")
    assert(log.head() === 3L, "both the ALTER and the INSERT must have landed as commits")
  }
}

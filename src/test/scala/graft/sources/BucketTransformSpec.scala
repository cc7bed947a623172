package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.{manifestGlue, ManifestScanBuilder}

import graft.SparkSpec

/** PARTITIONED BY (bucket(n, col)) — Iceberg-style hidden
  * partitioning on the manifest catalog: rows are staged under
  * synthetic `__gbucket=<pmod(hash(col), n)>` dirs (the column
  * itself stays in the data files, so reads never do partition
  * recovery), and equality/IN/DPP probes on the column recompute the
  * same hash at planning to prune whole buckets.
  */
class BucketTransformSpec extends SparkSpec {

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_mfst", classOf[ManifestCatalog].getName)

  private def scanned(df: DataFrame): Seq[String] = {
    df.collect()
    manifestGlue.scanInputFiles(df.queryExecution.executedPlan).distinct
  }

  test("point and IN probes prune to the value's bucket; scans and censuses agree") {
    useCatalog()
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.bk1")
    spark.sql("CREATE TABLE graft_mfst.db.bk1 (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    (1L to 400L).map(k => (k, k * 3)).toDF("k", "v").createOrReplaceTempView("bk1_src")
    spark.sql("INSERT INTO graft_mfst.db.bk1 SELECT k, v FROM bk1_src")

    val full = spark.sql("SELECT count(*) AS n, sum(v) AS vv FROM graft_mfst.db.bk1")
    val fr = full.collect()(0)
    assert(fr.getLong(0) === 400L && fr.getLong(1) === (1L to 400L).map(_ * 3).sum)
    val allFiles = scanned(full)

    val eq = spark.sql("SELECT count(*) AS n, sum(v) AS vv FROM graft_mfst.db.bk1 WHERE k = 42")
    val er = eq.collect()(0)
    assert(er.getLong(0) === 1L && er.getLong(1) === 126L)
    val eqFiles = scanned(eq)
    val bucket42 = ManifestScanBuilder.bucketOf(42L, 4)
    assert(eqFiles.nonEmpty && eqFiles.size < allFiles.size,
      s"bucket pruning kept ${eqFiles.size} of ${allFiles.size}")
    assert(eqFiles.forall(_.contains(s"__gbucket=$bucket42")), eqFiles.mkString(", "))

    val in = spark.sql("SELECT count(*) AS n FROM graft_mfst.db.bk1 WHERE k IN (42, 43, 44, 45)")
    assert(in.collect()(0).getLong(0) === 4L)
    val wanted = (42L to 45L).map(ManifestScanBuilder.bucketOf(_, 4)).toSet
    assert(scanned(in).forall(f => wanted.exists(b => f.contains(s"__gbucket=$b"))))
  }

  test("DPP on the bucket column prunes at runtime; NULL keys land in the seed bucket; OVERWRITE refuses") {
    useCatalog()
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.bk2")
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.bk2d")
    spark.sql("CREATE TABLE graft_mfst.db.bk2 (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    (1L to 400L).map(k => (k, k)).toDF("k", "v").createOrReplaceTempView("bk2_src")
    spark.sql("INSERT INTO graft_mfst.db.bk2 SELECT k, v FROM bk2_src")
    spark.sql("CREATE TABLE graft_mfst.db.bk2d (k BIGINT, tag BIGINT)")
    Seq((42L, 1L), (57L, 0L)).toDF("k", "tag").createOrReplaceTempView("bk2_dim")
    spark.sql("INSERT INTO graft_mfst.db.bk2d SELECT k, tag FROM bk2_dim")
    val join = spark.sql(
      "SELECT count(*) AS n FROM graft_mfst.db.bk2 f JOIN graft_mfst.db.bk2d d ON f.k = d.k " +
        "WHERE d.tag = 1")
    join.collect()
    assert(join.collect()(0).getLong(0) === 1L)
    val factFiles = manifestGlue.scanInputFiles(join.queryExecution.executedPlan)
      .distinct.filter(_.contains("/bk2/"))
    val b42 = ManifestScanBuilder.bucketOf(42L, 4)
    assert(factFiles.nonEmpty && factFiles.forall(_.contains(s"__gbucket=$b42")),
      factFiles.mkString(", "))

    // NULL keys are admitted: Spark's hash(NULL) is the seed, so they
    // land deterministically in bucket pmod(42, n) — equality probes
    // never match NULL and IS NULL never bucket-prunes, so they are
    // served by exactly the scans that should see them
    spark.sql("INSERT INTO graft_mfst.db.bk2 VALUES (NULL, 77)")
    assert(spark.sql("SELECT count(*) FROM graft_mfst.db.bk2 WHERE k IS NULL").collect()(0).getLong(0) === 1L)
    assert(spark.table("graft_mfst.db.bk2").count() === 401L)
    assertThrows[Exception](spark.sql("INSERT OVERWRITE graft_mfst.db.bk2 VALUES (1, 1)"))
  }

  test("a shallow clone inherits the bucket index: point probes prune on the clone") {
    useCatalog()
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.bk4")
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.bk4c")
    spark.sql("CREATE TABLE graft_mfst.db.bk4 (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    (1L to 400L).map(k => (k, k * 5)).toDF("k", "v").createOrReplaceTempView("bk4_src")
    spark.sql("INSERT INTO graft_mfst.db.bk4 SELECT k, v FROM bk4_src")
    val wh = ManifestCatalog.defaultWarehouse
    ManifestMaintenance.shallowClone(s"$wh/db/bk4", s"$wh/db/bk4c")
    val eq = spark.sql("SELECT count(*) AS n, sum(v) AS vv FROM graft_mfst.db.bk4c WHERE k = 42")
    val r = eq.collect()(0)
    assert(r.getLong(0) === 1L && r.getLong(1) === 210L)
    val files = scanned(eq)
    val b42 = ManifestScanBuilder.bucketOf(42L, 4)
    assert(files.nonEmpty && files.forall(_.contains(s"__gbucket=$b42")), files.mkString(", "))
  }

  test("the synthetic __gbucket column name is reserved at CREATE and across evolution") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.bk5")
    assertThrows[Exception](
      spark.sql(
        "CREATE TABLE graft_mfst.db.bk5 (k BIGINT, __gbucket BIGINT) PARTITIONED BY (bucket(4, k))"))
    spark.sql("CREATE TABLE graft_mfst.db.bk5 (k BIGINT) PARTITIONED BY (bucket(4, k))")
    assertThrows[Exception](
      spark.sql("ALTER TABLE graft_mfst.db.bk5 ADD COLUMN __gbucket BIGINT"))
    spark.sql("ALTER TABLE graft_mfst.db.bk5 ADD COLUMN v BIGINT") // non-colliding adds still work
    assert(spark.table("graft_mfst.db.bk5").schema.fieldNames.toSeq === Seq("k", "v"))
  }

  test("the change feed serves a bucketed table like any other") {
    useCatalog()
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.bk6")
    spark.sql(
      "CREATE TABLE graft_mfst.db.bk6 (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k)) " +
        "TBLPROPERTIES ('change_feed'='true')")
    (1L to 50L).map(k => (k, k)).toDF("k", "v").createOrReplaceTempView("bk6_src")
    spark.sql("INSERT INTO graft_mfst.db.bk6 SELECT k, v FROM bk6_src") // v1
    spark.sql("INSERT INTO graft_mfst.db.bk6 VALUES (99, 990)") // v2
    val feed = spark.read.table("graft_mfst.db.bk6.changes")
    val byVersion = feed
      .groupBy("_commit_version")
      .count()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    assert(byVersion === Map(1L -> 50L, 2L -> 1L))
    assert(feed.filter(org.apache.spark.sql.functions.col("_change_type") =!= "insert").count() === 0L)
  }

  test("a row-level rewrite's output files lose bucket pruning but never correctness") {
    useCatalog()
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.bk3")
    spark.sql("CREATE TABLE graft_mfst.db.bk3 (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    (1L to 100L).map(k => (k, k)).toDF("k", "v").createOrReplaceTempView("bk3_src")
    spark.sql("INSERT INTO graft_mfst.db.bk3 SELECT k, v FROM bk3_src")
    // a group-based UPDATE rewrites files into plain commit dirs (no
    // __gbucket= segment): those files carry no ordinal and are kept
    // by every probe — conservative, correct
    spark.sql("UPDATE graft_mfst.db.bk3 SET v = v + 1000 WHERE k = 7")
    val r = spark.sql("SELECT v FROM graft_mfst.db.bk3 WHERE k = 7").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1007L))
    assert(spark.table("graft_mfst.db.bk3").count() === 100L)
  }
}

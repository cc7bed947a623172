package graft.sources

import graft.SparkSpec

/** Regression pin for the partition-column-order contract: Spark's
  * file scans append partition columns AFTER data columns, so a
  * partitioned table whose partition column is not declared LAST gets
  * a reordering Project over every scan — fatal for metadata DELETEs
  * (DataSourceV2Strategy requires a bare scan relation under
  * DeleteFromTable). createTable enforces partition-column-last; this
  * spec drives the full 3-column DELETE sequence that exposed it
  * (aligned partition delete → refused non-aligned → time travel →
  * unconditional truncate).
  */
class MetaDeleteProbeSpec extends SparkSpec {
  test("aligned partition delete on a 3-column table") {
    spark.conf.set("spark.sql.catalog.graft_mfst", classOf[ManifestCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.mprobe1")
    spark.sql(
      "CREATE TABLE graft_mfst.db.mprobe1 (k BIGINT, cents BIGINT, p BIGINT) PARTITIONED BY (p) " +
        "TBLPROPERTIES ('cluster_key'='k')"
    )
    spark.sql(
      "INSERT INTO graft_mfst.db.mprobe1 SELECT /*+ COALESCE(1) */ id, id * 10, id % 4 FROM range(0, 12)")
    spark.sql("DELETE FROM graft_mfst.db.mprobe1 WHERE p = 2")
    assert(spark.table("graft_mfst.db.mprobe1").count() === 9L)
    val refused =
      try { spark.sql("DELETE FROM graft_mfst.db.mprobe1 WHERE p = 3 AND k % 7 = 0"); 0L }
      catch { case e: Exception => info(s"refusal: ${e.getClass.getName}: ${e.getMessage.take(150)}"); 1L }
    assert(refused === 1L)
    info("step: time-travel read")
    val r = spark
      .sql("SELECT count(*) AS n, sum(k) AS kk, sum(cents) AS cc FROM graft_mfst.db.mprobe1 VERSION AS OF 1 WHERE p = 2")
      .collect()(0)
    assert(r.getLong(0) === 3L)
    info("step: unconditional delete")
    spark.sql("DELETE FROM graft_mfst.db.mprobe1")
    assert(spark.table("graft_mfst.db.mprobe1").count() === 0L)
  }
}

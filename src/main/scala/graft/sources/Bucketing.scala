package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffle a table ONCE at write time so
  * every later equi-join/aggregation on the bucket key runs
  * shuffle-free.
  *
  * This is the materialized form of the reference's hand co-partitioning
  * (`sort_values` so same-key rows land together, `app.py:427-428`) —
  * but durable: at 100 TB, bucketing the fact table by join key turns
  * every subsequent join against it from a 2-sided shuffle into a local
  * zip of buckets. Verified in BucketingSpec by asserting the joined
  * plan contains no Exchange.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets —
    * also unlocks sort-merge without the sort).
    *
    * Drops any previous table AND its leftover warehouse directory
    * first: the in-memory catalog dies with the JVM but the files
    * don't, and a CREATE over an orphaned location fails with
    * LOCATION_ALREADY_EXISTS.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}

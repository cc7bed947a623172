package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Task-side paged fetch: windows fan out one-per-task, rows are born
  * inside executors, and the stub arithmetic matches the SQL mirror
  * (`TextOps.hash32` / DuckDB md5-prefix).
  */
class PagedFetchSpec extends SparkSpec {

  private val windows = WindowedIngest.monthlyWindows(LocalDate.of(2019, 1, 15), LocalDate.of(2019, 3, 31))

  test("each window occupies its own partition (task = unit of fetch + retry)") {
    import spark.implicits._
    val ds = PagedFetch.fetchPaged(spark, windows)(PagedFetch.fetchStub)
    assert(ds.rdd.getNumPartitions === windows.size)
    // every partition carries exactly one window's rows
    val perPartition = ds
      .toDF()
      .withColumn("part", spark_partition_id())
      .groupBy("part")
      .agg(countDistinct(col("window_start")).as("n_windows"))
      .collect()
    assert(perPartition.length === windows.size)
    assert(perPartition.forall(_.getLong(1) === 1L))
  }

  test("stub emits one record per day, covering the planned range exactly") {
    import spark.implicits._
    val rows = PagedFetch.fetchPaged(spark, windows)(PagedFetch.fetchStub).collect()
    val expectedDays = windows.map(w => 1L + w.start.until(w.endInclusive, java.time.temporal.ChronoUnit.DAYS)).sum
    assert(rows.length.toLong === expectedDays)
    assert(rows.map(_.call_day).distinct.length === rows.length)
    assert(rows.map(_.call_day).min === "2019-01-15")
    assert(rows.map(_.call_day).max === "2019-03-31")
  }

  test("task-side hash32 matches the Column-side TextOps.hash32") {
    import spark.implicits._
    val samples = Seq("2019-01-15", "2019-12-31", "x")
    val viaColumn = samples
      .toDF("s")
      .select(graft.functions.TextOps.hash32(col("s")).as("h"))
      .collect()
      .map(_.getLong(0))
    val viaTask = samples.map(PagedFetch.hash32)
    assert(viaTask === viaColumn.toSeq)
  }
}

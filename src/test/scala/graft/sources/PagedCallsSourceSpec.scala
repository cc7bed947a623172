package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DataSource V2 paged connector: one input partition per monthly
  * window, reader-level column pruning, and row parity with the
  * flatMap fan-out form of the same fetch.
  */
class PagedCallsSourceSpec extends SparkSpec {

  private def load(start: String, end: String) =
    spark.read.format(PagedCallsSource.Name).option("start", start).option("end", end).load()

  test("plans one input partition per monthly window") {
    val df = load("2019-01-15", "2019-06-30")
    val expected = WindowedIngest.monthlyWindows(LocalDate.parse("2019-01-15"), LocalDate.parse("2019-06-30")).size
    assert(df.rdd.getNumPartitions === expected)
  }

  test("column pruning reaches the reader (ReadSchema shrinks)") {
    val p = load("2019-01-15", "2019-03-31")
      .select(sum(col("n_calls")))
      .queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // DSv2 scans surface pruning as the BatchScan node's Output list
    assert(p.contains("BatchScan"), p)
    assert(p.contains("n_calls"), p)
    assert(!p.contains("call_day"), s"pruned column still in the scan output:\n$p")
  }

  test("rows match the flatMap fan-out form of the same fetch") {
    import spark.implicits._
    val windows = WindowedIngest.monthlyWindows(LocalDate.parse("2019-01-15"), LocalDate.parse("2019-04-30"))
    val viaFlatMap = PagedFetch.fetchPaged(spark, windows)(PagedFetch.fetchStub).toDF().orderBy("call_day").collect()
    val viaSource = load("2019-01-15", "2019-04-30").orderBy("call_day").collect()
    assert(viaSource.toSeq === viaFlatMap.toSeq)
  }

  test("filter pushdown prunes non-intersecting windows from the partition plan") {
    val df = load("2019-01-15", "2019-12-31")
      .filter(col("call_day") >= "2019-03-10" && col("call_day") < "2019-06-01")
    // only the March/April/May windows intersect [03-10, 05-31]
    assert(df.rdd.getNumPartitions === 3, "pruned windows must never become partitions (their GETs must not happen)")
  }

  test("pushed day bounds leave NO post-scan Filter and results equal the unpushed form") {
    val df = graft.Queries.pagedPushdown(spark, sfDir)
    val filters = df.queryExecution.sparkPlan.collect { case f: org.apache.spark.sql.execution.FilterExec => f }
    assert(
      !filters.exists(_.condition.toString.contains("call_day")),
      s"day predicate must be consumed by the scan, not re-evaluated post-scan:\n${df.queryExecution.sparkPlan}"
    )
    // the scan advertises the range it received (the $where body)
    val formatted = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(formatted.contains("pushedDayRange=[2019-03-10..2019-05-31]"), formatted)
    // pushdown is semantically invisible: same rows as filtering the
    // full load after the scan (bounds forced residual via a cast)
    val unpushed = load("2019-01-15", "2019-12-31")
      .filter(substring(col("call_day"), 1, 10) >= "2019-03-10" && substring(col("call_day"), 1, 10) < "2019-06-01")
      .orderBy("call_day")
      .collect()
    assert(df.collect().toSeq === unpushed.toSeq)
  }

  test("equality and exclusive bounds fold into the window plan") {
    val one = load("2019-01-15", "2019-12-31").filter(col("call_day") === "2019-07-04")
    assert(one.rdd.getNumPartitions === 1)
    val got = one.collect()
    assert(got.length === 1 && got(0).getAs[String]("call_day") === "2019-07-04")
    // strict bounds: (2019-08-31, 2019-10-01) exclusive both sides = September
    val sept = load("2019-01-15", "2019-12-31")
      .filter(col("call_day") > "2019-08-31" && col("call_day") < "2019-10-01")
    assert(sept.rdd.getNumPartitions === 1)
    assert(sept.count() === 30)
  }

  test("missing options fail fast with a clear message") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format(PagedCallsSource.Name).option("start", "2019-01-15").load()
    }
    assert(e.getMessage.contains("start and end"))
  }
}

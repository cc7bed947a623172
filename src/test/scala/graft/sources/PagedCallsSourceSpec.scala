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

  test("missing options fail fast with a clear message") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format(PagedCallsSource.Name).option("start", "2019-01-15").load()
    }
    assert(e.getMessage.contains("start and end"))
  }
}

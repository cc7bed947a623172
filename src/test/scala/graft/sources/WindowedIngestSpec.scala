package graft.sources

import java.time.LocalDate

import graft.SparkSpec

class WindowedIngestSpec extends SparkSpec {

  test("monthly windows: interior whole months, clipped endpoints") {
    val ws = WindowedIngest.monthlyWindows(LocalDate.of(2019, 1, 15), LocalDate.of(2019, 3, 10))
    assert(
      ws === Seq(
        WindowedIngest.Window(LocalDate.of(2019, 1, 15), LocalDate.of(2019, 1, 31)),
        WindowedIngest.Window(LocalDate.of(2019, 2, 1), LocalDate.of(2019, 2, 28)),
        WindowedIngest.Window(LocalDate.of(2019, 3, 1), LocalDate.of(2019, 3, 10))
      )
    )
  }

  test("single-month range collapses to one window") {
    val ws = WindowedIngest.monthlyWindows(LocalDate.of(2020, 2, 5), LocalDate.of(2020, 2, 20))
    assert(ws === Seq(WindowedIngest.Window(LocalDate.of(2020, 2, 5), LocalDate.of(2020, 2, 20))))
  }

  test("windows tile without gaps or overlaps") {
    val ws = WindowedIngest.monthlyWindows(LocalDate.of(2019, 1, 1), LocalDate.of(2021, 12, 31))
    ws.sliding(2).foreach {
      case Seq(a, b) => assert(a.endInclusive.plusDays(1) === b.start)
      case _ =>
    }
  }

  test("windowed ingest over orders equals a direct range scan") {
    import org.apache.spark.sql.functions._
    val orders = Tables.parquet(spark, sfDir, "orders")
    val ws = WindowedIngest.monthlyWindows(LocalDate.of(1995, 1, 1), LocalDate.of(2001, 12, 31))
    val ingested = WindowedIngest.ingest(ws, "o_orderdate")(p => orders.filter(p))
    val direct = orders.filter(
      col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("2002-01-01").cast("timestamp")
    )
    assert(ingested.count() === direct.count())
  }
}

package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end pipeline parity on a deterministic calls fixture built to
  * FIXTURES.md §A: duplicate event groups with (a) all-null districts,
  * (b) one non-null, (c) several non-null incl. tied create times; null
  * rates 0→100%; 3 years of timestamps crossing month boundaries.
  */
class CallsPipelineSpec extends SparkSpec {

  private def fixture: DataFrame = {
    val rnd = new scala.util.Random(42)
    val streets = Seq("MAIN ST", "VINE ST", "ELM AVE", null)
    val rows = (0 until 300).map { i =>
      val year = 2019 + i % 3
      val month = 1 + i % 12
      val day = 1 + i % 28
      val eventNum = f"CPD${i / 3}%05d" // rows i, i+1, i+2 share an event
      val create = f"$year%04d-$month%02d-$day%02dT${i % 24}%02d:${i % 60}%02d:00.000"
      val closed = if (i % 10 == 9) null else f"$year%04d-$month%02d-$day%02dT${(i % 24)}%02d:${(i % 60)}%02d:45.000"
      val district = if (i % 3 == 1 || i % 7 == 0) null else s"D${i % 5}"
      Row(
        streets(i % 4), "CPD", create, if (i % 5 == 4) null else s"DISP${i % 3}",
        eventNum, s"T${i % 9}", s"DESC${i % 9}", s"${1 + i % 5}",
        "GREEN", closed, s"B${i % 6}", district,
        null, // sna_neighborhood: 100% null (the drop target)
        if (i % 2 == 0) s"CPDN${i % 4}" else null, s"CCN${i % 3}",
        s"39.1${i % 10}", s"-84.5${i % 10}", closed, create
      )
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), CallsPipeline.IngestSchema)
  }

  test("timestamp parse turns *time* columns into timestamps, bad/null → null") {
    val parsed = CallsPipeline.parseTimes(fixture)
    val timeCols = parsed.schema.fields.filter(_.name.toLowerCase.contains("time"))
    assert(timeCols.nonEmpty)
    timeCols.foreach(f => assert(f.dataType.typeName.startsWith("timestamp"), f.name))
    assert(parsed.filter(col("create_time_incident").isNull).count() === 0)
    assert(parsed.filter(col("closed_time_incident").isNull).count() === 30)
  }

  test("timedeltas: 45-second close delta = 0.75 minutes, null propagates") {
    val df = CallsPipeline.deriveTimedeltas(CallsPipeline.parseTimes(fixture))
    val vals = df.select("create_closed_timedelta").distinct().collect().map(r => Option(r.get(0)))
    assert(vals.toSet === Set(Some(0.75), None))
  }

  test("dedup keeps one best row per event, only non-null districts") {
    val best = CallsPipeline.dedupBest(
      CallsPipeline.dropSparse(CallsPipeline.deriveDateParts(CallsPipeline.deriveTimedeltas(CallsPipeline.parseTimes(fixture))))
    )
    assert(best.groupBy("event_number").count().filter(col("count") > 1).count() === 0)
    assert(best.filter(col("district").isNull).count() === 0)
    // events where EVERY row has null district must not appear at all
    val allNull = fixture.groupBy("event_number").agg(max(col("district")).as("d")).filter(col("d").isNull)
    assert(best.join(allNull, Seq("event_number"), "left_semi").count() === 0)
  }

  test("aggregate: 14 dims, one row per dim tuple, counts conserve") {
    val transformed = CallsPipeline.deriveDateParts(CallsPipeline.deriveTimedeltas(CallsPipeline.parseTimes(fixture)))
    val best = CallsPipeline.dedupBest(CallsPipeline.dropSparse(transformed))
    val agg = CallsPipeline.aggregate(best)
    assert(agg.columns.length === 14 + 1 + 4)
    assert(agg.select(sum("n_distinct")).head.getLong(0) === best.count()) // post-dedup: 1 event per row
    assert(agg.groupBy(CallsPipeline.AggDims.map(col): _*).count().filter(col("count") > 1).count() === 0)
  }

  test("full run: single write action lands the aggregate, retry count 1") {
    val out = Files.createTempDirectory("graft-pipeline").resolve("agg").toString
    val (rows, attempts) = CallsPipeline.run(fixture, out)
    assert(rows > 0 && attempts === 1)
    val reread = spark.read.parquet(out)
    assert(reread.columns.contains("create_closed_timedelta_mean"))
  }

  test("profiling side-outputs: sparse column at 100%, pivot spans the 3 years") {
    val (nan, vc, pivot) = CallsPipeline.profile(fixture, "cpd_neighborhood", Seq(2019, 2020, 2021))
    val nanMap = nan.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(nanMap("sna_neighborhood") === 100.0)
    assert(nanMap("event_number") === 0.0)
    assert(vc.head.getLong(1) >= 2) // duplicate incidents exist
    assert(Seq("2019", "2020", "2021").forall(pivot.columns.contains))
  }
}

package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PartitionedSinkSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned overwrite round-trips values and lays out one directory per key") {
    val dir = Files.createTempDirectory("graft-psink").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)).toDF("id", "k", "v")
    val back = RetryingSink.overwritePartitioned(df, s"$dir/t", Seq("k"))
    assert(
      back.select("id", "k", "v").as[(Long, String, Double)].collect().toSet ===
        Set((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5))
    )
    val dirs = new java.io.File(s"$dir/t").listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("k=a", "k=b"))
  }

  test("a partition-column predicate prunes at planning time, not per row") {
    val dir = Files.createTempDirectory("graft-psink").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    val back = RetryingSink.overwritePartitioned(df, s"$dir/t", Seq("k"))
    val filtered = back.filter(col("k") === "a")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("= a"), s"predicate must reach the scan:\n$scan")
    assert(filtered.count() === 1)
  }

  test("q87's read-back plan prunes on event_type") {
    val p = graft.Queries.partitionedSink(spark, sfDir).queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters"), s"expected partition pruning in:\n$p")
    assert(
      p.linesIterator.exists(l => l.contains("PartitionFilters") && l.contains("purchase")),
      s"event_type predicate must be a partition filter, not a row filter:\n$p"
    )
  }
}
